"""Bidirectional-similarity (BDS) patch voting.

One implementation covers both of the reference's payloads:
  * colour guidance image reconstruction on the source grid
    (reconstruct_bds, GeneralizedPatchMatch.cu:122-235, host/OpenMP), and
  * deep-feature guidance voting (avg_vote_bds_a/_b/avg_vote,
    GeneralizedPatchMatch.cu:1074-1202, CUDA with atomicAdd).

Direction A ("coherence") is a gather over the forward NNF with per-sample
weight w_cohere/(Ha*Wa); direction B ("completeness") is a scatter-add over
the reverse NNF with weight w_complete/(Hb*Wb) — ``jnp.ndarray.at[].add``
replaces atomicAdd deterministically.  The voted value is the weighted mean
over all contributing samples (ref :217-233).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.ops.patchmatch import patch_offsets


def _coord_grids(h: int, w: int):
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    return xs, ys


@functools.partial(jax.jit, static_argnames=("patch_size",))
def bds_vote(
    payload_b: jnp.ndarray,
    ann: jnp.ndarray,
    bnn: jnp.ndarray,
    w_cohere: float | jnp.ndarray = 1.0,
    w_complete: float | jnp.ndarray = 2.0,
    patch_size: int = 3,
):
    """Vote payload values from B into A's geometry.

    payload_b: [Hb, Wb, P] float values living on B's grid.
    ann: [Ha, Wa, 2] forward NNF (a->b); bnn: [Hb, Wb, 2] reverse NNF.
    Returns (voted [Ha, Wa, P] float32, total_weight [Ha, Wa] float32).
    """
    hb, wb, p = payload_b.shape
    ha, wa = ann.shape[0], ann.shape[1]
    offsets = patch_offsets(patch_size)

    payload = payload_b.astype(jnp.float32)
    wa_w = jnp.float32(w_cohere) / jnp.float32(ha * wa)
    wb_w = jnp.float32(w_complete) / jnp.float32(hb * wb)

    axs, ays = _coord_grids(ha, wa)
    bxs, bys = _coord_grids(hb, wb)

    acc = jnp.zeros((ha, wa, p), dtype=jnp.float32)
    wacc = jnp.zeros((ha, wa), dtype=jnp.float32)

    # --- direction A: gather via forward NNF (ref avg_vote_bds_a :1074-1126)
    # pixel p collects payload_b[ann[p+o] - o] for every patch offset o.
    for dx, dy in offsets:
        src = jnp.roll(ann, shift=(-dy, -dx), axis=(0, 1))  # ann[p + o]
        tx = src[..., 0] - dx
        ty = src[..., 1] - dy
        valid_a = (
            (axs + dx >= 0) & (axs + dx < wa)
            & (ays + dy >= 0) & (ays + dy < ha)
        )
        valid = valid_a & (tx >= 0) & (tx < wb) & (ty >= 0) & (ty < hb)
        flat = jnp.clip(ty * wb + tx, 0, hb * wb - 1)
        g = payload.reshape(hb * wb, p)[flat]
        vw = valid.astype(jnp.float32) * wa_w
        acc = acc + g * vw[..., None]
        wacc = wacc + vw

    # --- direction B: scatter via reverse NNF (ref avg_vote_bds_b :1128-1178)
    # pixel b pushes payload_b[b+o] onto a-target bnn[b] + o.
    flat_targets = []
    values = []
    valids = []
    for dx, dy in offsets:
        src = jnp.roll(payload, shift=(-dy, -dx), axis=(0, 1))  # payload[b+o]
        valid_b = (
            (bxs + dx >= 0) & (bxs + dx < wb)
            & (bys + dy >= 0) & (bys + dy < hb)
        )
        tx = bnn[..., 0] + dx
        ty = bnn[..., 1] + dy
        valid = valid_b & (tx >= 0) & (tx < wa) & (ty >= 0) & (ty < ha)
        flat = jnp.where(valid, ty * wa + tx, ha * wa)  # sentinel row
        flat_targets.append(flat.reshape(-1))
        values.append(src.reshape(-1, p))
        valids.append(valid.reshape(-1))

    flat_all = jnp.concatenate(flat_targets)
    val_all = jnp.concatenate(values)
    valid_all = jnp.concatenate(valids).astype(jnp.float32)

    # Sort scatter targets once — TPU scatter-adds with unsorted duplicate
    # indices serialize; sorted indices take the fast segment path.
    order = jnp.argsort(flat_all)
    sorted_ids = flat_all[order]
    wv = (valid_all * wb_w)[order]
    acc_b = jnp.zeros((ha * wa + 1, p), dtype=jnp.float32)
    acc_b = acc_b.at[sorted_ids].add(
        val_all[order] * wv[:, None],
        indices_are_sorted=True, unique_indices=False,
    )
    wacc_b = jnp.zeros((ha * wa + 1,), dtype=jnp.float32)
    wacc_b = wacc_b.at[sorted_ids].add(
        wv, indices_are_sorted=True, unique_indices=False,
    )

    acc = acc + acc_b[: ha * wa].reshape(ha, wa, p)
    wacc = wacc + wacc_b[: ha * wa].reshape(ha, wa)

    voted = jnp.where(
        wacc[..., None] > 0, acc / jnp.maximum(wacc, 1e-20)[..., None], 0.0
    )
    return voted, wacc


def bds_reconstruct_color(
    b_img_u8: jnp.ndarray,
    ann: jnp.ndarray,
    bnn: jnp.ndarray,
    w_cohere: float = 1.0,
    w_complete: float = 2.0,
    patch_size: int = 3,
) -> jnp.ndarray:
    """Guidance image on A's grid from B's colours (ref reconstruct_bds).

    Returns uint8 [Ha, Wa, 3]; the reference truncates the weighted mean
    into uchar, so we floor rather than round.
    """
    voted, _ = bds_vote(
        b_img_u8.astype(jnp.float32), ann, bnn, w_cohere, w_complete,
        patch_size,
    )
    return jnp.clip(jnp.floor(voted), 0, 255).astype(jnp.uint8)
