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

TPU structure: gather/scatter cost on TPU scales with the ROW COUNT, not
bytes, so the 9 patch offsets are folded into the channel axis instead of
the row axis.  Because every offset's sample ``payload[nnf[p+o] - o]``
addresses memory at a FIXED offset from the same base coordinate
``nnf[p+o]``, pre-rolling the payload by each offset and concatenating
along channels turns the 9 per-offset gathers into ONE gather against the
un-shifted NNF (and symmetrically one sorted scatter for direction B,
whose sort key is the Hb*Wb-element reverse NNF instead of a 9x longer
concatenation).
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
    k = len(offsets)

    payload = payload_b.astype(jnp.float32)
    wa_w = jnp.float32(w_cohere) / jnp.float32(ha * wa)
    wb_w = jnp.float32(w_complete) / jnp.float32(hb * wb)

    axs, ays = _coord_grids(ha, wa)
    bxs, bys = _coord_grids(hb, wb)

    # --- direction A: gather via forward NNF (ref avg_vote_bds_a :1074-1126)
    # pixel p collects payload_b[ann[p+o] - o] for every patch offset o.
    # rolled_o[q] = payload[q - o], so gathering the channel-concatenated
    # rolls at the plain NNF coordinate q = ann[p'] yields every offset's
    # sample in one [Ha*Wa]-row gather; the per-offset a-space shift
    # (p' = p + o) becomes a roll of the gathered block.
    cat_a = jnp.concatenate(
        [jnp.roll(payload, shift=(dy, dx), axis=(0, 1))
         for dx, dy in offsets],
        axis=-1,
    ).reshape(hb * wb, k * p)
    ann_flat = ann[..., 1] * wb + ann[..., 0]              # q, in-bounds
    g_cat = cat_a[ann_flat]                                # [Ha, Wa, K*P]

    acc = jnp.zeros((ha, wa, p), dtype=jnp.float32)
    wacc = jnp.zeros((ha, wa), dtype=jnp.float32)
    for j, (dx, dy) in enumerate(offsets):
        # b-bounds validity of ann[p'] - o, evaluated on the a-grid at p'
        # then rolled to p (wrapped rows are killed by the a-bounds mask)
        m_b = (
            (ann[..., 0] - dx >= 0) & (ann[..., 0] - dx < wb)
            & (ann[..., 1] - dy >= 0) & (ann[..., 1] - dy < hb)
        )
        valid_a = (
            (axs + dx >= 0) & (axs + dx < wa)
            & (ays + dy >= 0) & (ays + dy < ha)
        )
        valid = valid_a & jnp.roll(m_b, shift=(-dy, -dx), axis=(0, 1))
        g = jnp.roll(
            g_cat[..., j * p:(j + 1) * p], shift=(-dy, -dx), axis=(0, 1)
        )
        vw = valid.astype(jnp.float32) * wa_w
        acc = acc + g * vw[..., None]
        wacc = wacc + vw

    # --- direction B: scatter via reverse NNF (ref avg_vote_bds_b :1128-1178)
    # pixel b pushes payload_b[b+o] onto a-target bnn[b] + o.  All offsets
    # share the base target bnn[b]: scatter the channel-concatenated
    # pre-weighted samples at bnn[b] once (indices sorted by ONE argsort of
    # the Hb*Wb reverse NNF), then shift each offset's accumulated plane by
    # +o in a-space.  Out-of-bounds targets are zero-weighted before the
    # scatter, so the roll's wrapped cells carry exact zeros.
    vals = []
    for dx, dy in offsets:
        src = jnp.roll(payload, shift=(-dy, -dx), axis=(0, 1))  # payload[b+o]
        valid_b = (
            (bxs + dx >= 0) & (bxs + dx < wb)
            & (bys + dy >= 0) & (bys + dy < hb)
        )
        tx = bnn[..., 0] + dx
        ty = bnn[..., 1] + dy
        valid = valid_b & (tx >= 0) & (tx < wa) & (ty >= 0) & (ty < ha)
        vw = valid.astype(jnp.float32) * wb_w               # [Hb, Wb]
        vals.append(jnp.concatenate([src * vw[..., None], vw[..., None]],
                                    axis=-1))
    val_cat = jnp.concatenate(vals, axis=-1).reshape(hb * wb, k * (p + 1))

    bnn_flat = (bnn[..., 1] * wa + bnn[..., 0]).reshape(-1)
    order = jnp.argsort(bnn_flat)
    tab = jnp.zeros((ha * wa, k * (p + 1)), dtype=jnp.float32)
    tab = tab.at[bnn_flat[order]].add(
        val_cat[order], indices_are_sorted=True, unique_indices=False,
    )
    tab = tab.reshape(ha, wa, k, p + 1)
    for j, (dx, dy) in enumerate(offsets):
        blk = jnp.roll(tab[..., j, :], shift=(dy, dx), axis=(0, 1))
        acc = acc + blk[..., :p]
        wacc = wacc + blk[..., p]

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
