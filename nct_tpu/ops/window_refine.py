"""Two-stage local window refinement of an upsampled NNF.

Fine-pyramid alternative to PatchMatch (reference: patchmatch_single,
GeneralizedPatchMatch.cu:677-831).  Once the coarser level's field is
globally optimal (ops/exact_nn.py), the finest-level search is local by
construction — the reference itself only random-searches radius 32 there —
so instead of sequential propagation this evaluates a dense shift window
around the upsampled match in two stages:

  1. CENTER stage: distance of the centre feature only,
     d_w(p) = -<A[p], B[nnf0(p)+w]>, for every shift |w|_inf <= radius —
     a C-sized gather per shift instead of K*C (9x cheaper traffic);
  2. RESCORE stage: the S best shifts per pixel are re-scored with the
     full masked-cosine 3x3 patch metric (dist_compute_single semantics),
     and the incumbent match competes too, so the refinement never
     regresses below the upsampled field.

Traffic: (2r+1)^2 * N * C * 2B + S * N * K * C * 2B versus PatchMatch's
~22 * iters full-patch evaluations — about 9x less at the default
radius=4, shortlist=8 on conv1_1 shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.ops.patchmatch import patchify


@functools.partial(
    jax.jit,
    static_argnames=("radius", "shortlist", "patch_size", "shift_chunk"),
)
def window_refine(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    nnf0: jnp.ndarray,
    radius: int = 4,
    shortlist: int = 8,
    patch_size: int = 3,
    shift_chunk: int = 16,
):
    """Refine nnf0 (a->b) within a +-radius window.

    Returns (nnf [Ha,Wa,2] int32, annd [Ha,Wa] f32 full patch metric).
    """
    ha, wa, c = a_norm.shape
    hb, wb, _ = b_norm.shape
    nb = hb * wb

    a32 = a_norm.astype(jnp.bfloat16)
    b_flat = b_norm.astype(jnp.bfloat16).reshape(nb, c)

    # Dense +-radius window plus sparse far rings (8 compass points at
    # 2r and 4r): the reference's random search reaches radius 32 at the
    # finest level (main.cu:77-83); the rings restore that reach for
    # pixels whose upsampled seed is off, at ~20% more centre evals.
    # Never regresses: stage 2 rescoring keeps the incumbent.
    dense = [
        (dx, dy)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ]
    rings = [
        (r * sx, r * sy)
        for r in (2 * radius, 4 * radius)
        for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1))
    ]
    shifts = jnp.asarray(dense + rings, dtype=jnp.int32)    # [S2, 2]
    n_shifts = shifts.shape[0]

    bx0 = nnf0[..., 0]
    by0 = nnf0[..., 1]

    # ---- stage 1: centre-feature distances for every shift, chunked
    pad = (-n_shifts) % shift_chunk
    shifts_p = jnp.pad(shifts, ((0, pad), (0, 0)))
    n_chunks = (n_shifts + pad) // shift_chunk

    def center_chunk(sh):
        # sh: [sc, 2] -> distances [sc, Ha, Wa]
        cx = jnp.clip(bx0[None] + sh[:, 0, None, None], 0, wb - 1)
        cy = jnp.clip(by0[None] + sh[:, 1, None, None], 0, hb - 1)
        idx = cy * wb + cx                              # [sc, Ha, Wa]
        g = b_flat[idx]                                 # [sc, Ha, Wa, C]
        return -jnp.einsum(
            "hwc,shwc->shw", a32, g, preferred_element_type=jnp.float32
        )

    d_center = jax.lax.map(
        center_chunk, shifts_p.reshape(n_chunks, shift_chunk, 2)
    ).reshape(-1, ha, wa)[:n_shifts]                    # [S2, Ha, Wa]

    # ---- shortlist: S best shifts per pixel by centre distance
    s_count = min(shortlist, n_shifts)
    work = d_center
    picks = []
    for _ in range(s_count):
        j = jnp.argmin(work, axis=0)                    # [Ha, Wa]
        picks.append(j)
        onehot = (
            jnp.arange(n_shifts, dtype=jnp.int32)[:, None, None] == j[None]
        )
        work = jnp.where(onehot, jnp.inf, work)

    # ---- stage 2: full patch metric on the shortlist (+ incumbent).
    # Patch vectors are kept FLAT [*, K*C]: a trailing [9, 64] would tile
    # to (16, 128) on TPU — a 3.6x padding blow-up that OOMs HBM at
    # conv1_1 sizes — while K*C lanes pad by <12%.
    pa, pam = patchify(a32, patch_size)
    pb, pbm = patchify(b_norm.astype(jnp.bfloat16), patch_size)
    k = pa.shape[2]
    pa_f = pa.reshape(ha, wa, k * c)
    pb_flat = pb.reshape(nb, k * c)
    pam_f = pam.astype(jnp.bfloat16)
    pbm_flat = pbm.astype(jnp.bfloat16).reshape(nb, k)

    def full_eval(cand_x, cand_y):
        flat = jnp.clip(cand_y * wb + cand_x, 0, nb - 1)
        g = pb_flat[flat]                       # [Ha, Wa, K*C]
        gm = pbm_flat[flat]                     # [Ha, Wa, K]
        num = -jnp.einsum(
            "hwd,hwd->hw", pa_f, g, preferred_element_type=jnp.float32
        )
        cnt = jnp.einsum(
            "hwk,hwk->hw", pam_f, gm, preferred_element_type=jnp.float32
        )
        return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), 1.0)

    best_x, best_y = bx0, by0
    best_d = full_eval(bx0, by0)                        # incumbent
    for j in picks:
        sx = shifts[:, 0][j]
        sy = shifts[:, 1][j]
        cx = jnp.clip(bx0 + sx, 0, wb - 1)
        cy = jnp.clip(by0 + sy, 0, hb - 1)
        d = full_eval(cx, cy)
        better = d < best_d
        best_x = jnp.where(better, cx, best_x)
        best_y = jnp.where(better, cy, best_y)
        best_d = jnp.where(better, d, best_d)

    return jnp.stack([best_x, best_y], axis=-1), best_d
