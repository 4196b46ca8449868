"""Three-stage local window refinement of an upsampled NNF.

Fine-pyramid alternative to PatchMatch (reference: patchmatch_single,
GeneralizedPatchMatch.cu:677-831).  Once the coarser level's field is
globally optimal (ops/exact_nn.py), the finest-level search is local by
construction — the reference itself only random-searches radius 32 there —
so instead of sequential propagation this evaluates a dense shift window
around the upsampled match:

  1. CENTER stage: distance of the centre feature only,
     d_w(p) = -<A[p], B[nnf0(p)+w]>, for every shift |w|_inf <= radius.
     All shifts address B at fixed offsets from the same base nnf0(p);
     the dense window factorizes as (dy row) x (dx column), so ONE
     x-rolled channel-concatenated copy of B (the "strip table",
     [Nb, (2r+1)*C]) turns each of the 2r+1 dy rows into a single
     Ha*Wa-row gather whose lanes hold the whole dx row of the window —
     (2r+1)^2+rings evals in 2r+1 wide + #rings narrow gathers.  (The
     round-2 per-chunk full pre-roll built (2r+1)^2+16 rolled copies:
     ~10x the build traffic of the strip table for the same gather
     count; measured 1.3x slower end-to-end at conv1_1 shapes.);
  2. PATCH-APPROX stage: the exact patch metric of candidate nnf0(p)+w is
     sum_o centre(p+o, nnf0(p)+w+o); wherever the upsampled field is
     locally translation-consistent (offset-preserving upsample => almost
     everywhere) that equals the 3x3 box-sum of d_w over a-space — one
     reduce_window scores every shift with patch context;
  3. RESCORE stage: the S best shifts per pixel are re-scored with the
     full masked-cosine 3x3 patch metric (dist_compute_single semantics),
     and the incumbent match competes too, so the refinement never
     regresses below the upsampled field.

Traffic at the defaults (radius=4, shortlist=2) on conv1_1 shapes is
~25x less than 4-iteration PatchMatch's ~22 full-patch gather rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.ops.patchmatch import patchify


def _box_sum(x: jnp.ndarray, patch_size: int,
             use_shifts: bool = True) -> jnp.ndarray:
    """patch_size x patch_size zero-padded box sum over the trailing two
    axes — the separable shifted-add decomposition of
    ``lax.reduce_window(add, SAME)``.  reduce_window at the window
    shapes here measured ~19 ms on the v5e for a 52 MB operand (~100x
    off bandwidth, and flat in batch size); two padded-slice add chains
    stream the same bytes at ~line rate.

    BUT: the shifted-add lowering is the round-5 composition-fault
    trigger inside the FUSED whole-pipeline program (scan-2 A/B on the
    relayed worker: reduce_window body runs clean, shifted-add body
    kernel-faults; both run clean in staged per-level programs and in
    the vmapped batch program).  Callers therefore pick per program
    shape via ``use_shifts`` (pipeline: staged -> shifts, fused ->
    reduce_window; the folded batch body always uses shifts).
    NCT_BOXSUM=rw|shifts overrides for A/B."""
    import os
    env = os.environ.get("NCT_BOXSUM", "")
    if env == "rw":
        use_shifts = False
    elif env == "shifts":
        use_shifts = True
    if not use_shifts:
        win = (1,) * (x.ndim - 2) + (patch_size, patch_size)
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, win, (1,) * x.ndim, "SAME")
    half = patch_size // 2
    lead = ((0, 0),) * (x.ndim - 2)
    xp = jnp.pad(x, lead + ((half, half), (0, 0)))
    h = x.shape[-2]
    rows = xp[..., 0:h, :]
    for o in range(1, patch_size):
        rows = rows + xp[..., o:o + h, :]
    xp = jnp.pad(rows, lead + ((0, 0), (half, half)))
    w = x.shape[-1]
    out = xp[..., 0:w]
    for o in range(1, patch_size):
        out = out + xp[..., o:o + w]
    return out


def _shift_set(radius: int):
    """Dense +-radius window plus sparse far rings (8 compass points at
    2r and 4r): the reference's random search reaches radius 32 at the
    finest level (main.cu:77-83); the rings restore that reach for
    pixels whose upsampled seed is off, at ~20% more centre evals."""
    dxs = list(range(-radius, radius + 1))
    dense = [(dx, dy) for dy in dxs for dx in dxs]
    rings = [
        (r * sx, r * sy)
        for r in (2 * radius, 4 * radius)
        for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1))
    ]
    return dxs, dense, rings


def _window_refine_impl(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    nnf0: jnp.ndarray,
    radius: int = 4,
    shortlist: int = 8,
    patch_size: int = 3,
    stage1_channels: int = 0,
    boxsum: str = "shifts",
):
    """Refine nnf0 (a->b) within a +-radius window (unbatched body).

    Returns (nnf [Ha,Wa,2] int32, annd [Ha,Wa] f32 full patch metric).
    """
    ha, wa, c = a_norm.shape
    hb, wb, _ = b_norm.shape
    nb = hb * wb

    a32 = a_norm.astype(jnp.bfloat16)
    b16 = b_norm.astype(jnp.bfloat16)

    # Never regresses: stage 2 rescoring keeps the incumbent.
    dxs, dense, rings = _shift_set(radius)
    shift_list = dense + rings
    shifts = jnp.asarray(shift_list, dtype=jnp.int32)       # [S2, 2]
    n_shifts = len(shift_list)
    nd = len(dxs)

    bx0 = nnf0[..., 0]
    by0 = nnf0[..., 1]

    # ---- stage 1: centre-feature distances for every shift.  Every shift
    # addresses B at a fixed offset from the SAME base coordinate nnf0(p),
    # and the dense window factorizes by rows: ONE x-rolled strip table
    # ([Nb, nd*C] — column dx lives in the lane axis) turns each dy row of
    # the window into a single [Ha*Wa]-row wide gather (raw gathers cost
    # ~5 ms at these shapes regardless of lane width; building rolled
    # copies per SHIFT instead of per COLUMN was 10x the HBM build
    # traffic).  The per-row results transpose to shift-LEADING
    # [S2, Ha, Wa] for the box-sum/argmin stages — reduce_window and
    # argmin over a 97-wide trailing lane axis measured ~50 ms slower
    # than over the spatial minor dims (lane padding 97->128 taxes every
    # pass).  Off-image shifts are masked to +inf (the reference's
    # random search simply never proposes them); the (0,0) shift is
    # always valid, and stage 2 keeps the incumbent regardless.
    # stage-1 may rank on a channel SUBSET (stage1_channels > 0): the
    # centre-distance gathers are the stage's dominant HBM traffic and
    # ranking tolerates an approximate metric — stage 2's EXACT rescore
    # plus the incumbent guarantee bound the damage to shortlist
    # quality (a MAX_SIZE tuning knob; 0 = all channels, the default).
    cs = c if stage1_channels <= 0 else min(stage1_channels, c)
    a1 = a32 if cs == c else a32[..., :cs]
    b1 = b16 if cs == c else b16[..., :cs]
    idx0 = by0 * wb + bx0                                   # in-bounds
    strip = jnp.concatenate(
        [jnp.roll(b1, shift=-dx, axis=1) for dx in dxs], axis=-1
    ).reshape(nb, nd * cs)
    d_rows = []
    for dy in dxs:
        idx = jnp.clip(idx0 + dy * wb, 0, nb - 1)
        g = strip[idx.reshape(-1)].reshape(ha, wa, nd, cs)
        d = -jnp.sum(a1[:, :, None, :] * g, axis=-1, dtype=jnp.float32)
        d_rows.append(jnp.moveaxis(d, -1, 0))               # [nd, Ha, Wa]
    ring_idx = jnp.stack(
        [jnp.clip(idx0 + dy * wb + dx, 0, nb - 1) for dx, dy in rings]
    )                                                       # [R, Ha, Wa]
    gr = b1.reshape(nb, cs)[ring_idx]                       # [R, Ha, Wa, Cs]
    d_rows.append(
        -jnp.sum(a1[None] * gr, axis=-1, dtype=jnp.float32)
    )
    d_center = jnp.concatenate(d_rows, axis=0)              # [S2, Ha, Wa]
    sdx = shifts[:, 0][:, None, None]
    sdy = shifts[:, 1][:, None, None]
    valid = (
        (bx0[None] + sdx >= 0) & (bx0[None] + sdx < wb)
        & (by0[None] + sdy >= 0) & (by0[None] + sdy < hb)
    )
    d_center = jnp.where(valid, d_center, jnp.inf)

    # ---- patch-approximate scores: the exact patch metric of candidate
    # nnf0(p)+w is sum_o centre(p+o, nnf0(p)+w+o); wherever the upsampled
    # field is locally translation-consistent (nnf0(p+o) = nnf0(p)+o — an
    # offset-preserving upsample makes that hold except across parent-cell
    # boundaries), that sum is EXACTLY the 3x3 box-sum of d_center[w] in
    # a-space.  One reduce_window scores every shift with patch context,
    # so only the top picks need the exact gather-based rescore (stage 2
    # still clips, re-scores exactly, and keeps the incumbent, so field
    # inconsistencies can only cost candidate quality, never correctness).
    finite = jnp.isfinite(d_center)
    use_shifts = boxsum != "reduce_window"
    num = _box_sum(jnp.where(finite, d_center, 0.0), patch_size,
                   use_shifts)
    cnt = _box_sum(finite.astype(jnp.float32), patch_size, use_shifts)
    d_patch = jnp.where(cnt > 0, num / cnt, jnp.inf)

    # ---- shortlist: S best shifts per pixel by approximate patch score
    s_count = min(shortlist, n_shifts)
    work = d_patch
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


def _window_refine_folded(
    a_norm: jnp.ndarray,       # [B, Ha, Wa, C]
    b_norm: jnp.ndarray,       # [B, Hb, Wb, C]
    nnf0: jnp.ndarray,         # [B, Ha, Wa, 2]
    radius: int,
    shortlist: int,
    patch_size: int,
    stage1_channels: int = 0,
):
    """Batch-in-rows window refine: per-image strip/patch tables stack
    into ONE flat table and every gather's index carries a b*Nb row
    offset, so the vmapped lowering's batched gathers (measured 1.49x
    per-item cost at batch 4, the round-4 serving table) become the
    plain wide row gathers the single-image program was tuned around.
    Per-image results are bitwise the unbatched ones."""
    bsz, ha, wa, c = a_norm.shape
    _, hb, wb, _ = b_norm.shape
    nb = hb * wb

    a32 = a_norm.astype(jnp.bfloat16)
    b16 = b_norm.astype(jnp.bfloat16)
    dxs, dense, rings = _shift_set(radius)
    shift_list = dense + rings
    shifts = jnp.asarray(shift_list, dtype=jnp.int32)
    n_shifts = len(shift_list)
    nd = len(dxs)

    bx0 = nnf0[..., 0]
    by0 = nnf0[..., 1]
    boff = (jnp.arange(bsz, dtype=jnp.int32) * nb)[:, None, None]

    cs = c if stage1_channels <= 0 else min(stage1_channels, c)
    a1 = a32 if cs == c else a32[..., :cs]
    b1 = b16 if cs == c else b16[..., :cs]
    idx0 = by0 * wb + bx0                                  # [B, Ha, Wa]
    strip = jnp.concatenate(
        [jnp.roll(b1, shift=-dx, axis=2) for dx in dxs], axis=-1
    ).reshape(bsz * nb, nd * cs)
    d_rows = []
    for dy in dxs:
        idx = jnp.clip(idx0 + dy * wb, 0, nb - 1) + boff
        g = strip[idx.reshape(-1)].reshape(bsz, ha, wa, nd, cs)
        d = -jnp.sum(a1[:, :, :, None, :] * g, axis=-1,
                     dtype=jnp.float32)
        d_rows.append(jnp.moveaxis(d, -1, 1))              # [B, nd, Ha, Wa]
    ring_idx = jnp.stack(
        [jnp.clip(idx0 + dy * wb + dx, 0, nb - 1) + boff
         for dx, dy in rings], axis=1,
    )                                                      # [B, R, Ha, Wa]
    gr = b1.reshape(bsz * nb, cs)[ring_idx]              # [B, R, Ha, Wa, Cs]
    d_rows.append(
        -jnp.sum(a1[:, None] * gr, axis=-1, dtype=jnp.float32)
    )
    d_center = jnp.concatenate(d_rows, axis=1)             # [B, S2, Ha, Wa]
    sdx = shifts[:, 0][None, :, None, None]
    sdy = shifts[:, 1][None, :, None, None]
    valid = (
        (bx0[:, None] + sdx >= 0) & (bx0[:, None] + sdx < wb)
        & (by0[:, None] + sdy >= 0) & (by0[:, None] + sdy < hb)
    )
    d_center = jnp.where(valid, d_center, jnp.inf)
    # same composition-fault barrier as the unbatched body (see there)
    d_center = jax.lax.optimization_barrier(d_center)

    finite = jnp.isfinite(d_center)
    num = _box_sum(jnp.where(finite, d_center, 0.0), patch_size)
    cnt = _box_sum(finite.astype(jnp.float32), patch_size)
    d_patch = jnp.where(cnt > 0, num / cnt, jnp.inf)

    s_count = min(shortlist, n_shifts)
    work = d_patch
    picks = []
    for _ in range(s_count):
        j = jnp.argmin(work, axis=1)                       # [B, Ha, Wa]
        picks.append(j)
        onehot = (
            jnp.arange(n_shifts, dtype=jnp.int32)[None, :, None, None]
            == j[:, None]
        )
        work = jnp.where(onehot, jnp.inf, work)

    pfy = functools.partial(patchify, patch_size=patch_size)
    pa, pam = jax.vmap(pfy)(a32)
    pb, pbm = jax.vmap(pfy)(b_norm.astype(jnp.bfloat16))
    k = pa.shape[3]
    pa_f = pa.reshape(bsz, ha, wa, k * c)
    pb_flat = pb.reshape(bsz * nb, k * c)
    pam_f = pam.astype(jnp.bfloat16)
    pbm_flat = pbm.astype(jnp.bfloat16).reshape(bsz * nb, k)

    def full_eval(cand_x, cand_y):
        flat = jnp.clip(cand_y * wb + cand_x, 0, nb - 1) + boff
        g = pb_flat[flat]                       # [B, Ha, Wa, K*C]
        gm = pbm_flat[flat]                     # [B, Ha, Wa, K]
        num = -jnp.einsum(
            "bhwd,bhwd->bhw", pa_f, g, preferred_element_type=jnp.float32
        )
        cnt2 = jnp.einsum(
            "bhwk,bhwk->bhw", pam_f, gm,
            preferred_element_type=jnp.float32
        )
        return jnp.where(cnt2 > 0, num / jnp.maximum(cnt2, 1.0), 1.0)

    best_x, best_y = bx0, by0
    best_d = full_eval(bx0, by0)
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


@functools.lru_cache(maxsize=None)
def _window_refine_custom_vmap(radius: int, shortlist: int,
                               patch_size: int, stage1_channels: int,
                               boxsum: str):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(a_norm, b_norm, nnf0):
        return _window_refine_impl(a_norm, b_norm, nnf0, radius,
                                   shortlist, patch_size,
                                   stage1_channels, boxsum)

    @f.def_vmap
    def _rule(axis_size, in_batched, a_norm, b_norm, nnf0):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        out = _window_refine_folded(
            bcast(a_norm, in_batched[0]), bcast(b_norm, in_batched[1]),
            bcast(nnf0, in_batched[2]), radius, shortlist, patch_size,
            stage1_channels)
        return out, (True, True)

    return f


@functools.partial(
    jax.jit,
    static_argnames=("radius", "shortlist", "patch_size",
                     "stage1_channels", "boxsum"),
)
def window_refine(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    nnf0: jnp.ndarray,
    radius: int = 4,
    shortlist: int = 8,
    patch_size: int = 3,
    stage1_channels: int = 0,
    boxsum: str = "shifts",
):
    """Refine nnf0 (a->b) within a +-radius window (see
    _window_refine_impl; under jax.vmap the batch folds into the table
    row axis — _window_refine_folded).

    Returns (nnf [Ha,Wa,2] int32, annd [Ha,Wa] f32 full patch metric).
    """
    return _window_refine_custom_vmap(
        int(radius), int(shortlist), int(patch_size),
        int(stage1_channels), str(boxsum),
    )(a_norm, b_norm, nnf0)
