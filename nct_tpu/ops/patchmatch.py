"""PatchMatch dense correspondence search, XLA formulation.

TPU-native rebuild of the reference CUDA kernel ``patchmatch_single``
(GeneralizedPatchMatch.cu:677-831): per-pixel NNF refined by fixed-count
iterations of jump-flooding propagation (jumps 8,4,2,1 in 4 directions) and
exponential random search.  The reference kernel relies on deliberately racy
global-memory updates; here each candidate set is evaluated as a
*synchronous sweep* over the whole field — deterministic, race-free, and
vectorizable — with the same candidate counts per iteration.

Distance is the reference's masked cosine distance on L2-normalized
features (``dist_compute_single`` :355-405):

    d(p, q) = -(sum_{o in patch} <A[p+o], B[q+o]>) / #valid(p, q)

restructured so each candidate needs ONE gather: B is pre-patchified to
[Hb, Wb, K, C] (K = patch_size^2, zero padded out-of-bounds) so the patch
dot-product becomes an einsum against the gathered rows.  Out-of-bounds
taps contribute zero on either side, reproducing the reference's validity
masking exactly; the valid count comes from gathering the patchified mask.

Randomness uses explicit JAX PRNG keys instead of curand per-thread state;
results are deterministic given the key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def patch_offsets(patch_size: int) -> list[tuple[int, int]]:
    """(dx, dy) taps; ref loops dy,dx in [-ps/2, ps/2] (:366-367)."""
    half = patch_size // 2
    return [
        (dx, dy)
        for dy in range(-half, patch_size - half)
        for dx in range(-half, patch_size - half)
    ]


def patchify(feat: jnp.ndarray, patch_size: int):
    """[H,W,C] -> ([H,W,K,C] zero-padded patch stack, [H,W,K] validity)."""
    h, w, c = feat.shape
    half = patch_size // 2
    padded = jnp.pad(feat, ((half, half), (half, half), (0, 0)))
    mask = jnp.pad(
        jnp.ones((h, w), dtype=feat.dtype), ((half, half), (half, half))
    )
    stack, mstack = [], []
    for dx, dy in patch_offsets(patch_size):
        stack.append(
            jax.lax.dynamic_slice(padded, (half + dy, half + dx, 0), (h, w, c))
        )
        mstack.append(
            jax.lax.dynamic_slice(mask, (half + dy, half + dx), (h, w))
        )
    return jnp.stack(stack, axis=2), jnp.stack(mstack, axis=2)


def _eval_candidates(pa, pam, pb_flat, pbm_flat, cand, valid, wb: int):
    """Masked cosine patch distance for a candidate field.

    pa/pam: patchified A [Ha,Wa,K*C] / [Ha,Wa,K] (patch axis FLATTENED into
    the channel axis — a trailing [K, C] would tile-pad ~3.6x on TPU);
    pb_flat/pbm_flat: patchified B [Hb*Wb,K*C] / [Hb*Wb,K];
    cand: [Ha,Wa,2] int32 (x,y); valid: [Ha,Wa] bool.
    """
    hb_wb = pb_flat.shape[0]
    flat = jnp.clip(cand[..., 1] * wb + cand[..., 0], 0, hb_wb - 1)
    g = pb_flat[flat]          # [Ha,Wa,K*C]
    gm = pbm_flat[flat]        # [Ha,Wa,K]
    num = -jnp.einsum(
        "hwd,hwd->hw", pa, g, preferred_element_type=jnp.float32
    )
    cnt = jnp.einsum(
        "hwk,hwk->hw", pam, gm, preferred_element_type=jnp.float32
    )
    d = jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), 1.0)  # ref :389-392
    return jnp.where(valid, d, jnp.inf)


def _coord_grids(h: int, w: int):
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    return xs, ys


# Propagation direction order matches the reference: left, right, up, down
# (GeneralizedPatchMatch.cu:725-798); dir d means cand[p] = nnf[p-d*j] + d*j.
_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1))
_JUMPS = (8, 4, 2, 1)


def random_search_mags(rs_max: int, bh: int, bw: int) -> list[int]:
    """Exponentially decreasing search radii (ref :805-810)."""
    start = min(rs_max, max(bh, bw))
    mags = []
    m = start
    while m >= 1:
        mags.append(m)
        m //= 2
    return mags


@functools.partial(
    jax.jit, static_argnames=("iters", "rs_max", "patch_size")
)
def patchmatch(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    nnf0: jnp.ndarray,
    key: jax.Array,
    iters: int = 10,
    rs_max: int = 32,
    patch_size: int = 3,
):
    """Refine NNF a->b. Returns (nnf [Ha,Wa,2] int32, annd [Ha,Wa] f32).

    a_norm/b_norm: L2-normalized features [H,W,C] (any float dtype).
    """
    ha, wa = a_norm.shape[0], a_norm.shape[1]
    hb, wb = b_norm.shape[0], b_norm.shape[1]

    pa, pam = patchify(a_norm, patch_size)
    pb, pbm = patchify(b_norm, patch_size)
    k, c = pb.shape[2], pb.shape[3]
    pa = pa.reshape(ha, wa, k * c)
    pb_flat = pb.reshape(hb * wb, k * c)
    pbm_flat = pbm.reshape(hb * wb, k)

    xs, ys = _coord_grids(ha, wa)
    mags = random_search_mags(rs_max, hb, wb)

    def evaluate(cand, valid):
        return _eval_candidates(pa, pam, pb_flat, pbm_flat, cand, valid, wb)

    d0 = evaluate(nnf0, jnp.ones((ha, wa), dtype=bool))

    # Pre-draw all random-search uniforms: [iters, n_mags, Ha, Wa, 2]
    n_mags = max(len(mags), 1)
    uniforms = jax.random.uniform(
        key, (iters, n_mags, ha, wa, 2), dtype=jnp.float32
    )

    def improve(state, cand, valid):
        nnf, dbest = state
        d = evaluate(cand, valid)
        better = d < dbest
        nnf = jnp.where(better[..., None], cand, nnf)
        dbest = jnp.where(better, d, dbest)
        return nnf, dbest

    # Offsets as data, loops as scans: the candidate evaluation appears
    # ONCE in the compiled program instead of 22x, which keeps per-level
    # compile time sane while preserving the exact sequential improve
    # order of the reference (jumps 8,4,2,1 x 4 dirs, then shrinking
    # random search).
    jump_offsets = jnp.asarray(
        [(dx * j, dy * j) for j in _JUMPS for dx, dy in _DIRS],
        dtype=jnp.int32,
    )

    def prop_step(state, off):
        jx, jy = off[0], off[1]
        nnf, dbest = state
        # roll by dynamic shift: roll(a, s) == gather rows (i - s) mod n
        src = jnp.roll(nnf, shift=(jy, jx), axis=(0, 1))
        cand_x = src[..., 0] + jx
        cand_y = src[..., 1] + jy
        valid = (
            (xs - jx >= 0) & (xs - jx < wa)
            & (ys - jy >= 0) & (ys - jy < ha)
            & (cand_x >= 0) & (cand_x < wb)
            & (cand_y >= 0) & (cand_y < hb)
        )
        cand = jnp.stack([cand_x, cand_y], axis=-1)
        return improve((nnf, dbest), cand, valid), None

    mags_arr = jnp.asarray(mags if mags else [0], dtype=jnp.int32)
    all_true = jnp.ones((ha, wa), dtype=bool)

    def rs_step(state, mag_u):
        mag, u = mag_u
        nnf, dbest = state
        xb, yb = nnf[..., 0], nnf[..., 1]
        xmin = jnp.maximum(xb - mag, 0)
        xmax = jnp.minimum(xb + mag + 1, wb)
        ymin = jnp.maximum(yb - mag, 0)
        ymax = jnp.minimum(yb + mag + 1, hb)
        cx = xmin + (u[..., 0] * (xmax - xmin).astype(jnp.float32)).astype(jnp.int32)
        cy = ymin + (u[..., 1] * (ymax - ymin).astype(jnp.float32)).astype(jnp.int32)
        cand = jnp.stack(
            [jnp.clip(cx, 0, wb - 1), jnp.clip(cy, 0, hb - 1)], axis=-1
        )
        live = mag > 0
        return improve((nnf, dbest), cand, all_true & live), None

    def body(state, u_iter):
        state, _ = jax.lax.scan(prop_step, state, jump_offsets)
        state, _ = jax.lax.scan(rs_step, state, (mags_arr, u_iter))
        return state, None

    (nnf, dbest), _ = jax.lax.scan(body, (nnf0, d0), uniforms)
    return nnf, dbest
