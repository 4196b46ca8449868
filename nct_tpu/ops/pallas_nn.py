"""Pallas TPU kernel: fused streaming-argmin patch-NN search.

The Pallas counterpart of ops/exact_nn.py (which replaces the reference's
CUDA PatchMatch, GeneralizedPatchMatch.cu:677-831, at the pyramid's coarse
levels): for each (A tile, B tile) grid step the kernel computes the masked
cosine patch distance with two MXU matmuls and folds the running
(min, argmin) into a VMEM-resident output block — the [A, B] cost volume
never touches HBM, the one memory-traffic term XLA's scan formulation
cannot eliminate.

Grid: (A tiles, B tiles), arbitrary-order sequential on TPU; the output
blocks are indexed by the A tile only, so they persist in VMEM across the
B sweep (the standard revisiting/accumulator pattern) and are initialized
at the first B step with ``pl.when``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nct_tpu.ops.patchmatch import patchify


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _nn_kernel(fa_ref, ma_ref, fb_ref, mb_ref, d_ref, i_ref):
    j = pl.program_id(1)
    tb = fb_ref.shape[0]

    @pl.when(j == 0)
    def _():
        d_ref[:] = jnp.full_like(d_ref, jnp.inf)
        i_ref[:] = jnp.zeros_like(i_ref)

    dots = jax.lax.dot_general(
        fa_ref[:], fb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TA, TB]
    cnt = jax.lax.dot_general(
        ma_ref[:], mb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.where(cnt > 0, -dots / jnp.maximum(cnt, 1.0), jnp.inf)

    # first-match argmin from min-reductions only (Mosaic-safe)
    dmin = jnp.min(d, axis=1, keepdims=True)       # [TA, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    col = jnp.min(
        jnp.where(d == dmin, cols, jnp.int32(tb)), axis=1, keepdims=True
    )
    idx = j * tb + col                             # [TA, 1]

    better = dmin < d_ref[:]
    d_ref[:] = jnp.where(better, dmin, d_ref[:])
    i_ref[:] = jnp.where(better, idx, i_ref[:])


def _pick_tiles(kc: int) -> tuple[int, int]:
    """(a_tile, b_tile): largest power-of-two square tiles keeping
    double-buffered A+B operand blocks (2 * 2 tiles * kc * 2B) within
    ~10 MB of the 16 MB VMEM.

    An asymmetric variant (resident A grown to 1024/2048, streamed B
    capped at 512 — the "B traffic scales with ceil(NA/a_tile)" theory)
    was tried and MEASURED SLOWER end-to-end on the v5e (1.61 s vs
    1.21 s for the 680x452 headline pair): near-VMEM-limit blocks defeat
    Mosaic's pipelining long before the HBM-traffic saving shows up.
    Keep tiles square and modest."""
    budget = 10 * 2 ** 20
    t = budget // (8 * kc * 2)
    size = 256
    while size * 2 <= min(t, 2048):
        size *= 2
    return size, size


def _nn_bidir_kernel(
    fa_ref, ma_ref, fb_ref, mb_ref,
    da_ref, ia_ref, db_ref, ib_ref,
):
    """One sweep, both argmin axes.

    The masked cosine distance is symmetric in its operands, so the b->a
    answer is the COLUMN argmin of the very same [TA, TB] tile the a->b
    row argmin consumes — computing the two directions in separate kernel
    launches (as the reference does with two patchmatch calls,
    main.cu:229-284) doubles the matmul FLOPs and the HBM streaming for
    no new information.  Row state lives in the A-indexed output block
    (contiguous revisiting across the j sweep); column state cannot use
    the same trick (B-tile blocks would be revisited non-contiguously
    across i, which Pallas forbids), so the whole [nj, TB] column table
    is ONE output block with a constant index map — it stays VMEM-
    resident across the entire grid (the accumulator pattern) and is
    updated at row j via a dynamic slice, flushing to HBM once at the
    final step.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ta = fa_ref.shape[0]
    tb = fb_ref.shape[0]

    @pl.when(j == 0)
    def _():
        da_ref[:] = jnp.full_like(da_ref, jnp.inf)
        ia_ref[:] = jnp.zeros_like(ia_ref)

    @pl.when(i == 0)
    def _():
        db_ref[pl.ds(j, 1), :] = jnp.full((1, tb), jnp.inf, jnp.float32)
        ib_ref[pl.ds(j, 1), :] = jnp.zeros((1, tb), jnp.int32)

    dots = jax.lax.dot_general(
        fa_ref[:], fb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TA, TB]
    cnt = jax.lax.dot_general(
        ma_ref[:], mb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.where(cnt > 0, -dots / jnp.maximum(cnt, 1.0), jnp.inf)

    # a -> b: first-match row argmin (identical to _nn_kernel)
    dmin = jnp.min(d, axis=1, keepdims=True)       # [TA, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    col = jnp.min(
        jnp.where(d == dmin, cols, jnp.int32(tb)), axis=1, keepdims=True
    )
    better = dmin < da_ref[:]
    da_ref[:] = jnp.where(better, dmin, da_ref[:])
    ia_ref[:] = jnp.where(better, j * tb + col, ia_ref[:])

    # b -> a: first-match column argmin folded into the scratch state.
    # Padded A rows carry mask 0 -> d = +inf, so they never win (strict <);
    # strict < across i + first-row tie-break inside the tile preserves the
    # global first-match semantics of a row-major unidirectional sweep.
    cmin = jnp.min(d, axis=0, keepdims=True)       # [1, TB]
    rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    row = jnp.min(
        jnp.where(d == cmin, rows, jnp.int32(ta)), axis=0, keepdims=True
    )
    prev_d = db_ref[pl.ds(j, 1), :]
    prev_i = ib_ref[pl.ds(j, 1), :]
    bbetter = cmin < prev_d
    db_ref[pl.ds(j, 1), :] = jnp.where(bbetter, cmin, prev_d)
    ib_ref[pl.ds(j, 1), :] = jnp.where(bbetter, i * ta + row, prev_i)


def _prep_operands(x_norm, patch_size, tile):
    """Patchify, flatten to [N, K*C] bf16, pad rows to a tile multiple."""
    h, w, _ = x_norm.shape
    n = h * w
    p, pm = patchify(x_norm.astype(jnp.float32), patch_size)
    k, c = p.shape[2], p.shape[3]
    n_pad = _round_up(n, tile)
    f = jnp.zeros((n_pad, k * c), jnp.bfloat16).at[:n].set(
        p.reshape(n, k * c).astype(jnp.bfloat16))
    m = jnp.zeros((n_pad, k), jnp.bfloat16).at[:n].set(
        pm.reshape(n, k).astype(jnp.bfloat16))
    return f, m, n, n_pad, k, c


def _unpack_nnf(best_i, d, n, h, w, wb, nb):
    best_i = jnp.minimum(best_i.reshape(-1)[:n], nb - 1)
    nnf = jnp.stack(
        [best_i % wb, best_i // wb], axis=-1
    ).astype(jnp.int32).reshape(h, w, 2)
    return nnf, d.reshape(-1)[:n].reshape(h, w)


@functools.partial(
    jax.jit, static_argnames=("patch_size", "a_tile", "b_tile")
)
def exact_nn_pallas_bidir(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    patch_size: int = 3,
    a_tile: int | None = None,
    b_tile: int | None = None,
):
    """Exhaustive NN in BOTH directions from one matrix sweep.

    Returns (nnf_ab, annd_ab, nnf_ba, annd_ba) — bitwise identical to
    ``exact_nn_pallas(a, b)`` + ``exact_nn_pallas(b, a)`` (the distance is
    symmetric and f32 accumulation over K is order-identical either way),
    at half the matmul FLOPs and half the HBM patch-table streaming.
    """
    ha, wa, _ = a_norm.shape
    hb, wb, _ = b_norm.shape

    k = patch_size * patch_size
    kc = k * a_norm.shape[-1]
    auto_a, auto_b = _pick_tiles(kc)
    if a_tile is None:
        a_tile = auto_a
    if b_tile is None:
        b_tile = auto_b
    fa, ma, na, na_pad, k, c = _prep_operands(a_norm, patch_size, a_tile)
    fb, mb, nb, nb_pad, _, _ = _prep_operands(b_norm, patch_size, b_tile)
    # Materialize the patch tables BEFORE the kernel launch: letting XLA
    # fuse/overlap the patchify+pad producers with the pallas_call
    # kernel-faults the relayed TPU worker at specific small geometries
    # (452 px L0, content 19x29 vs style 18x29 — round-4 bisection:
    # prep alone passes, the raw pallas_call on materialized operands
    # passes, their fusion faults; same composition-fault class as the
    # round-3 465x700 _level_match fault).  Bitwise-neutral by
    # construction.
    fa, ma, fb, mb = jax.lax.optimization_barrier((fa, ma, fb, mb))

    ni, nj = na_pad // a_tile, nb_pad // b_tile
    da, ia, db, ib = pl.pallas_call(
        _nn_bidir_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((a_tile, kc), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, k), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, kc), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((a_tile, 1), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, 1), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, b_tile), lambda gi, gj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nj, b_tile), lambda gi, gj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((na_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((nj, b_tile), jnp.float32),
            jax.ShapeDtypeStruct((nj, b_tile), jnp.int32),
        ],
    )(fa, ma, fb, mb)

    nnf_ab, annd_ab = _unpack_nnf(ia, da, na, ha, wa, wb, nb)
    nnf_ba, annd_ba = _unpack_nnf(ib, db, nb, hb, wb, wa, na)
    return nnf_ab, annd_ab, nnf_ba, annd_ba


@functools.partial(
    jax.jit, static_argnames=("patch_size", "a_tile", "b_tile")
)
def exact_nn_pallas(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    patch_size: int = 3,
    a_tile: int | None = None,
    b_tile: int | None = None,
):
    """Exhaustive NNF a->b on the MXU with a fused argmin.

    Same contract as ops.exact_nn.exact_nn: returns (nnf [Ha,Wa,2] int32,
    annd [Ha,Wa] f32).
    """
    ha, wa, _ = a_norm.shape
    hb, wb, _ = b_norm.shape
    na, nb = ha * wa, hb * wb

    pa, pam = patchify(a_norm.astype(jnp.float32), patch_size)
    pb, pbm = patchify(b_norm.astype(jnp.float32), patch_size)
    k, c = pa.shape[2], pa.shape[3]
    kc = k * c
    auto_a, auto_b = _pick_tiles(kc)
    if a_tile is None:
        a_tile = auto_a
    if b_tile is None:
        b_tile = auto_b

    na_pad = _round_up(na, a_tile)
    nb_pad = _round_up(nb, b_tile)
    fa = jnp.zeros((na_pad, kc), jnp.bfloat16).at[:na].set(
        pa.reshape(na, kc).astype(jnp.bfloat16))
    ma = jnp.zeros((na_pad, k), jnp.bfloat16).at[:na].set(
        pam.reshape(na, k).astype(jnp.bfloat16))
    fb = jnp.zeros((nb_pad, kc), jnp.bfloat16).at[:nb].set(
        pb.reshape(nb, kc).astype(jnp.bfloat16))
    mb = jnp.zeros((nb_pad, k), jnp.bfloat16).at[:nb].set(
        pbm.reshape(nb, k).astype(jnp.bfloat16))
    # padded B rows keep mask 0 -> cnt 0 -> +inf distance, never selected

    grid = (na_pad // a_tile, nb_pad // b_tile)
    d, i = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a_tile, kc), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, k), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, kc), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda gi, gj: (gj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((a_tile, 1), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_tile, 1), lambda gi, gj: (gi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((na_pad, 1), jnp.int32),
        ],
    )(fa, ma, fb, mb)

    best_i = jnp.minimum(i[:na, 0], nb - 1)
    nnf = jnp.stack(
        [best_i % wb, best_i // wb], axis=-1
    ).astype(jnp.int32).reshape(ha, wa, 2)
    return nnf, d[:na, 0].reshape(ha, wa)
