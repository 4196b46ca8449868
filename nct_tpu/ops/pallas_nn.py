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
