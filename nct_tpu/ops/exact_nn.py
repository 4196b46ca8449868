"""Exact nearest-neighbour field via streaming-argmin matmuls.

PatchMatch (reference: GeneralizedPatchMatch.cu:677-831) exists because on
2008-era GPUs an exhaustive patch search was unaffordable.  On TPU the
exhaustive search IS the fast path for the pyramid's coarse/mid levels: the
masked cosine patch distance

    d(p, q) = -<Pa[p], Pb[q]> / (Ma[p] . Mb[q])

is two matmuls over the patchified features (Pa [Na, K*C] x Pb [Nb, K*C]^T
on the MXU) and a running argmin, streamed over B tiles so the full
[Na, Nb] cost volume is never materialized.  The result is the *global*
minimizer of the exact same metric the reference's PatchMatch only
approximates — strictly better correspondence quality at a fraction of the
wall-clock for levels where Na*Nb*K*C stays within MXU budget (conv5_1 ..
conv3_1 at 700 px; see pipeline.level_uses_exact_nn).

Memory: tiles of [A_CHUNK, B_TILE] float32; FLOPs: Na*Nb*(K*C+K)*2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.ops.patchmatch import patchify


@functools.partial(
    jax.jit, static_argnames=("patch_size", "a_chunk", "b_tile", "bf16")
)
def exact_nn(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    patch_size: int = 3,
    a_chunk: int = 8192,
    b_tile: int = 2048,
    bf16: bool = True,
):
    """Exhaustive NNF a->b.  Returns (nnf [Ha,Wa,2] int32, annd [Ha,Wa] f32).

    a_norm/b_norm: L2-normalized features [H, W, C]; the distance matches
    dist_compute_single (GeneralizedPatchMatch.cu:355-405) exactly,
    including the out-of-bounds validity masking via the count matmul.
    """
    ha, wa, _ = a_norm.shape
    hb, wb, _ = b_norm.shape
    na, nb = ha * wa, hb * wb

    pa, pam = patchify(a_norm.astype(jnp.float32), patch_size)
    pb, pbm = patchify(b_norm.astype(jnp.float32), patch_size)
    k = pa.shape[2]
    c = pa.shape[3]
    dt = jnp.bfloat16 if bf16 else jnp.float32

    fa = pa.reshape(na, k * c).astype(dt)
    fb = pb.reshape(nb, k * c).astype(dt)
    ma = pam.reshape(na, k).astype(dt)
    mb = pbm.reshape(nb, k).astype(dt)

    # pad B pixel count to a tile multiple; padded rows get +inf distance
    pad_b = (-nb) % b_tile
    fb = jnp.pad(fb, ((0, pad_b), (0, 0)))
    mb = jnp.pad(mb, ((0, pad_b), (0, 0)))
    nb_pad = nb + pad_b

    pad_a = (-na) % a_chunk
    fa = jnp.pad(fa, ((0, pad_a), (0, 0)))
    ma = jnp.pad(ma, ((0, pad_a), (0, 0)))
    n_chunks = (na + pad_a) // a_chunk
    n_tiles = nb_pad // b_tile

    fb_tiles = fb.reshape(n_tiles, b_tile, k * c)
    mb_tiles = mb.reshape(n_tiles, b_tile, k)

    def one_chunk(args):
        fac, mac = args                       # [A, KC], [A, K]

        def tile_step(carry, tile):
            best_d, best_i = carry
            fbt, mbt, t0 = tile
            dots = jax.lax.dot_general(
                fac, fbt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                  # [A, T]
            cnt = jax.lax.dot_general(
                mac, mbt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = jnp.where(cnt > 0, -dots / jnp.maximum(cnt, 1.0), jnp.inf)
            col = jnp.argmin(d, axis=1)
            dmin = jnp.take_along_axis(d, col[:, None], 1)[:, 0]
            idx = t0 + col.astype(jnp.int32)
            better = dmin < best_d
            return (
                jnp.where(better, dmin, best_d),
                jnp.where(better, idx, best_i),
            ), None

        t0s = (jnp.arange(n_tiles, dtype=jnp.int32) * b_tile)
        init = (
            jnp.full((fac.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((fac.shape[0],), jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            tile_step, init, (fb_tiles, mb_tiles, t0s)
        )
        # padded B rows have mask 0 -> cnt 0 -> inf distance, never chosen
        return best_d, jnp.minimum(best_i, nb - 1)

    fa_chunks = fa.reshape(n_chunks, a_chunk, k * c)
    ma_chunks = ma.reshape(n_chunks, a_chunk, k)
    best_d, best_i = jax.lax.map(one_chunk, (fa_chunks, ma_chunks))
    best_d = best_d.reshape(-1)[:na]
    best_i = best_i.reshape(-1)[:na]

    nnf = jnp.stack(
        [best_i % wb, best_i // wb], axis=-1
    ).astype(jnp.int32).reshape(ha, wa, 2)
    return nnf, best_d.reshape(ha, wa)
