"""Ring-scheduled exact NN search for space-sharded images.

Under automatic SPMD partitioning, the streaming-argmin matcher
(ops/exact_nn.py) forces the partitioner to ALL-GATHER the style side's
full patch table onto every "space" shard — 90% of the sharded module's
collective bytes (tools/analyze_sharding.py) and, worse, a per-device
memory footprint that grows with the *style image*, not the shard.  That
replication is exactly what the reference's single-GPU PatchMatch cannot
avoid either (the whole style feature map is resident,
GeneralizedPatchMatch.cu:677-831).

This module removes the ceiling with an explicit ring schedule
(`jax.shard_map` + `lax.ppermute`), the 2-D-image analogue of ring
attention: both patch tables stay row-sharded; each of the n steps folds
the local running argmin against the currently-resident style block while
the NEXT block is already in flight around the ring.  Per-device memory is
O(Nb/n); ICI traffic is (n-1)/n of one style-table pass — the same order
as the all-gather, but streamed and overlapped with the matmuls instead of
serialized in front of them, and never materialized whole.

The math is bit-identical to exact_nn: masked cosine patch distance via
two MXU matmuls and a running argmin (reference metric:
dist_compute_single, GeneralizedPatchMatch.cu:355-405).  Tie-breaking
matches too — the fold keeps the earliest global style index on equal
distances because blocks are visited in rotated-but-offset-tracked order
and `<` comparison is used against the incumbent only for strictly better
candidates; across different rotations ties can land differently at f32
ULP level, which the equality test bounds statistically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nct_tpu.ops.patchmatch import patchify


def _tile_argmin(fac, mac, fb_tiles, mb_tiles, t0s, init):
    """Fold the streaming argmin of one A-chunk over B tiles.

    fac [A, KC], mac [A, K]; fb_tiles [T, Bt, KC], mb_tiles [T, Bt, K];
    t0s [T] global row offsets; init (best_d [A], best_i [A]).
    """

    def tile_step(carry, tile):
        best_d, best_i = carry
        fbt, mbt, t0 = tile
        dots = jax.lax.dot_general(
            fac, fbt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cnt = jax.lax.dot_general(
            mac, mbt, dimension_numbers=(((1,), (1,)), ((), ())),
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

    (best_d, best_i), _ = jax.lax.scan(
        tile_step, init, (fb_tiles, mb_tiles, t0s)
    )
    return best_d, best_i


def ring_exact_nn(
    a_norm: jnp.ndarray,
    b_norm: jnp.ndarray,
    mesh: Mesh,
    axis: str = "space",
    patch_size: int = 3,
    a_chunk: int = 8192,
    b_tile: int = 2048,
    bf16: bool = True,
):
    """Exhaustive NNF a->b with both patch tables row-sharded over `axis`.

    Same contract as ops.exact_nn.exact_nn: a_norm/b_norm are
    L2-normalized features [H, W, C]; returns (nnf [Ha,Wa,2] int32,
    annd [Ha,Wa] f32).  Call under `mesh`; inputs may be replicated or
    row-sharded — the internal tables are explicitly resharded to
    P(axis) rows either way.
    """
    n = mesh.shape[axis]
    ha, wa, _ = a_norm.shape
    hb, wb, _ = b_norm.shape
    na, nb = ha * wa, hb * wb

    pa, pam = patchify(a_norm.astype(jnp.float32), patch_size)
    pb, pbm = patchify(b_norm.astype(jnp.float32), patch_size)
    k, c = pa.shape[2], pa.shape[3]
    dt = jnp.bfloat16 if bf16 else jnp.float32

    fa = pa.reshape(na, k * c).astype(dt)
    fb = pb.reshape(nb, k * c).astype(dt)
    ma = pam.reshape(na, k).astype(dt)
    mb = pbm.reshape(nb, k).astype(dt)

    # pad so every shard holds an integer number of uniform chunks/tiles;
    # padded B rows have mask 0 -> count 0 -> +inf distance, never chosen
    na_loc = -(-na // n)
    a_chunk = min(a_chunk, na_loc)
    n_chunks = -(-na_loc // a_chunk)
    na_pad = n * n_chunks * a_chunk
    nb_loc = -(-nb // n)
    b_tile = min(b_tile, nb_loc)
    n_tiles = -(-nb_loc // b_tile)
    nb_pad = n * n_tiles * b_tile
    nb_loc = n_tiles * b_tile

    fa = jnp.pad(fa, ((0, na_pad - na), (0, 0)))
    ma = jnp.pad(ma, ((0, na_pad - na), (0, 0)))
    fb = jnp.pad(fb, ((0, nb_pad - nb), (0, 0)))
    mb = jnp.pad(mb, ((0, nb_pad - nb), (0, 0)))

    spec = P(axis)
    perm = [(j, (j - 1) % n) for j in range(n)]

    def shard_body(fa_s, ma_s, fb_s, mb_s):
        me = jax.lax.axis_index(axis)
        fa_chunks = fa_s.reshape(n_chunks, a_chunk, k * c)
        ma_chunks = ma_s.reshape(n_chunks, a_chunk, k)

        def ring_step(carry, step):
            best_d, best_i, fb_blk, mb_blk = carry
            # launch the next block transfer FIRST so XLA's async
            # collective-permute overlaps with this step's matmuls
            if n > 1:
                fb_nxt = jax.lax.ppermute(fb_blk, axis, perm)
                mb_nxt = jax.lax.ppermute(mb_blk, axis, perm)
            else:
                fb_nxt, mb_nxt = fb_blk, mb_blk
            blk_id = (me + step) % n
            t0s = (
                blk_id * nb_loc
                + jnp.arange(n_tiles, dtype=jnp.int32) * b_tile
            )
            fb_tiles = fb_blk.reshape(n_tiles, b_tile, k * c)
            mb_tiles = mb_blk.reshape(n_tiles, b_tile, k)

            def one_chunk(args):
                fac, mac, bd, bi = args
                return _tile_argmin(
                    fac, mac, fb_tiles, mb_tiles, t0s, (bd, bi)
                )

            best_d, best_i = jax.lax.map(
                one_chunk, (fa_chunks, ma_chunks, best_d, best_i)
            )
            return (best_d, best_i, fb_nxt, mb_nxt), None

        # the scan carry becomes device-varying after the first fold
        # (blk_id depends on axis_index); derive the init from the shard's
        # own operands so its varying-axes set matches in every context
        # (plain shard_map: {axis}; under a spmd_axis_name vmap the
        # operands additionally vary over the batch mesh axis)
        zero = fa_chunks[:, :, 0].astype(jnp.float32) * 0.0
        init = (
            zero + jnp.inf,
            zero.astype(jnp.int32),
            fb_s,
            mb_s,
        )
        (best_d, best_i, _, _), _ = jax.lax.scan(
            ring_step, init, jnp.arange(n, dtype=jnp.int32)
        )
        return best_d.reshape(-1), best_i.reshape(-1)

    # check_vma=False: under a spmd_axis_name vmap (the data x space
    # batched pipeline) the varying-axes checker rejects mixes of
    # {space}-varying (axis_index arithmetic) and {data, space}-varying
    # (batched operand) values that are semantically fine — JAX's own
    # error message names this flag as the workaround.
    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    best_d, best_i = mapped(
        jax.lax.with_sharding_constraint(fa, NamedSharding(mesh, spec)),
        jax.lax.with_sharding_constraint(ma, NamedSharding(mesh, spec)),
        jax.lax.with_sharding_constraint(fb, NamedSharding(mesh, spec)),
        jax.lax.with_sharding_constraint(mb, NamedSharding(mesh, spec)),
    )
    best_d = best_d[:na]
    best_i = jnp.minimum(best_i[:na], nb - 1)
    nnf = jnp.stack(
        [best_i % wb, best_i // wb], axis=-1
    ).astype(jnp.int32).reshape(ha, wa, 2)
    return nnf, best_d.reshape(ha, wa)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "patch_size", "a_chunk", "b_tile",
                     "bf16"),
)
def ring_exact_nn_jit(a_norm, b_norm, mesh, axis="space", patch_size=3,
                      a_chunk=8192, b_tile=2048, bf16=True):
    """Jitted wrapper (Mesh is hashable, so it rides as a static arg)."""
    return ring_exact_nn(
        a_norm, b_norm, mesh, axis, patch_size, a_chunk, b_tile, bf16
    )
