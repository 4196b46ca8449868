"""Sharded batch transfer over a device mesh.

The reference processes pairs.txt serially on one GPU (reference:
main.cu:471); here a geometry bucket of pairs becomes one vmapped, jitted
program whose batch axis is sharded over the mesh's ``data`` axis and whose
image rows may additionally shard over ``space`` (SURVEY §2.3 #5, §5
"distributed communication backend").  Pairs in a bucket share (H, W) and
(Hs, Ws); callers group/pad pairs into buckets to avoid recompiles
(SURVEY §7 "bucket-and-pad").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nct_tpu.config import Config
from nct_tpu.pipeline import transfer_pair


def make_batch_transfer(
    config: Config, mesh: Mesh | None = None, mode: str = "auto",
    ring_nn: bool = True,
):
    """Build a jitted batched transfer fn.

    Returns fn(params, cnt_batch [B,H,W,3] u8, stl_batch [B,Hs,Ws,3] u8,
    bds_weight, keys [B,2] u32) -> [B,H,W,3] u8.  The BDS weight is a
    bucket-level constant (it is baked into vote weights; per-pair weights
    would need one bucket per distinct value, as the reference effectively
    recompiles nothing but also fixes it per run).

    ``mode``:
      * ``"scan"`` — ONE program that runs the single-pair body
        sequentially over the bucket (``lax.map``).  One dispatch amortizes
        the per-call host/relay overhead across the bucket, the per-pair
        trace is the fast fused one (early-exit while-loop CG included —
        scan bodies are sequential, so dynamic trip counts cost nothing),
        and intermediates are freed between pairs.  The single-chip
        serving winner: the vmapped program measured ~4x slower per pair
        (fixed-trip CG + batched-gather lowerings, see PERFORMANCE.md).
      * ``"vmap"`` — element-parallel program whose batch axis can shard
        over a mesh; required for space sharding and multi-chip buckets.
      * ``"auto"`` — scan without a mesh, vmap with one.

    ``ring_nn``: under space sharding, run the exact-NN levels through the
    ring-scheduled matcher (no style-table all-gather); False keeps the
    auto-partitioned matcher (replicates the style patch table per shard —
    fine when it fits HBM, a memory ceiling when it doesn't).
    """
    if mode == "auto":
        mode = "scan" if mesh is None else "vmap"

    if mode == "scan":
        assert mesh is None, "scan mode is single-device; use vmap + mesh"

        def scan_step(params, cnt_b, stl_b, keys, bds_weight):
            return jax.lax.map(
                lambda args: transfer_pair(
                    params, args[0], args[1], bds_weight, config,
                    key=args[2],
                ),
                (cnt_b, stl_b, keys),
            )

        return jax.jit(scan_step, static_argnums=(4,))

    # vmapping a lax.while_loop serializes the whole batch on its slowest
    # element at every step; fixed-trip scan CG keeps the batch in lockstep
    # with masked updates instead (identical results).
    config = dataclasses.replace(config, cg_dynamic=False)
    space_sharded = mesh is not None and mesh.shape.get("space", 1) > 1
    if space_sharded:
        # XLA 0.9's SPMD partitioner emits a mis-typed halo-padding
        # broadcast for row-sharded bf16 convolutions (hlo_verifier
        # RET_CHECK SameElementType after spmd-partitioning); run the VGG
        # forward in f32 under space sharding — the matcher still casts
        # features to feature_dtype afterwards.
        config = dataclasses.replace(config, vgg_compute_dtype="float32")
        if ring_nn:
            # Route the exact-NN levels through the ring-scheduled matcher
            # (parallel/ring_nn.py): no style-table all-gather, per-device
            # matcher memory O(style/n_space).  See Config.space_mesh.
            config = dataclasses.replace(config, space_mesh=mesh)

    def single(params, cnt, stl, key, bds_weight):
        return transfer_pair(params, cnt, stl, bds_weight, config, key=key)

    # spmd_axis_name tells the inner shard_map (the ring matcher) that the
    # vmapped batch dimension is the mesh's "data" axis, so its specs gain
    # the batch sharding instead of replicating the batch per data shard.
    batched = jax.vmap(
        single, in_axes=(None, 0, 0, 0, None),
        spmd_axis_name="data" if (space_sharded and ring_nn) else None,
    )

    if mesh is None:
        return jax.jit(batched, static_argnums=(4,))

    data_sharding = NamedSharding(mesh, P("data"))
    img_sharding = NamedSharding(mesh, P("data", "space"))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        static_argnums=(4,),
        in_shardings=(repl, img_sharding, img_sharding, data_sharding),
        out_shardings=img_sharding,
    )
