#!/usr/bin/env python
"""Collective/halo accounting for the space-sharded pipeline (BASELINE
config #5, >1-chip images).

Real multi-chip hardware is not reachable from this sandbox, so instead of
wall-clock this reports WHAT the SPMD partitioner actually inserts: every
collective op in the compiled row-sharded module, with shapes and byte
volumes.  Byte volumes scale linearly with pixel count, so the table
extrapolates to the 1000 px geometry; ICI time = bytes / (n_links x
link_bw), compute time scales at fixed MP/s/chip — the crossover where
sharding pays is where compute/n_chips exceeds the halo bytes' ICI time.

Runs itself on a virtual n-device CPU mesh in a subprocess (the ambient
backend may be the single axon TPU).

Usage: python tools/analyze_sharding.py [h w] [n_space]
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import collections
import re
import subprocess


def _reexec_on_cpu(n: int) -> bool:
    """Re-exec under a forced n-device CPU platform if needed."""
    if _os.environ.get("_NCT_SHARD_ANALYZE") == "1":
        return False
    env = dict(_os.environ)
    env["_NCT_SHARD_ANALYZE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    rc = subprocess.run([_sys.executable] + _sys.argv, env=env).returncode
    _sys.exit(rc)


_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "u8": 1, "pred": 1,
          "f64": 8, "s64": 8, "u64": 8, "s8": 1, "f16": 2}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _op_bytes(line: str) -> int:
    """Bytes of the op's RESULT shape(s): the shape tokens between '='
    and the op name (HLO: ``%x = f32[8,16]{1,0} all-gather(...)``)."""
    rhs = line.split("=", 1)[1]
    rhs = rhs.split("(", 1)[0]          # result type(s) + op name only
    total = 0
    for dt, dims in _SHAPE_RE.findall(rhs):
        if dt not in _BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def main() -> None:
    args = [a for a in _sys.argv[1:] if not a.startswith("-")]
    h = int(args[0]) if len(args) > 0 else 96
    w = int(args[1]) if len(args) > 1 else 128
    n_space = int(args[2]) if len(args) > 2 else 8
    _reexec_on_cpu(n_space)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    # CPU AOT serialization of SPMD executables segfaults; writes off.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 10 ** 9
    )

    from nct_tpu.config import Config
    from nct_tpu.models import vgg19
    from nct_tpu.parallel.batch import make_batch_transfer
    from nct_tpu.parallel.mesh import make_mesh

    config = Config(
        pm_iters=2, cg_iters=8, cg_iters_final=8, cg_iters_mg=6,
        cg_iters_final_mg=4, wls_cg_iters=8, kmeans_iters=3,
        feature_dtype="float32", vgg_compute_dtype="float32",
    )
    mesh = make_mesh(n_data=1, n_space=n_space)
    step = make_batch_transfer(config, mesh)
    params = vgg19.init_params()
    rng = np.random.default_rng(0)
    cnt = jnp.asarray(rng.integers(0, 256, (1, h, w, 3)), jnp.uint8)
    stl = jnp.asarray(rng.integers(0, 256, (1, h, w, 3)), jnp.uint8)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.zeros((1,), jnp.uint32))

    with mesh:
        # step is already the sharded jit; re-wrapping it in a fresh jit
        # would drop its in_shardings and compile a replicated module.
        lowered = step.lower(params, cnt, stl, keys, 2.0)
        compiled = lowered.compile()
    txt = compiled.as_text()

    kinds = ("all-gather", "all-reduce", "collective-permute", "all-to-all",
             "reduce-scatter")
    counts = collections.Counter()
    bytes_ = collections.Counter()
    for line in txt.splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        for k in kinds:
            # "%x = f32[...]{...} all-gather(...)", incl. -start variants
            if re.search(rf"\s{k}(-start)?\(", s):
                counts[k] += 1
                bytes_[k] += _op_bytes(s)
                break

    mp = h * w / 1e6
    mp_1000 = 0.665  # 1000x665 content
    print(f"space-sharded module, {w}x{h}, n_space={n_space}, "
          f"batch=1  ({mp:.4f} MP)")
    print(f"{'collective':20} {'count':>6} {'MB':>10} {'MB @1000px':>12}")
    total = 0
    for k in kinds:
        if counts[k]:
            mb = bytes_[k] / 2 ** 20
            print(f"{k:20} {counts[k]:>6} {mb:>10.2f} "
                  f"{mb * mp_1000 / mp:>12.1f}")
            total += bytes_[k]
    print(f"{'TOTAL':20} {sum(counts.values()):>6} "
          f"{total / 2 ** 20:>10.2f} {total / 2 ** 20 * mp_1000 / mp:>12.1f}")
    # v5e ICI: 4 links/chip ~ 45 GB/s each direction per link pair.
    ici_gbs = 4 * 45
    sec = total * mp_1000 / mp / 1e9 / ici_gbs
    print(f"\nest. ICI time at 1000px geometry (v5e, {ici_gbs} GB/s "
          f"aggregate): {sec * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
