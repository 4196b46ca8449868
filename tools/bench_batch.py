#!/usr/bin/env python
"""Batched-serving throughput: batched transfer over a geometry bucket.

BASELINE config #4 (batch of pairs).  Two program shapes:

  * ``vmap`` — the element-parallel program whose batch axis shards over
    a multi-chip mesh; on ONE chip its per-pair cost vs the fused
    single-pair program is the parallel-efficiency figure the round-4
    VERDICT tracks (target <= 1.25x).  Since round 5 the three worst
    vmap scalers carry custom batching rules (WLS batch-in-channels,
    knn/window-refine batch-in-rows), so this number is the one to
    watch.
  * ``scan`` — one dispatch running the fused per-pair body
    sequentially; the single-chip sustained-throughput winner.

Usage: python tools/bench_batch.py [batch] [size] [vmap|scan|both]
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu.parallel.batch import make_batch_transfer
from nct_tpu.parallel.mesh import make_mesh
from nct_tpu.utils.compile_cache import enable

DEMO = "/root/reference/demo/example/in"


def main():
    enable()
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    size = int(_sys.argv[2]) if len(_sys.argv) > 2 else 452
    which = _sys.argv[3] if len(_sys.argv) > 3 else "vmap"

    cnt = cap_max_size(imread_bgr(f"{DEMO}/in0.png"), size)
    stl = cap_max_size(imread_bgr(f"{DEMO}/tar0.png"), size)
    cnt_b = jnp.asarray(np.stack([cnt] * batch))
    stl_b = jnp.asarray(np.stack([stl] * batch))
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(batch, dtype=jnp.uint32)
    )
    params = jax.device_put(vgg19.init_params())

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_space=1) if n_dev > 1 else None

    # fixed readout latency (bench.py methodology; block_until_ready is
    # a no-op on the relay)
    tiny = jax.jit(lambda x: x + 1)(jnp.zeros((), jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(tiny))
    readout = time.perf_counter() - t0

    results = {}
    modes = ("vmap", "scan") if which == "both" else (which,)
    for mode in modes:
        step = make_batch_transfer(
            Config(), mesh if mode == "vmap" else None, mode=mode)

        def run():
            out = step(params, cnt_b, stl_b, keys, 2.0)
            float(jnp.sum(out.astype(jnp.float32)))
            return out

        run()  # compile + drain
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            reps.append(max(time.perf_counter() - t0 - readout, 1e-3))
        dt = sorted(reps)[1]
        mp = batch * cnt.shape[0] * cnt.shape[1] / 1e6
        results[mode] = {
            "s_total": round(dt, 3),
            "s_per_pair": round(dt / batch, 4),
            "mps": round(mp / dt, 4),
            "reps": [round(r, 3) for r in reps],
        }
        print(f"{mode}: batch={batch} pair={cnt.shape[1]}x{cnt.shape[0]}: "
              f"{dt:.2f}s -> {mp/dt:.4f} MP/s "
              f"({dt/batch:.3f} s/pair amortized)")
    print(json.dumps({"batch": batch, "size": size,
                      "geometry": f"{cnt.shape[1]}x{cnt.shape[0]}",
                      **results}))


if __name__ == "__main__":
    main()
