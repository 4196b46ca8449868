#!/usr/bin/env python
"""Batched-serving throughput: vmapped transfer over a geometry bucket.

BASELINE config #4 (batch of pairs).  Latency-bound stages (small gathers,
CG reductions) amortize across the batch, so MP/s/chip rises well above the
single-pair number — the serving-throughput figure of merit.

Usage: python tools/bench_batch.py [batch] [size]
"""

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

DEMO = "/root/reference/demo/example/in"


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    size = int(_sys.argv[2]) if len(_sys.argv) > 2 else 452

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
    step = make_batch_transfer(Config(), mesh)

    def run():
        out = step(params, cnt_b, stl_b, keys, 2.0)
        float(jnp.sum(out.astype(jnp.float32)))
        return out

    run()  # compile + drain
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    mp = batch * cnt.shape[0] * cnt.shape[1] / 1e6
    print(f"batch={batch} pair={cnt.shape[1]}x{cnt.shape[0]}: "
          f"{dt:.2f}s -> {mp/dt:.4f} MP/s "
          f"({dt/batch:.2f} s/pair amortized)")


if __name__ == "__main__":
    main()
