#!/usr/bin/env python
"""Per-layer forward benchmarking — the ``caffe time`` equivalent.

Reference: tools/caffe.cpp ``time()`` (per-layer Forward timing with
caffe::Timer) and net_speed_benchmark.cpp.  Runs each layer of a prototxt
net in isolation (jitted, block_until_ready) plus the fused whole-net
forward, on whatever backend is active (TPU by default).

Usage: python tools/layer_time.py <deploy.prototxt> [H W] [--weights npz]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.nn import Net
from nct_tpu.nn.layers import LAYER_REGISTRY


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    proto = sys.argv[1]
    h = int(sys.argv[2]) if len(sys.argv) > 3 else 224
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 224

    net = Net(proto)
    rng = np.random.default_rng(0)
    # seed every parametered layer with random weights if none loaded
    in_c = 3
    for cfg in net.layers:
        name = str(cfg.get("name"))
        if str(cfg.get("type")) == "Convolution" and name not in net.params:
            cp = cfg.get("convolution_param", {})
            k = int(cp.get("kernel_size", 3))
            out_c = int(cp.get("num_output"))
            net.set_params(name, {
                "w": rng.standard_normal((k, k, in_c, out_c)).astype(
                    np.float32) * 0.05,
                "b": np.zeros((out_c,), np.float32),
            })
            in_c = out_c

    x = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    # fused whole-net forward
    run = jax.jit(lambda inp: net.forward({"data": inp}))
    blobs = jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    for _ in range(5):
        blobs = jax.block_until_ready(run(x))
    total = (time.perf_counter() - t0) / 5
    print(f"whole net forward: {total*1000:.2f} ms")

    # per-layer timing on realistic inputs
    for cfg in net.layers:
        ltype = str(cfg.get("type"))
        if ltype == "Input":
            continue
        name = str(cfg.get("name"))
        bottoms = cfg.get("bottom")
        bottoms = bottoms if isinstance(bottoms, list) else [bottoms]
        ins = [blobs[str(b)] for b in bottoms]
        fn = LAYER_REGISTRY[ltype]
        lay = jax.jit(lambda *a, _fn=fn, _cfg=cfg, _p=net.params.get(name, {}):
                      _fn(_p, _cfg, *a))
        jax.block_until_ready(lay(*ins))
        t0 = time.perf_counter()
        for _ in range(5):
            jax.block_until_ready(lay(*ins))
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:<16} {ltype:<14} {dt*1000:8.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
