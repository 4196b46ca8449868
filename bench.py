#!/usr/bin/env python
"""End-to-end benchmark: full 5-level pipeline on one demo-scale pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is end-to-end megapixels/sec/chip on the full progressive pipeline
(BASELINE.md north star).  The baseline rate is the rebuild target from
BASELINE.json — a 700 px pair (~0.33 MP) through all 5 levels in 2 s on one
chip, i.e. 0.163 MP/s — so vs_baseline > 1 means faster than target.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu.pipeline import transfer_pair_jit
from nct_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

DEMO = "/root/reference/demo/example/in"
BASELINE_MPS = (700 * 466 / 1e6) / 2.0  # 700px pair in 2 s (BASELINE.md)
# optional argv size (e.g. `bench.py 1000` for the MAX_SIZE configuration;
# sizes above the demo assets upscale).  The driver's no-arg invocation
# keeps the demo pair's native 680x452 — the round-1 headline geometry —
# by capping (never upscaling) at the default, exactly like the CLI does.
BENCH_MAX_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 700
BENCH_UPSCALE = len(sys.argv) > 1
# MAX_SIZE-class geometries exceed the remote XLA service's memory when the
# whole 5-level pipeline is fused into one program (the compiler subprocess
# is OOM-killed); above the headline geometry, run per-level programs.
BENCH_STAGED = "staged" in sys.argv[2:] or BENCH_MAX_SIZE > 700


def _fit_to_size(img: np.ndarray, size: int) -> np.ndarray:
    """Cap to `size` — and for bench geometries LARGER than the demo
    assets, upscale so the long side hits `size` exactly (the reference
    only ever downscales, main.cu:499-522; upscale is bench-only)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if max(h, w) >= size or not BENCH_UPSCALE:
        return np.asarray(cap_max_size(img, size))
    from nct_tpu.ops.resize import resize_bilinear
    import jax.numpy as _jnp
    scale = size / max(h, w)
    out = resize_bilinear(
        _jnp.asarray(img), int(round(h * scale)), int(round(w * scale))
    )
    return np.asarray(out).astype(np.uint8)


def load_pair():
    cnt_p = os.path.join(DEMO, "in0.png")
    stl_p = os.path.join(DEMO, "tar0.png")
    if os.path.exists(cnt_p) and os.path.exists(stl_p):
        cnt = _fit_to_size(imread_bgr(cnt_p), BENCH_MAX_SIZE)
        stl = _fit_to_size(imread_bgr(stl_p), BENCH_MAX_SIZE)
    else:  # synthetic fallback at demo-pair geometry
        rng = np.random.default_rng(0)
        cnt = rng.integers(0, 256, (452, 680, 3)).astype(np.uint8)
        stl = rng.integers(0, 256, (600, 960, 3)).astype(np.uint8)
    return cnt, stl


def main() -> None:
    cnt, stl = load_pair()
    # device_put once: numpy params would re-upload ~80 MB per call
    params = jax.device_put(vgg19.init_params())
    config = Config()
    key = jax.random.PRNGKey(7)

    cnt_d = jax.device_put(cnt)
    stl_d = jax.device_put(stl)

    def run():
        if BENCH_STAGED:
            from nct_tpu.pipeline import transfer_pair

            out = transfer_pair(
                params, cnt_d, stl_d, 2.0, config, key=key, staged=True
            )
        else:
            out = transfer_pair_jit(params, cnt_d, stl_d, 2.0, key, config)
        # block_until_ready is a no-op on relayed backends; a scalar D2H
        # readout is the only reliable completion barrier.
        return float(jnp.sum(out.astype(jnp.float32)))

    run()  # warmup: compile + drain
    # subtract the fixed readout/rpc latency via a trivial program
    tiny = jax.jit(lambda x: x + 1)(jnp.zeros((), jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(tiny))
    readout = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    dt = max(time.perf_counter() - t0 - readout, 1e-3)

    mp = cnt.shape[0] * cnt.shape[1] / 1e6
    mps = mp / dt
    print(json.dumps({
        "metric": "e2e_megapixels_per_sec",
        "value": round(mps, 4),
        "unit": f"MP/s/chip (pair {cnt.shape[1]}x{cnt.shape[0]}, 5 levels, {dt:.2f}s)",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
    }))


if __name__ == "__main__":
    main()
