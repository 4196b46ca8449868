#!/usr/bin/env python
"""Capture the nonlocal-solve inputs of a demo-pair run to an npz.

Runs the pipeline EAGERLY (transfer_pair called from Python, not under
jit) so every ``solve_nonlocal`` call sees concrete arrays, and saves each
level's system inputs (src/ref Lab, confidence, k-NN graph, warm start) to
``out/nl_L{level}.npz``.  tools/study_nl.py then replays CG variants on the
captured systems without re-running the matcher — the offline bench behind
the cg_iters_mg budget decisions (VERDICT round-3 #1).

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/capture_nl.py \
      --pair 1 --size 680 --out /tmp/nl_in1
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import numpy as np

EXAMPLE = "/root/reference/demo/example"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pair", type=int, default=1)
    ap.add_argument("--size", type=int, default=680)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=_os.environ.get("NCT_VGG_WEIGHTS"))
    args = ap.parse_args(argv)

    import jax

    from nct_tpu import pipeline
    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.solve.nonlocal_solve import solve_nonlocal

    _os.makedirs(args.out, exist_ok=True)
    params = jax.device_put(
        vgg19.load_params(args.weights) if args.weights
        else vgg19.init_params())
    config = Config()

    calls = []

    def capturing(a0, b0, src_lab, ref_lab, confidence, nbr_ids, nbr_w,
                  norm_factor, *posargs, **kw):
        lvl = len(calls)
        np.savez_compressed(
            f"{args.out}/nl_L{lvl}.npz",
            a0=np.asarray(a0), b0=np.asarray(b0),
            src_lab=np.asarray(src_lab), ref_lab=np.asarray(ref_lab),
            confidence=np.asarray(confidence),
            nbr_ids=np.asarray(nbr_ids), nbr_w=np.asarray(nbr_w),
            norm_factor=np.float32(norm_factor),
            candidates=np.asarray(kw["candidates"]),
            nbr_slots=np.asarray(kw["nbr_slots"]),
        )
        calls.append(lvl)
        print(f"[capture] L{lvl} {src_lab.shape} saved", flush=True)
        return solve_nonlocal(a0, b0, src_lab, ref_lab, confidence,
                              nbr_ids, nbr_w, norm_factor, *posargs, **kw)

    pipeline.solve_nonlocal = capturing
    try:
        cnt = jax.device_put(np.asarray(cap_max_size(
            imread_bgr(f"{EXAMPLE}/in/in{args.pair}.png"), args.size)))
        stl = jax.device_put(np.asarray(cap_max_size(
            imread_bgr(f"{EXAMPLE}/in/tar{args.pair}.png"), args.size)))
        t0 = time.perf_counter()
        out = pipeline.transfer_pair(
            params, cnt, stl, 2.0, config, key=jax.random.PRNGKey(7))
        np.asarray(out)
        print(f"[capture] pair {args.pair} done "
              f"{time.perf_counter() - t0:.1f}s, {len(calls)} levels -> "
              f"{args.out}", flush=True)
    finally:
        pipeline.solve_nonlocal = solve_nonlocal
    return 0


if __name__ == "__main__":
    _sys.exit(main())
