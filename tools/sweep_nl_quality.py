#!/usr/bin/env python
"""Closure-vs-budget sweep for the nonlocal mg-PCG (VERDICT round-3 #1).

Runs test_golden_all_pairs' metric (golden-MAE closure at 120x160, shared
geometry, one program) under a given nonlocal CG iteration cap and V-cycle
strength, printing one row per pair — the data behind choosing
config.cg_iters_mg and the make_mg_preconditioner defaults.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/sweep_nl_quality.py \
      --iters 12 --coarse-sweeps 32 --coarsest 2
"""

import argparse
import dataclasses
import functools
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
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--coarse-sweeps", type=int, default=None)
    ap.add_argument("--coarsest", type=int, default=None)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--wls-iters", type=int, default=None,
                    help="override wls_cg_iters_mg")
    args = ap.parse_args(argv)

    import jax

    from nct_tpu.config import Config
    from nct_tpu.io import imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.pipeline import transfer_pair_jit
    from nct_tpu.solve import nonlocal_solve as NL

    # pin V-cycle strength via defaults override (trace-time read)
    if args.coarse_sweeps is not None or args.coarsest is not None:
        kw = {}
        if args.coarse_sweeps is not None:
            kw["coarse_sweeps"] = args.coarse_sweeps
        if args.coarsest is not None:
            kw["coarsest"] = args.coarsest
        NL.make_mg_preconditioner = functools.partial(
            NL.make_mg_preconditioner.__wrapped__
            if hasattr(NL.make_mg_preconditioner, "__wrapped__")
            else NL.make_mg_preconditioner, **kw)

    over = {"cg_iters_mg": args.iters}
    if args.tol is not None:
        over["cg_tol"] = args.tol
    if args.wls_iters is not None:
        over["wls_cg_iters_mg"] = args.wls_iters
    config = dataclasses.replace(Config(), **over)
    params = vgg19.init_params()
    key = jax.random.PRNGKey(7)
    h, w = 120, 160
    t0 = time.perf_counter()
    out_rows = []
    for i in range(5):
        cnt = np.asarray(resize_bilinear(
            imread_bgr(f"{EXAMPLE}/in/in{i}.png"), h, w)).astype(np.uint8)
        stl = np.asarray(resize_bilinear(
            imread_bgr(f"{EXAMPLE}/in/tar{i}.png"), h, w)).astype(np.uint8)
        gold = np.asarray(resize_bilinear(
            imread_bgr(f"{EXAMPLE}/res/in{i}_tar{i}_2.00.png"), h, w))
        out = np.asarray(transfer_pair_jit(params, cnt, stl, 2.0, key,
                                           config))
        mae_out = np.abs(out.astype(int) - gold.astype(int)).mean()
        mae_src = np.abs(cnt.astype(int) - gold.astype(int)).mean()
        out_rows.append(mae_out / mae_src)
    tag = (f"iters={args.iters} cs={args.coarse_sweeps} "
           f"coarsest={args.coarsest} tol={over.get('cg_tol', config.cg_tol)} "
           f"wls={config.wls_cg_iters_mg}")
    print(f"{tag}: closures "
          + " ".join(f"p{i}={r:.3f}" for i, r in enumerate(out_rows))
          + f"  ({time.perf_counter() - t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
