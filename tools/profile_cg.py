#!/usr/bin/env python
"""Per-level CG convergence profile over the demo pairs.

Prints, for every pair and pyramid level, the nonlocal mg-PCG and WLS PCG
iteration counts actually run (the while_loop trip counts) and the final
relative residuals — the diagnostic behind the per-level iteration budgets
(config.cg_iters_mg; see VERDICT round-3 #1: the in1/tar1 coarse systems
need ~30 block-Jacobi-equivalent iterations while well-conditioned pairs
exit at ~10, and the budget must not be paid globally).

Reference anchor: ColorTransfer.cpp:916-921 fixes 100/50 unpreconditioned
CG iterations for every pair; this tool exists because we replace that
blanket budget with convergence-based early exit.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cg.py \
      [--size 680] [--pairs 0,1,2,3,4] [--staged] [--tol 1e-4]
  JAX_PLATFORMS=cpu python tools/profile_cg.py --size 160   # CPU diagnosis
"""

import argparse
import dataclasses
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
    ap.add_argument("--size", type=int, default=680)
    ap.add_argument("--pairs", default="0,1,2,3,4")
    ap.add_argument("--staged", action="store_true")
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--iters", type=int, default=None,
                    help="override cg_iters_mg (coarse-level cap)")
    ap.add_argument("--weights", default=_os.environ.get("NCT_VGG_WEIGHTS"))
    args = ap.parse_args(argv)

    import jax

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.pipeline import transfer_pair
    from nct_tpu.utils.compile_cache import enable

    enable()
    params = jax.device_put(
        vgg19.load_params(args.weights) if args.weights
        else vgg19.init_params())
    key = jax.random.PRNGKey(7)
    config = Config()
    over = {}
    if args.tol is not None:
        over["cg_tol"] = args.tol
    if args.iters is not None:
        over["cg_iters_mg"] = args.iters
    if over:
        config = dataclasses.replace(config, **over)

    print(f"backend={jax.devices()[0].platform} size={args.size} "
          f"tol={config.cg_tol} caps mg={config.cg_iters_mg}/"
          f"{config.cg_iters_final_mg} wls={config.wls_cg_iters}")
    print("| pair | level (geometry) | nl iters | nl rel-res | "
          "wls iters | wls rel-res |")
    print("|---|---|---|---|---|---|")
    for i in (int(p) for p in args.pairs.split(",")):
        cnt = jax.device_put(np.asarray(cap_max_size(
            imread_bgr(f"{EXAMPLE}/in/in{i}.png"), args.size)))
        stl = jax.device_put(np.asarray(cap_max_size(
            imread_bgr(f"{EXAMPLE}/in/tar{i}.png"), args.size)))
        t0 = time.perf_counter()
        out, trace = transfer_pair(
            params, cnt, stl, 2.0, config, key=key,
            return_intermediates="stats", staged=args.staged,
        )
        np.asarray(out)
        dt = time.perf_counter() - t0
        for tr in trace:
            lvl = tr["level"]
            # residuals come back as ||r||^2; report sqrt relative to the
            # tol target so 1.0 == exactly at the exit threshold
            print(f"| in{i} | L{lvl} | {int(tr['nl_iters'])} | "
                  f"{float(np.sqrt(tr['nl_r2'])):.3e} | "
                  f"{int(tr['wls_iters'])} | "
                  f"{float(np.sqrt(tr['wls_r2'])):.3e} |", flush=True)
        print(f"[profile_cg] pair {i} done {dt:.1f}s (incl. compile on "
              "first geometry)", flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
