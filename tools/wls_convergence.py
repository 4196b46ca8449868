#!/usr/bin/env python
"""Residual-vs-iterations evidence for the WLS solve at realistic sizes.

VERDICT round-3 #3: the WLS system is the most PARDISO-shaped one in the
pipeline (~665k unknowns x 6 RHS at MAX_SIZE; the reference factorizes it
exactly, SparseSolver_CPU.cpp:104-286) and the round-3 rebuild ran plain
Jacobi-PCG with a fixed 200-iteration budget and no convergence evidence
at scale.  This tool measures iterations-to-tolerance for the Jacobi and
multigrid preconditioners on the REAL operator at a chosen geometry:

  * gradient weights from the actual demo image's luminance (the operator
    IS the deployed one — image + lam decide the system),
  * lam from the pipeline's own schedule: wls_lambda_init * fullArea /
    downArea at level L (x4 at the finest level, ColorTransfer.cpp
    :1359-1361, :1418-1424),
  * start/rhs coefficients from the patch-stat init (stats.init_ab)
    against the style image resized onto the content grid — matcher-free
    but distribution-realistic (spiky a, active roughness gate).

Usage (CPU or TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/wls_convergence.py \
      --pair 0 --size 700 --level 0
  ... --size 1000 --level 4        # the MAX_SIZE finest-level system
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
    ap.add_argument("--pair", type=int, default=0)
    ap.add_argument("--size", type=int, default=700)
    ap.add_argument("--level", type=int, default=0,
                    help="pyramid level whose lam schedule to use (0..4)")
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops.color import bgr_u8_to_lab_u8
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.solve import stats
    from nct_tpu.solve.wls import solve_wls
    from nct_tpu.utils.compile_cache import enable
    from nct_tpu.utils.profiling import device_sync

    enable()
    config = Config()
    cnt = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/in{args.pair}.png"), args.size))
    stl = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/tar{args.pair}.png"), args.size))
    h, w = cnt.shape[:2]
    dims = vgg19.feature_dims(h, w)
    taps = config.vgg_layers()
    ah, aw = dims[taps[args.level]]

    cnt_d = jax.device_put(jnp.asarray(cnt))
    cnt_lab_u8 = bgr_u8_to_lab_u8(cnt_d)
    cnt_lab_unit = cnt_lab_u8.astype(jnp.float32) / 255.0
    # matcher-free guidance: style resized onto the content's level grid
    down_cnt = resize_bilinear(cnt_d, ah, aw)
    down_stl = resize_bilinear(jax.device_put(jnp.asarray(stl)), ah, aw)
    a_d, b_d = stats.init_ab(
        bgr_u8_to_lab_u8(down_cnt), bgr_u8_to_lab_u8(down_stl),
        config.patch_size, config.var_epsilon,
    )
    a_up = resize_bilinear(a_d, h, w)
    b_up = resize_bilinear(b_d, h, w)
    norm_factor = float(h * w) / float(ah * aw)
    lam = config.wls_lambda_init * norm_factor
    if (ah, aw) == (h, w):
        lam *= 4.0

    print(f"pair in{args.pair} {w}x{h} L{args.level} grid {aw}x{ah} "
          f"lam={lam:.3f} backend={jax.devices()[0].platform}")
    print("| preconditioner | tol | iters | final rel-res | wall s |")
    print("|---|---|---|---|---|")
    for pk, cap in [("jacobi", args.iters), ("mg", args.iters)]:
        # warm up the program once (tol is traced, so one compile serves
        # the whole tol sweep)
        a, b, it, r2 = solve_wls(
            a_up, b_up, cnt_lab_unit, lam, config.wls_alpha,
            iters=cap, tol=1e-2, return_iters=True, precond_kind=pk)
        device_sync(a)
        for tol in (1e-2, 1e-3, 1e-4):
            t0 = time.perf_counter()
            a, b, it, r2 = solve_wls(
                a_up, b_up, cnt_lab_unit, lam, config.wls_alpha,
                iters=cap, tol=tol, return_iters=True, precond_kind=pk)
            device_sync(a)
            dt = time.perf_counter() - t0
            print(f"| {pk} | {tol:g} | {int(it)} | "
                  f"{float(np.sqrt(r2)):.3e} (abs) | {dt:.2f} |",
                  flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
