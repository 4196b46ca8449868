#!/usr/bin/env python
"""Quality/speed comparison of fine-level matching strategies on a real
demo pair: window refinement vs reference-shaped PatchMatch.

Prints per-strategy wall time and the SSIM between the two outputs — the
acceptance evidence for making "window" the default.
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

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu.pipeline import transfer_pair_jit
from nct_tpu.utils.ssim import ssim

DEMO = "/root/reference/demo/example/in"


def run(params, cnt, stl, config, key):
    out = transfer_pair_jit(params, cnt, stl, 2.0, key, config)
    float(jnp.sum(out.astype(jnp.float32)))  # hard sync
    return out


CONFIGS = {
    "default": Config(),
    "patchmatch": dataclasses.replace(Config(), fine_strategy="patchmatch"),
    # round-1 default: block-Jacobi PCG at the halved reference budgets
    "bj": dataclasses.replace(Config(), nl_precond="block_jacobi"),
    # reference-faithful multi-cluster kNN merge (2 memberships)
    "knn2": dataclasses.replace(Config(), knn_memberships=2),
    # window-refine rescore-count ablation (patch-approx shortlist)
    "w2": dataclasses.replace(Config(), window_shortlist=2),
    "w4": dataclasses.replace(Config(), window_shortlist=4),
    "w8": dataclasses.replace(Config(), window_shortlist=8),
    # window refinement replacing the exact-NN search at conv2_1 too
    "xnn3": dataclasses.replace(Config(), exact_nn_levels=3),
    # nonlocal in-edge cap ablation
    "cap32": dataclasses.replace(Config(), nl_in_cap=32),
    # default matcher, reference solver budgets — isolates CG effects
    "cgfull": dataclasses.replace(
        Config(), nl_precond="block_jacobi", cg_iters=100,
        cg_iters_final=50, wls_cg_iters=400, cg_tol=1e-6,
    ),
    # full reference-shaped search + solver budgets (PatchMatch everywhere,
    # 10 iters, unhalved CG budgets, tight tolerance)
    "parity": Config.reference_parity(),
}


def main():
    size = int(_sys.argv[1]) if len(_sys.argv) > 1 else 700
    names = _sys.argv[2:] or ["default", "patchmatch"]
    cnt = cap_max_size(imread_bgr(f"{DEMO}/in0.png"), size)
    stl = cap_max_size(imread_bgr(f"{DEMO}/tar0.png"), size)
    params = jax.device_put(vgg19.init_params())
    key = jax.random.PRNGKey(7)

    outs = {}
    for name in names:
        config = CONFIGS[name]
        out = run(params, cnt, stl, config, key)   # compile + warm
        t0 = time.perf_counter()
        out = run(params, cnt, stl, config, key)
        dt = time.perf_counter() - t0
        outs[name] = np.asarray(out)
        print(f"{name}: {dt:.2f} s")

    base = names[0]
    for other in names[1:]:
        s = ssim(outs[base], outs[other])
        print(f"SSIM({base}, {other}) = {s:.4f}")


if __name__ == "__main__":
    main()
