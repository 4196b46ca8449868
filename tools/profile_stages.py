#!/usr/bin/env python
"""Per-stage TPU timing at real pipeline shapes (680x452 / 960x600 pair).

Times the suspected hot stages in isolation to direct optimization:
PatchMatch, BDS vote, kNN graph, nonlocal CG, WLS CG, VGG forward.
Run on the TPU (no JAX_PLATFORMS override).  Each stage compiles once and
is then timed over `reps` executions.
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

from nct_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.ops import bds, features, nnf, patchmatch
from nct_tpu.solve import knn
from nct_tpu.solve.nonlocal_solve import solve_nonlocal
from nct_tpu.solve.wls import solve_wls

H, W = 452, 680
HS, WS = 600, 960
LEVELS = {   # (ah, aw, bh, bw, C, rs)
    2: (113, 170, 150, 240, 256, 15),
    3: (226, 340, 300, 480, 128, 32),
    4: (452, 680, 600, 960, 64, 32),
}
REPS = 3


def _sync(x):
    """Force completion: block_until_ready is a NO-OP on the axon relay
    backend, so a scalar D2H readout is the only real barrier."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(name, fn, *args):
    """Differencing timer: run 1 rep and 1+REPS reps, report the slope —
    cancels both the enqueue overhead and the ~0.5 s relay readout."""
    out = fn(*args)
    _sync(out)                                # compile + drain
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + REPS):
        out = fn(*args)
    _sync(out)
    t2 = time.perf_counter() - t0
    dt = max(t2 - t1, 0.0) / REPS
    print(f"{name}: {dt*1000:.1f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    cfg = Config()

    print("== VGG forward (full res content) ==")
    params = jax.device_put(vgg19.init_params())
    cnt = jnp.asarray(rng.integers(0, 256, (H, W, 3)), jnp.uint8)
    timed("vgg_5taps", lambda x: vgg19.features_jit(params, x), cnt)

    from nct_tpu.ops import exact_nn as exact_mod

    for lvl, (ah, aw, bh, bw, c, rs) in LEVELS.items():
        print(f"== level {lvl}: A {ah}x{aw}, B {bh}x{bw}, C={c} ==")
        fa = jnp.asarray(rng.standard_normal((ah, aw, c)), jnp.bfloat16)
        fb = jnp.asarray(rng.standard_normal((bh, bw, c)), jnp.bfloat16)
        fa_n, _ = features.l2_normalize(fa)
        fb_n, _ = features.l2_normalize(fb)
        ann0 = nnf.init_scaled_identity(ah, aw, bh, bw)
        bnn0 = nnf.init_scaled_identity(bh, bw, ah, aw)

        if lvl <= 3:
            timed(
                f"exact_nn_L{lvl}",
                lambda a, b: exact_mod.exact_nn(a, b, 3)[0],
                fa_n, fb_n,
            )
            from nct_tpu.ops.pallas_nn import (
                exact_nn_pallas, exact_nn_pallas_bidir,
            )
            ann = timed(
                f"pallas_nn_L{lvl}",
                lambda a, b: exact_nn_pallas(a, b, 3)[0],
                fa_n, fb_n,
            )
            timed(
                f"pallas_nn_bidir_L{lvl} (both directions)",
                lambda a, b: exact_nn_pallas_bidir(a, b, 3)[0],
                fa_n, fb_n,
            )
            if lvl == 3:
                from nct_tpu.ops.window_refine import window_refine
                timed(
                    f"window_refine_L{lvl}",
                    lambda a, b, n0: window_refine(
                        a, b, n0, cfg.window_radius, cfg.window_shortlist
                    )[0],
                    fa_n, fb_n, ann0,
                )
        else:
            from nct_tpu.ops.window_refine import window_refine
            ann = timed(
                f"window_refine_L{lvl}",
                lambda a, b, n0: window_refine(
                    a, b, n0, cfg.window_radius, cfg.window_shortlist
                )[0],
                fa_n, fb_n, ann0,
            )
            pm_iters = cfg.pm_iters_fine
            timed(
                f"patchmatch{pm_iters}_ab_L{lvl}",
                lambda a, b, n0: patchmatch.patchmatch(
                    a, b, n0, key, iters=pm_iters, rs_max=rs, patch_size=3
                )[0],
                fa_n, fb_n, ann0,
            )

        timed(
            f"bds_vote_L{lvl}",
            lambda p, a, b: bds.bds_vote(p, a, b, 1.0, 2.0, 3)[0],
            fb, ann, bnn0,
        )

        lab = jnp.asarray(rng.uniform(0, 1, (ah, aw, 3)), jnp.float32)
        labels = jnp.zeros((ah, aw), jnp.int32)
        m = min(2048, ah * aw)
        cand = jnp.asarray(
            rng.integers(0, ah * aw, (10, m)), jnp.int32
        )
        plabels = jnp.asarray(rng.integers(0, 10, (ah, aw)), jnp.int32)
        ids, wts, slots = timed(
            f"knn_graph_L{lvl}",
            lambda l, pl, cd: knn.knn_graph(l, pl, cd, k_num=8),
            lab, plabels, cand,
        )

        conf = jnp.asarray(rng.uniform(0.2, 1, (ah, aw)), jnp.float32)
        # warm-ish start akin to the pipeline's cross-level upsample: the
        # true solution of a smooth system is near a constant-ish field
        a0 = jnp.ones((ah, aw, 3), jnp.float32)
        b0 = jnp.zeros((ah, aw, 3), jnp.float32)
        glab = jnp.asarray(rng.uniform(0, 1, (ah, aw, 3)), jnp.float32)
        nf = float(H * W) / (ah * aw)
        if cfg.nl_precond == "mg":
            iters = cfg.cg_iters_final_mg if lvl == 4 else cfg.cg_iters_mg
        else:
            iters = cfg.cg_iters_final if lvl == 4 else cfg.cg_iters
        timed(
            f"nonlocal_{cfg.nl_precond}{iters}_tol{cfg.cg_tol:g}_L{lvl}",
            lambda: solve_nonlocal(
                a0, b0, lab, glab, conf, ids, wts, nf,
                iters=iters, tol=cfg.cg_tol,
                candidates=cand, nbr_slots=slots,
                precond_kind=cfg.nl_precond,
            ),
        )

    print("== WLS at full res ==")
    cnt_lab = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    a_up = jnp.ones((H, W, 3), jnp.float32)
    b_up = jnp.zeros((H, W, 3), jnp.float32)
    timed(
        f"wls_cg{cfg.wls_cg_iters}_fullres",
        lambda: solve_wls(a_up, b_up, cnt_lab, 0.024 * 16.0,
                          iters=cfg.wls_cg_iters),
    )


if __name__ == "__main__":
    main()
