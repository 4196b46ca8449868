#!/usr/bin/env python
"""Per-stage vmap scaling on TPU: batched time / (batch * single time).

Diagnoses why batched serving (parallel/batch.py) is slower per pair than
the single-pair pipeline: each hot stage is timed vmapped at b=1 and b=B,
so a stage whose ratio is far above 1.0 is serializing (or losing a fast
path) under vmap.  Shapes mirror the 452 px demo pair used by
tools/bench_batch.py.

Usage: python tools/profile_batch_stages.py [batch]
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
from nct_tpu.ops import bds, features, nnf
from nct_tpu.ops.window_refine import window_refine
from nct_tpu.solve import knn
from nct_tpu.solve.nonlocal_solve import solve_nonlocal
from nct_tpu.solve.wls import solve_wls

# 452 px cap of in0/tar0: content 452x300, style 452x283
H, W = 300, 452
HS, WS = 283, 452
LEVELS = {  # lvl: (ah, aw, bh, bw, C)
    3: (150, 226, 142, 226, 128),
    4: (300, 452, 283, 452, 64),
}
REPS = 2


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    _sync(out)
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
    print(f"  {name}: {dt * 1000:.1f} ms")
    return dt


def main():
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    cfg = Config()

    for lvl, (ah, aw, bh, bw, c) in LEVELS.items():
        print(f"== level {lvl}: A {ah}x{aw}, B {bh}x{bw}, C={c} ==")
        results = {}
        for b in (1, batch):
            print(f" batch={b}")
            fa = jnp.asarray(
                rng.standard_normal((b, ah, aw, c)), jnp.bfloat16
            )
            fb = jnp.asarray(
                rng.standard_normal((b, bh, bw, c)), jnp.bfloat16
            )
            fa_n = jax.vmap(lambda x: features.l2_normalize(x)[0])(fa)
            fb_n = jax.vmap(lambda x: features.l2_normalize(x)[0])(fb)
            ann0 = jnp.broadcast_to(
                nnf.init_scaled_identity(ah, aw, bh, bw), (b, ah, aw, 2)
            )
            bnn0 = jnp.broadcast_to(
                nnf.init_scaled_identity(bh, bw, ah, aw), (b, bh, bw, 2)
            )

            r = {}
            if lvl <= 3:
                from nct_tpu.ops.pallas_nn import exact_nn_pallas

                f = jax.jit(jax.vmap(
                    lambda a, bb: exact_nn_pallas(a, bb, 3)[0]
                ))
                r["pallas_nn"] = timed("pallas_nn", f, fa_n, fb_n)
                ann = f(fa_n, fb_n)
            else:
                f = jax.jit(jax.vmap(
                    lambda a, bb, n0: window_refine(
                        a, bb, n0, cfg.window_radius, cfg.window_shortlist
                    )[0]
                ))
                r["window_refine"] = timed("window_refine", f, fa_n, fb_n,
                                           ann0)
                ann = f(fa_n, fb_n, ann0)

            f = jax.jit(jax.vmap(
                lambda p, a, bb: bds.bds_vote(p, a, bb, 1.0, 2.0, 3)[0]
            ))
            r["bds_vote"] = timed(
                "bds_vote", f, fb.astype(jnp.float32), ann, bnn0
            )

            lab = jnp.asarray(
                rng.uniform(0, 1, (b, ah, aw, 3)), jnp.float32
            )
            labels = jnp.asarray(
                rng.integers(0, 10, (b, ah, aw)), jnp.int32
            )
            m = min(2048, ah * aw)
            cand = jnp.asarray(
                rng.integers(0, ah * aw, (b, 10, m)), jnp.int32
            )
            f = jax.jit(jax.vmap(
                lambda l, pl, cd: knn.knn_graph(l, pl, cd, k_num=8)
            ))
            r["knn_graph"] = timed("knn_graph", f, lab, labels, cand)
            ids, wts, slots = f(lab, labels, cand)

            conf = jnp.asarray(
                rng.uniform(0.2, 1, (b, ah, aw)), jnp.float32
            )
            a0 = jnp.ones((b, ah, aw, 3), jnp.float32)
            b0 = jnp.zeros((b, ah, aw, 3), jnp.float32)
            glab = jnp.asarray(
                rng.uniform(0, 1, (b, ah, aw, 3)), jnp.float32
            )
            nf = float(H * W) / (ah * aw)
            iters = cfg.cg_iters_final_mg if lvl == 4 else cfg.cg_iters_mg
            f = jax.jit(jax.vmap(
                lambda a_, b_, l_, g_, c_, i_, w_, cd_, s_: solve_nonlocal(
                    a_, b_, l_, g_, c_, i_, w_, nf,
                    iters=iters, tol=cfg.cg_tol, candidates=cd_,
                    nbr_slots=s_, precond_kind=cfg.nl_precond,
                    dynamic=False,
                )
            ))
            r["nonlocal"] = timed(
                "nonlocal", f, a0, b0, lab, glab, conf, ids, wts, cand,
                slots,
            )

            if lvl == 4:
                cnt_lab = jnp.asarray(
                    rng.uniform(0, 1, (b, H, W, 3)), jnp.float32
                )
                au = jnp.ones((b, H, W, 3), jnp.float32)
                bu = jnp.zeros((b, H, W, 3), jnp.float32)
                wls_iters = (cfg.wls_cg_iters_mg
                             if cfg.wls_precond == "mg"
                             else cfg.wls_cg_iters)
                f = jax.jit(jax.vmap(
                    lambda a_, b_, l_: solve_wls(
                        a_, b_, l_, 0.024 * 16.0,
                        iters=wls_iters, dynamic=False,
                        precond_kind=cfg.wls_precond,
                    )
                ))
                r["wls"] = timed("wls", f, au, bu, cnt_lab)
            results[b] = r
        print(" per-item scaling (b{0}/b1/{0}; 1.0 = perfect):".format(batch))
        for k in results[1]:
            s = results[batch][k] / (batch * results[1][k])
            print(f"  {k}: {s:.2f}")


if __name__ == "__main__":
    main()
