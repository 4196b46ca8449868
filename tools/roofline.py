#!/usr/bin/env python
"""Per-stage roofline table: measured time vs analytic FLOPs/HBM bytes.

Joins the differencing-timer stage measurements (tools/profile_stages.py
methodology) with the analytic counts in nct_tpu/utils/flops.py into
fractions of the v5e's two ceilings (197 TFLOP/s bf16 MXU, 819 GB/s
HBM) — the VERDICT r04 #5 "fast vs the chip, not just vs the 2017
baseline" accounting.  The binding resource per stage names the next
optimization lever: a bandwidth-bound stage wants fewer/wider passes,
a compute-bound one wants a better algorithm (it is already at the
hardware's mercy).

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
  ... --size 452            # smaller geometry
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=680)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops import bds, features, nnf
    from nct_tpu.ops.pallas_nn import exact_nn_pallas_bidir
    from nct_tpu.ops.window_refine import window_refine
    from nct_tpu.solve import knn
    from nct_tpu.solve.nonlocal_solve import solve_nonlocal
    from nct_tpu.solve.wls import solve_wls
    from nct_tpu.utils import flops as fl
    from nct_tpu.utils.compile_cache import enable

    enable()
    cfg = Config()
    example = "/root/reference/demo/example/in"
    cnt = np.asarray(cap_max_size(imread_bgr(f"{example}/in0.png"),
                                  args.size))
    stl = np.asarray(cap_max_size(imread_bgr(f"{example}/tar0.png"),
                                  args.size))
    h, w = cnt.shape[:2]
    sh, sw = stl.shape[:2]
    dims_a = vgg19.feature_dims(h, w)
    dims_b = vgg19.feature_dims(sh, sw)
    chans = vgg19.tap_channels()
    taps = cfg.vgg_layers()

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(1 + args.reps):
            out = fn(*a)
        sync(out)
        t2 = time.perf_counter() - t0
        return max(t2 - t1, 1e-5) / args.reps

    rng = np.random.default_rng(0)
    rows = []

    def add(name, dt, f, b):
        rf = fl.roofline_fraction(f, b, dt)
        rows.append({
            "stage": name, "ms": round(dt * 1000, 1),
            "gflops": round(f / 1e9, 2), "gbytes": round(b / 1e9, 3),
            "compute_frac": round(rf["compute_frac"], 4),
            "bandwidth_frac": round(rf["bandwidth_frac"], 4),
            "bound": rf["bound"],
        })
        print(f"{name}: {dt*1000:.1f} ms | {f/1e9:.1f} GF {b/1e9:.2f} GB "
              f"| MXU {rf['compute_frac']*100:.1f}% "
              f"HBM {rf['bandwidth_frac']*100:.1f}% -> {rf['bound']}",
              flush=True)

    # VGG forward
    params = jax.device_put(vgg19.init_params())
    cnt_d = jnp.asarray(cnt)
    dt = timed(lambda x: vgg19.features_jit(params, x), cnt_d)
    add("vgg_5taps(content)", dt, fl.vgg_forward_flops(h, w), h * w * 3 * 4)

    for l, tap in enumerate(taps):
        (ah, aw), (bh, bw) = dims_a[tap], dims_b[tap]
        c = chans[tap]
        na, nb = ah * aw, bh * bw
        fa = jnp.asarray(rng.standard_normal((ah, aw, c)), jnp.bfloat16)
        fb = jnp.asarray(rng.standard_normal((bh, bw, c)), jnp.bfloat16)
        fa_n, _ = features.l2_normalize(fa)
        fb_n, _ = features.l2_normalize(fb)
        exact = l < cfg.exact_nn_levels
        if exact:
            dt = timed(lambda a, b: exact_nn_pallas_bidir(a, b, 3)[0],
                       fa_n, fb_n)
            name = f"L{l}_exact_nn_bidir"
        else:
            ann0 = nnf.init_scaled_identity(ah, aw, bh, bw)
            dt = 2 * timed(
                lambda a, b, n0: window_refine(
                    a, b, n0, cfg.window_radius, cfg.window_shortlist)[0],
                fa_n, fb_n, ann0)
            name = f"L{l}_window_refine(x2 dirs)"
        f, b = fl.match_counts(na, nb, c, exact, cfg)
        add(name, dt, f, b)

        if l == len(taps) - 1:
            # solver stages at the finest level + WLS at full res
            ann = nnf.init_scaled_identity(ah, aw, bh, bw)
            bnn = nnf.init_scaled_identity(bh, bw, ah, aw)
            dt = timed(lambda p, a, b2: bds.bds_vote(p, a, b2, 1.0, 2.0,
                                                     3)[0], fb, ann, bnn)
            f, b = fl.bds_counts(na, nb, c)
            add(f"L{l}_bds_vote", dt, f, b)

            lab = jnp.asarray(rng.uniform(0, 1, (ah, aw, 3)), jnp.float32)
            m = min(2048, na)
            cand = jnp.asarray(rng.integers(0, na, (10, m)), jnp.int32)
            plabels = jnp.asarray(rng.integers(0, 10, (ah, aw)), jnp.int32)
            ids, wts, slots = knn.knn_graph(lab, plabels, cand, k_num=8)
            dt = timed(lambda la, pl, cd: knn.knn_graph(la, pl, cd,
                                                        k_num=8),
                       lab, plabels, cand)
            f, b = fl.knn_counts(na, cfg)
            add(f"L{l}_knn_graph", dt, f, b)

            conf = jnp.asarray(rng.uniform(0.2, 1, (ah, aw)), jnp.float32)
            a0 = jnp.ones((ah, aw, 3), jnp.float32)
            b0 = jnp.zeros((ah, aw, 3), jnp.float32)
            glab = jnp.asarray(rng.uniform(0, 1, (ah, aw, 3)), jnp.float32)
            iters = cfg.cg_iters_final_mg
            dt = timed(lambda: solve_nonlocal(
                a0, b0, lab, glab, conf, ids, wts,
                float(h * w) / na, iters=iters, tol=cfg.cg_tol,
                candidates=cand, nbr_slots=slots,
                precond_kind=cfg.nl_precond))
            f, b = fl.nonlocal_counts(na, True, cfg)
            add(f"L{l}_nonlocal_mg{iters}", dt, f, b)

    cnt_lab = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    a_up = jnp.ones((h, w, 3), jnp.float32)
    b_up = jnp.zeros((h, w, 3), jnp.float32)
    dt = timed(lambda: solve_wls(
        a_up, b_up, cnt_lab, 0.024 * 16.0, iters=cfg.wls_cg_iters_mg,
        precond_kind=cfg.wls_precond))
    f, b = fl.wls_counts(h, w, cfg)
    add(f"wls_mg{cfg.wls_cg_iters_mg}_fullres", dt, f, b)

    print("\n| stage | ms | GF | GB | MXU % | HBM % | bound |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['ms']} | {r['gflops']} | "
              f"{r['gbytes']} | {r['compute_frac']*100:.1f} | "
              f"{r['bandwidth_frac']*100:.1f} | {r['bound']} |")
    if args.out:
        with open(args.out, "w") as fo:
            json.dump({"size": args.size, "rows": rows}, fo, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
