#!/usr/bin/env python
"""Per-level closure diagnosis of one demo pair (VERDICT r04 #4).

QUALITY_r04 found in3/tar3 at 452x300 is the ONE pair whose output ends
FARTHER from its golden than the untouched source (golden-MAE ratio
1.173), while the same pair at 120x160 closes to 0.432.  This tool turns
the hypothesis hunt into data: it runs the pipeline with full
intermediates (the reference's ENABLE_VIS analogue) and reports, per
level,

  * closure trajectory: MAE(refined_l, golden) / MAE(source, golden) —
    which level pushes the output AWAY from the golden;
  * guidance quality: MAE(guide_l, golden at the level grid) — whether
    the BDS-voted guidance itself is the problem (correspondence side)
    or the solver diverges from good guidance (solve side);
  * mean BDS matching error (the correspondence confidence the solve
    actually saw) and the solver convergence scalars.

Run it for the default config and `reference_parity` (full PatchMatch
at every level, ColorTransfer-shaped budgets) to separate
search-strategy effects from backbone effects.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/diagnose_pair.py \
      --pair 3 --size 452 --config default --out /tmp/diag_in3.json
  ... --config parity
  ... --dump-pngs /tmp/diag_in3   # per-level guide/refined images
"""

import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import numpy as np

EXAMPLE = "/root/reference/demo/example"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pair", type=int, default=3)
    ap.add_argument("--size", type=int, default=452)
    ap.add_argument("--config", default="default",
                    choices=("default", "parity", "knn2", "pm_fine"))
    ap.add_argument("--bds", type=float, default=2.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dump-pngs", default=None)
    ap.add_argument("--staged", action="store_true", default=None)
    args = ap.parse_args(argv)

    import jax

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr, imwrite_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.pipeline import transfer_pair
    from nct_tpu.utils.compile_cache import enable

    enable()
    if args.config == "default":
        config = Config()
    elif args.config == "parity":
        config = Config.reference_parity()
    elif args.config == "knn2":
        config = Config(knn_memberships=2)
    else:
        config = Config(fine_strategy="patchmatch")

    p = args.pair
    cnt = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/in{p}.png"), args.size))
    stl = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/tar{p}.png"), args.size))
    gold_full = imread_bgr(f"{EXAMPLE}/res/in{p}_tar{p}_{args.bds:.2f}.png")
    gold = np.asarray(resize_bilinear(
        gold_full, cnt.shape[0], cnt.shape[1])).astype(np.float64)

    params = jax.device_put(vgg19.init_params())
    out, trace = transfer_pair(
        params, jax.device_put(cnt), jax.device_put(stl), args.bds,
        config, key=jax.random.PRNGKey(7), return_intermediates=True,
        staged=bool(args.staged),
    )
    out = np.asarray(out)

    mae_src = np.abs(cnt.astype(np.float64) - gold).mean()
    report = {
        "pair": p, "size": args.size, "config": args.config,
        "geometry": f"{cnt.shape[1]}x{cnt.shape[0]}",
        "mae_src_vs_golden": round(float(mae_src), 3),
        "final_ratio": round(
            float(np.abs(out.astype(np.float64) - gold).mean() / mae_src),
            4),
        "levels": [],
    }
    print(f"pair in{p} {report['geometry']} config={args.config} "
          f"src-vs-golden MAE {mae_src:.2f}")
    print("| L | grid | refined ratio | guide ratio | mean bds_err | "
          "nl (it, r2) | wls (it, r2) |")
    print("|---|---|---|---|---|---|---|")
    for tr in trace:
        lvl = int(tr["level"])
        refined = np.asarray(tr["refined"]).astype(np.float64)
        guide = np.asarray(tr["guide"]).astype(np.float64)
        gh, gw = guide.shape[:2]
        gold_lvl = np.asarray(resize_bilinear(gold_full, gh, gw)
                              ).astype(np.float64)
        cnt_lvl = np.asarray(resize_bilinear(
            jax.numpy.asarray(cnt), gh, gw)).astype(np.float64)
        mae_src_lvl = np.abs(cnt_lvl - gold_lvl).mean()
        row = {
            "level": lvl, "grid": f"{gw}x{gh}",
            "refined_ratio": round(
                float(np.abs(refined - gold).mean() / mae_src), 4),
            "guide_ratio": round(
                float(np.abs(guide - gold_lvl).mean()
                      / max(mae_src_lvl, 1e-9)), 4),
            "mean_bds_err": round(
                float(np.asarray(tr["bds_err"]).mean()), 4),
            "nl": [int(tr["nl_iters"]), float(tr["nl_r2"])],
            "wls": [int(tr["wls_iters"]), float(tr["wls_r2"])],
        }
        report["levels"].append(row)
        print(f"| {lvl} | {row['grid']} | {row['refined_ratio']} | "
              f"{row['guide_ratio']} | {row['mean_bds_err']} | "
              f"{row['nl'][0]}, {row['nl'][1]:.2e} | "
              f"{row['wls'][0]}, {row['wls'][1]:.2e} |", flush=True)
        if args.dump_pngs:
            _os.makedirs(args.dump_pngs, exist_ok=True)
            imwrite_bgr(f"{args.dump_pngs}/L{lvl}_guide.png",
                        np.asarray(tr["guide"]).astype(np.uint8))
            imwrite_bgr(f"{args.dump_pngs}/L{lvl}_refined.png",
                        np.asarray(tr["refined"]).astype(np.uint8))

    print(f"final ratio {report['final_ratio']} "
          f"(<1 = closer to the golden than the source)")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
