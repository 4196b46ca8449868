#!/usr/bin/env python
"""Re-derive the solver iteration caps from residual targets.

The defaults (cg_iters_mg=10, cg_iters_final_mg=6, wls_cg_iters_mg=8)
were tuned against the random backbone's closure proxy (round 4).  This
tool re-derives them from measured residual reduction on REAL systems —
run it whenever the backbone changes (NCT_VGG_WEIGHTS arriving is the
event it exists for; see README "When pretrained weights appear"):

  1. capture the nonlocal systems of a headline pair
     (tools/capture_nl.py — pass --capture to do it inline), and
  2. sweep candidate caps on each captured nonlocal system and on the
     matcher-free WLS systems of the same pair, against a converged
     (200-iteration) reference solve,
  3. report the smallest cap meeting the residual-reduction target per
     system and the max over systems as the recommended config value.

Reference contract this replaces: PARDISO solves the WLS system exactly
(SparseSolver_CPU.cpp:104-286); the nonlocal CG runs to an absolute
residual (ColorTransfer.cpp:913-921).  Ours is "bounded measured
distance from converged" — the fence in tests/test_retune.py pins the
shipped defaults against committed captured systems.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/retune_caps.py \
      --nl-dir /tmp/nl_in1_680 --pair 1 --size 680 --out /tmp/caps.json
  ... --capture           # run tools/capture_nl.py inline first
  ... --target 1e-3       # tighter residual-reduction target
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
DEFAULT_CAPS = (4, 6, 8, 10, 12, 16, 24, 32, 48)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nl-dir", default=None,
                    help="directory of captured nl_L*.npz systems")
    ap.add_argument("--capture", action="store_true",
                    help="run tools/capture_nl.py into --nl-dir first")
    ap.add_argument("--pair", type=int, default=1)
    ap.add_argument("--size", type=int, default=680)
    ap.add_argument("--target", type=float, default=1e-2,
                    help="residual-reduction target r2(cap)/r2(init)")
    ap.add_argument("--caps", type=int, nargs="*", default=None)
    ap.add_argument("--wls-levels", type=int, nargs="*", default=[0, 4])
    ap.add_argument("--out", default=None, help="write the JSON here")
    args = ap.parse_args(argv)

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.solve import retune
    from nct_tpu.utils.compile_cache import enable

    enable()
    caps = tuple(args.caps) if args.caps else DEFAULT_CAPS
    config = Config()
    report = {"pair": args.pair, "size": args.size,
              "target": args.target, "nl": {}, "wls": {},
              "recommended": {}}

    if args.capture:
        if not args.nl_dir:
            args.nl_dir = f"/tmp/retune_nl_in{args.pair}_{args.size}"
        import capture_nl

        capture_nl.main(["--pair", str(args.pair), "--size",
                         str(args.size), "--out", args.nl_dir])

    def show(name, curve):
        conv = curve["converged"]
        print(f"\n{name}: r2 init {conv['r2_init']:.3e} -> converged "
              f"{conv['r2']:.3e} @ {conv['iters']} iters")
        print("| cap | r2 | reduction | sol err (max-norm rel) |")
        print("|---|---|---|---|")
        for cap in sorted(curve["caps"]):
            c = curve["caps"][cap]
            print(f"| {cap} | {c['r2']:.3e} | {c['reduction']:.3e} | "
                  f"{c['sol_err']:.3f} |", flush=True)

    # nonlocal systems
    nl_recs = {}
    if args.nl_dir and _os.path.isdir(args.nl_dir):
        for fname in sorted(_os.listdir(args.nl_dir)):
            if not fname.startswith("nl_L"):
                continue
            level = int(fname[4])
            system = retune.load_nl_system(_os.path.join(args.nl_dir, fname))
            curve = retune.residual_curve(
                lambda cap: retune.nl_solve_at_cap(system, cap, config),
                caps)
            rec = retune.recommend_cap(curve, args.target)
            nl_recs[level] = rec
            report["nl"][level] = {"curve": curve, "recommended": rec}
            show(f"nonlocal L{level} {system['src_lab'].shape[:2]}", curve)
            print(f"recommended cap @ target {args.target:g}: {rec}")
    else:
        print("no --nl-dir given (or missing): skipping nonlocal sweep; "
              "pass --capture to generate one", flush=True)

    # WLS systems (matcher-free, the real operator)
    cnt = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/in{args.pair}.png"), args.size))
    stl = np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/tar{args.pair}.png"), args.size))
    wls_recs = {}
    for level in args.wls_levels:
        system = retune.wls_system_from_image(cnt, stl, level, config)
        curve = retune.residual_curve(
            lambda cap: retune.wls_solve_at_cap(system, cap, config), caps)
        rec = retune.recommend_cap(curve, args.target)
        wls_recs[level] = rec
        report["wls"][level] = {"curve": curve, "recommended": rec}
        show(f"WLS L{level} lam={system[3]:.3f}", curve)
        print(f"recommended cap @ target {args.target:g}: {rec}")

    numl = config.num_levels
    coarse_nl = [r for lv, r in nl_recs.items() if lv < numl - 1 and r]
    fine_nl = [r for lv, r in nl_recs.items() if lv == numl - 1 and r]
    report["recommended"] = {
        "cg_iters_mg": max(coarse_nl) if coarse_nl else None,
        "cg_iters_final_mg": max(fine_nl) if fine_nl else None,
        "wls_cg_iters_mg": (max(r for r in wls_recs.values() if r)
                            if any(wls_recs.values()) else None),
    }
    print(f"\nrecommended config overrides @ target {args.target:g}: "
          f"{report['recommended']}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
