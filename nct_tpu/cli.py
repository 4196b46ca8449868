"""Command-line driver.

Mirrors the reference CLI (reference: source/main.cu:29-44 ``get_input``,
:456-543 ``transfer_single``): flags ``-m -i -o -bds -eps -nl -l -w`` plus
the ``pairs.txt`` protocol (each line ``cntPath stlPath bdsWeight``; the
per-pair weight overrides ``-bds``).  Outputs are written to
``<out>/<cntStem>_<stlStem>_<bds%2.2f>.png`` at the content resolution.

TPU-specific additions: ``--weights`` points at a converted VGG-19 npz
(tools/convert_vgg19.py); ``--dtype`` selects the feature compute dtype.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from nct_tpu import io
from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.pipeline import transfer_pair, transfer_pair_jit


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nct-tpu",
        description="Progressive colour transfer with dense semantic "
        "correspondences (TPU-native).",
    )
    p.add_argument("-m", "--model", default=None,
                   help="VGG-19 weights npz (converted caffemodel); "
                   "omit for the seeded random backbone.")
    p.add_argument("-i", "--input", required=True,
                   help="Input directory containing images and pairs.txt.")
    p.add_argument("-o", "--output", required=True,
                   help="Output directory for result images.")
    p.add_argument("-bds", type=float, default=2.0,
                   help="Reverse (completeness) BDS vote weight "
                   "(default 2.0; per-pair value in pairs.txt wins).")
    p.add_argument("-eps", type=float, default=0.6,
                   help="Variance epsilon in the 0-255 domain (default 0.6).")
    p.add_argument("-nl", type=float, default=2.0,
                   help="Nonlocal constraint weight (default 2.0).")
    p.add_argument("-l", type=float, default=0.125,
                   help="Local smoothness weight (default 0.125).")
    p.add_argument("-w", type=float, default=0.024,
                   help="Initial WLS lambda (default 0.024).")
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default=None,
                   help="Feature compute dtype (default: Config's "
                        f"{Config.feature_dtype} — the benched configuration).")
    p.add_argument("--seed", type=int, default=7, help="PRNG seed.")
    p.add_argument("--size", type=int, default=None,
                   help="Override MAX_SIZE (longer-side cap, default 1000).")
    p.add_argument("--pairs-limit", type=int, default=None,
                   help="Process only the first N pairs.txt lines.")
    p.add_argument("--staged", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="Compile each pyramid level as its own program "
                        "instead of one fused program (MAX_SIZE-class "
                        "geometries exceed the XLA service's memory when "
                        "fused; staged also cuts first-compile latency). "
                        "Default: auto — staged above the fused envelope "
                        "(~320k content pixels), fused below.")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="Persistent XLA compilation cache dir (default "
                   "$NCT_COMPILE_CACHE or ~/.cache/nct_tpu/xla; 'none' "
                   "disables).")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    os.makedirs(args.output, exist_ok=True)

    from nct_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache(args.compile_cache)

    config = Config(
        var_epsilon=args.eps,
        nonlocal_weight=args.nl, local_weight=args.l,
        wls_lambda_init=args.w,
        feature_dtype=args.dtype or Config.feature_dtype,
        max_size=args.size if args.size else Config.max_size,
    )

    if args.model:
        params = vgg19.load_params(args.model)
    else:
        print("warning: no --model given; using seeded random VGG-19 "
              "filters (correspondence quality is reduced)")
        params = vgg19.init_params()
    params = jax.device_put(params)  # upload weights once, not per pair

    # -bds is the fallback weight for 2-field pairs.txt lines; a per-pair
    # third field wins (ref main.cu:471-475).
    pairs = io.read_pairs(os.path.join(args.input, "pairs.txt"),
                          default_bds=args.bds)
    if args.pairs_limit is not None:
        pairs = pairs[: args.pairs_limit]

    # Native C++ prefetch loader (decode+resize off the driver thread);
    # falls back to PIL inside PairLoader when the .so is unavailable.
    from nct_tpu.data import PairLoader

    loader = PairLoader(
        [
            (os.path.join(args.input, p.content),
             os.path.join(args.input, p.style))
            for p in pairs
        ],
        max_size=config.max_size,
    )
    for pair, item in zip(pairs, loader):
        if item is None:  # ref continues past unreadable images (:484-497)
            print(f"error: failed reading pair {pair.content}/{pair.style}; "
                  "skipping")
            continue
        cnt, stl = item
        print(f"content: {pair.content} {cnt.shape[1]}x{cnt.shape[0]}, "
              f"style: {pair.style} {stl.shape[1]}x{stl.shape[0]}, "
              f"bds: {pair.bds_weight}")

        # Auto mode: fused below the known-safe envelope, staged above it
        # (the fused 700 px program kernel-faults the relayed worker).
        from nct_tpu.pipeline import FUSED_ENVELOPE_PIXELS

        staged = args.staged
        if staged is None:
            staged = cnt.shape[0] * cnt.shape[1] > FUSED_ENVELOPE_PIXELS
            if staged:
                print(f"auto-staged: content {cnt.shape[1]}x{cnt.shape[0]} "
                      f"exceeds the fused envelope "
                      f"({FUSED_ENVELOPE_PIXELS} px)")

        # The per-pair BDS weight rides in as a traced scalar so pairs that
        # differ only in weight (the BDS sweep) share one compiled program.
        start = time.perf_counter()
        if staged:
            result = transfer_pair(
                params, cnt, stl, pair.bds_weight, config,
                key=jax.random.PRNGKey(args.seed), staged=True,
            )
            result = np.asarray(jax.block_until_ready(result))
        else:
            try:
                result = transfer_pair_jit(
                    params, cnt, stl, pair.bds_weight,
                    jax.random.PRNGKey(args.seed), config,
                )
                result = np.asarray(jax.block_until_ready(result))
            except Exception as e:  # noqa: BLE001
                # Runtime fault fallback (VERDICT round-3 #5): the fused
                # envelope constant is relay-measured, not a hardware
                # contract — if the fused program faults at run time on
                # some future geometry (the >=465x700 failure mode,
                # PERFORMANCE.md round-3 bisection), re-run the pair in
                # staged mode, whose smaller per-stage programs are the
                # supported MAX_SIZE path.  Compile-time errors surface
                # the same way, so the fallback also covers a
                # compile-service OOM kill.
                print(f"warning: fused run failed ({type(e).__name__}: "
                      f"{e}); retrying staged")
                result = transfer_pair(
                    params, cnt, stl, pair.bds_weight, config,
                    key=jax.random.PRNGKey(args.seed), staged=True,
                )
                result = np.asarray(jax.block_until_ready(result))
        elapsed = time.perf_counter() - start
        print(f"**Finished Time: {elapsed:.3f} sec.")

        out_path = os.path.join(
            args.output,
            io.output_name(pair.content, pair.style, pair.bds_weight),
        )
        io.imwrite_bgr(out_path, result)
        print(f"final output file: {out_path}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
