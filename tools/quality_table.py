#!/usr/bin/env python
"""Quality table over ALL 5 demo pairs (round-2 VERDICT #6).

For each pairs.txt line's base pair (in0..in4; reference goldens at
demo/example/res/) at --size px on the current backend:

  * golden-MAE closure: MAE(out, golden) / MAE(source, golden) — the
    fraction of the source->golden distance NOT closed (lower is better;
    <1 means the pipeline moved toward the reference result even on the
    random backbone);
  * BDS movement: MAE(out at bds=8, out at bds=0) — the completeness
    knob must act (the reference publishes the in4 sweep as goldens);
  * default-vs-parity SSIM: the TPU-optimized search/solver stack against
    the reference-shaped parity config (Config.reference_parity) on the
    same backbone — how much the speed knobs change the output.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_table.py \
      [--size 512] [--pairs 0,1,2,3,4] [--skip-parity]
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--pairs", default="0,1,2,3,4")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--shared", action="store_true",
                    help="resize every pair to ONE shared geometry "
                    "(4:3 at --size) so the whole table runs through a "
                    "single compiled program — the affordable mode under "
                    "remote compilation (minutes per geometry otherwise)")
    ap.add_argument("--weights", default=_os.environ.get("NCT_VGG_WEIGHTS"))
    args = ap.parse_args(argv)

    import jax

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.pipeline import transfer_pair_jit
    from nct_tpu.utils.compile_cache import enable
    from nct_tpu.utils.ssim import ssim

    enable()
    params = jax.device_put(
        vgg19.load_params(args.weights) if args.weights
        else vgg19.init_params())
    key = jax.random.PRNGKey(7)
    config = Config()
    parity = Config.reference_parity()

    if args.shared:
        sh, sw = (args.size * 2) // 3, args.size
        sh -= sh % 4

    rows = []
    for i in (int(p) for p in args.pairs.split(",")):
        if args.shared:
            cnt = np.asarray(resize_bilinear(
                imread_bgr(f"{EXAMPLE}/in/in{i}.png"), sh, sw)
            ).astype(np.uint8)
            stl = np.asarray(resize_bilinear(
                imread_bgr(f"{EXAMPLE}/in/tar{i}.png"), sh, sw)
            ).astype(np.uint8)
        else:
            cnt = np.asarray(cap_max_size(
                imread_bgr(f"{EXAMPLE}/in/in{i}.png"), args.size))
            stl = np.asarray(cap_max_size(
                imread_bgr(f"{EXAMPLE}/in/tar{i}.png"), args.size))
        gold = np.asarray(resize_bilinear(
            imread_bgr(f"{EXAMPLE}/res/in{i}_tar{i}_2.00.png"),
            cnt.shape[0], cnt.shape[1]))
        cnt_d, stl_d = jax.device_put(cnt), jax.device_put(stl)

        t0 = time.perf_counter()
        out = np.asarray(
            transfer_pair_jit(params, cnt_d, stl_d, 2.0, key, config))
        t_pair = time.perf_counter() - t0
        mae_out = np.abs(out.astype(int) - gold.astype(int)).mean()
        mae_src = np.abs(cnt.astype(int) - gold.astype(int)).mean()
        closure = mae_out / mae_src

        out0 = np.asarray(
            transfer_pair_jit(params, cnt_d, stl_d, 0.0, key, config))
        out8 = np.asarray(
            transfer_pair_jit(params, cnt_d, stl_d, 8.0, key, config))
        bds_move = np.abs(out8.astype(int) - out0.astype(int)).mean()

        if args.skip_parity:
            s_parity = float("nan")
        else:
            outp = np.asarray(transfer_pair_jit(
                params, cnt_d, stl_d, 2.0, key, parity))
            s_parity = ssim(out, outp)
        rows.append((i, f"{cnt.shape[1]}x{cnt.shape[0]}", closure,
                     bds_move, s_parity, t_pair))
        print(f"[quality] pair {i} done ({t_pair:.1f}s warm-run)",
              flush=True)

    print("\n| pair | geometry | golden-MAE ratio | BDS movement "
          "(8 vs 0) | default-vs-parity SSIM | warm s/pair |")
    print("|---|---|---|---|---|---|")
    for i, geo, closure, bds_move, s_parity, t_pair in rows:
        print(f"| in{i}/tar{i} | {geo} | {closure:.3f} | {bds_move:.2f} "
              f"| {s_parity:.4f} | {t_pair:.2f} |")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
