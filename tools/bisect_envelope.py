#!/usr/bin/env python
"""Bisect the MAX_SIZE kernel fault: run the staged pipeline stage by
stage with a hard device barrier after each program, so the fault is
attributed to the exact program that raises it (async dispatch otherwise
surfaces it at a later sync).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bisect_envelope.py \
          [size] [xla_nn] [level_from]
  size     long-side cap, default 700 (upscales the demo pair like bench.py)
  xla_nn   'xla_nn' replaces the Pallas bidirectional NN kernel with the
           pure-XLA streaming matcher (tests the Pallas-kernel hypothesis)
  f32      run with float32 features (tests the bf16 hypothesis)
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu import pipeline
from nct_tpu.utils.compile_cache import enable as enable_compile_cache
from nct_tpu.utils.profiling import device_sync

SIZE = int(_sys.argv[1]) if len(_sys.argv) > 1 else 700
XLA_NN = "xla_nn" in _sys.argv[2:]
F32 = "f32" in _sys.argv[2:]
DEMO = "/root/reference/demo/example/in"


def fit(img, size):
    img = np.asarray(img)
    h, w = img.shape[:2]
    if max(h, w) >= size:
        return np.asarray(cap_max_size(img, size))
    from nct_tpu.ops.resize import resize_bilinear
    s = size / max(h, w)
    return np.asarray(
        resize_bilinear(jnp.asarray(img), int(round(h * s)),
                        int(round(w * s)))
    ).astype(np.uint8)


def main():
    enable_compile_cache()
    if XLA_NN:
        pipeline._on_tpu = lambda: False  # forces ops/exact_nn XLA path
        print("[bisect] Pallas NN kernel DISABLED (XLA exact_nn)")
    cnt = jax.device_put(fit(imread_bgr(f"{DEMO}/in0.png"), SIZE))
    stl = jax.device_put(fit(imread_bgr(f"{DEMO}/tar0.png"), SIZE))
    config = Config(feature_dtype="float32") if F32 else Config()
    print(f"[bisect] cnt {cnt.shape} stl {stl.shape} "
          f"dtype={config.feature_dtype}", flush=True)
    key = jax.random.PRNGKey(7)
    params = jax.device_put(vgg19.init_params())
    taps = tuple(config.vgg_layers())
    numlayer = len(taps)
    h, w = cnt.shape[0], cnt.shape[1]
    ranges = config.pm_search_radii(max(h, w, stl.shape[0], stl.shape[1]))
    cnt_dims = [vgg19.feature_dims(h, w)[t] for t in taps]

    def stage(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            device_sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"[bisect] {name} FAULTED after "
                  f"{time.perf_counter() - t0:.1f}s: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            raise SystemExit(1)
        print(f"[bisect] {name} ok {time.perf_counter() - t0:.1f}s",
              flush=True)
        return out

    setup_out = stage("setup(vgg+cluster)", lambda: pipeline._setup_jit(
        params, cnt, stl, key, config, taps))
    (cnt_feats, stl_feats, cnt_pyr, stl_pyr, cnt_lab_unit, label_map,
     membership, key) = setup_out

    ann = bnn = None
    prev_ab = None
    cnt_feat_l = cnt_feats[taps[0]]
    for l in range(numlayer):
        res = stage(
            f"L{l} match {cnt_dims[l]}",
            lambda: pipeline._level_match_jit(
                params, config=config, l=l, rs=max(int(ranges[l]), 1),
                bds_weight=2.0, key=key, ann_prev=ann, bnn_prev=bnn,
                cnt_feat_l=cnt_feat_l, stl_feat_l=stl_feats[taps[l]],
                down_stl=stl_pyr[l],
            ),
        )
        ann, bnn, guide_bgr, bds_err, key = res
        res = stage(
            f"L{l} solve {cnt_dims[l]}",
            lambda: pipeline._level_solve_jit(
                params, config=config, l=l, numlayer=numlayer,
                want_trace=False, key=key, ann=ann, bnn=bnn,
                guide_bgr=guide_bgr, bds_err=bds_err, prev_ab=prev_ab,
                down_cnt=cnt_pyr[l], cnt_lab_unit=cnt_lab_unit,
                label_map=label_map, membership=membership,
            ),
        )
        ann, bnn, refined, cnt_feat_l, prev_ab, key, _ = res
    print("[bisect] ALL STAGES OK", flush=True)


if __name__ == "__main__":
    main()
