#!/usr/bin/env python
"""Dump VGG-19 feature maps for images — the ``extract_features`` tool
equivalent (reference: tools/extract_features.cpp; also what
Classifier::Predict hands the pipeline, Classifier.cpp:59-105).

Usage:
  python tools/extract_features.py out.npz img1.png [img2.png ...] \
      [--taps conv5_1,conv4_1] [--weights vgg19.npz]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse

import jax.numpy as jnp
import numpy as np

from nct_tpu.io import imread_bgr
from nct_tpu.models import vgg19


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("images", nargs="+")
    p.add_argument("--taps", default="conv5_1,conv4_1,conv3_1,conv2_1,conv1_1")
    p.add_argument("--weights", default=None)
    args = p.parse_args()

    taps = tuple(args.taps.split(","))
    params = (
        vgg19.load_params(args.weights) if args.weights
        else vgg19.init_params()
    )
    blob = {}
    for path in args.images:
        img = imread_bgr(path)
        feats = vgg19.features_jit(params, jnp.asarray(img), taps)
        stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        for t in taps:
            blob[f"{stem}/{t}"] = np.asarray(feats[t])
            print(f"{stem}/{t}: {feats[t].shape}")
    np.savez(args.out, **blob)
    print(f"wrote {args.out} ({len(blob)} arrays)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
