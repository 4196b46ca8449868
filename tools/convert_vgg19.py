#!/usr/bin/env python
"""Convert VGG_ILSVRC_19_layers.caffemodel to an npz usable by nct_tpu.

Usage: python tools/convert_vgg19.py <model.caffemodel> <out.npz>

Replaces the reference's runtime protobuf weight loading (net.cpp:760-824)
with a one-time offline conversion; nct_tpu loads the npz directly.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


import sys

from nct_tpu.models.caffe_io import caffemodel_to_npz


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    converted = caffemodel_to_npz(sys.argv[1], sys.argv[2])
    print(f"converted {len(converted)} layers: {', '.join(converted)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
