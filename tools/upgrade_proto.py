#!/usr/bin/env python
"""Upgrade legacy prototxt definitions to the modern format.

Analogue of the reference's upgrade tools
(code/tools/upgrade_net_proto_text.cpp, upgrade_solver_proto_text.cpp;
the binary variant is unnecessary here — models/caffe_io.py reads V1 and
V2 caffemodels directly): parses the input, runs the upgrade chain
(nct_tpu/nn/upgrade.py: V0 nested-layer -> V1 `layers`+enums -> V2, the
data transform split, optional input->Input-layer conversion, solver_type
enum -> type string), and re-emits prototxt text.

Usage:
  python tools/upgrade_proto.py net INPUT OUTPUT [--convert-inputs]
  python tools/upgrade_proto.py solver INPUT OUTPUT
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

from nct_tpu.nn.net_spec import emit_prototxt           # noqa: E402
from nct_tpu.nn.prototxt import load_prototxt          # noqa: E402
from nct_tpu.nn.upgrade import upgrade_net, upgrade_solver  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=("net", "solver"))
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--convert-inputs", action="store_true",
                    help="also convert net `input:` fields into an Input "
                         "layer (UpgradeNetInput)")
    args = ap.parse_args(argv)
    msg = load_prototxt(args.input)
    if args.kind == "net":
        out = upgrade_net(msg, convert_inputs=args.convert_inputs)
    else:
        out = upgrade_solver(msg)
    text = emit_prototxt(out)
    with open(args.output, "w") as f:
        f.write(text)
    print(f"wrote {args.output} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
