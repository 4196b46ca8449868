#!/usr/bin/env python
"""The `caffe` command-line equivalent: train / test / time / device_query.

Reference: tools/caffe.cpp — one binary with subcommands
(train:156-229 builds a Solver from -solver and optionally restores
-snapshot; test:231-283 runs forward -iterations times and averages every
scalar output; time and device_query delegate to the per-layer benchmark
and the device inventory).  The TPU-native differences: snapshots are npz
(train.Solver), weights load from .caffemodel or .npz, and multi-device
training is a mesh flag (the `-gpu 0,1` / P2PSync analogue is
`--mesh data=N`, sharding the batch over the data axis).

Usage:
  python tools/caffe_tool.py train --solver solver.prototxt [--snapshot s.npz]
  python tools/caffe_tool.py test --model net.prototxt [--weights w] \
      [--iterations N]
  python tools/caffe_tool.py time --model net.prototxt [H W]
  python tools/caffe_tool.py device_query
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def cmd_train(args) -> int:
    from nct_tpu.train.solver_proto import NetSolver

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh
        import numpy as np

        n = int(args.mesh.split("=")[-1])
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
    ns = NetSolver(args.solver, mesh=mesh)
    if args.snapshot:
        ns.solver.restore(args.snapshot)
        print(f"restored iter {ns.solver.iter} from {args.snapshot}")
    loss = ns.solve()
    path = ns.solver.snapshot()
    print(f"Optimization Done. loss={loss:.6f} snapshot={path}")
    return 0


def cmd_test(args) -> int:
    """Forward `iterations` times, average every scalar output blob —
    the tools/caffe.cpp test() loop."""
    import jax
    import numpy as np
    from nct_tpu.nn import Net
    from nct_tpu.nn.losses import is_loss_type

    net = Net(args.model, phase="TEST")
    if args.weights:
        if args.weights.endswith(".npz"):
            data = np.load(args.weights, allow_pickle=False)
            for key in data.files:
                if key == "__iter__" or not key.startswith("params/"):
                    continue
                _, lname, pname = key.split("/", 2)
                net.params.setdefault(lname, {})[pname] = data[key]
        else:
            net.copy_trained_layers_from(args.weights)
    net.init_params({}, seed=0)  # fill anything the weights didn't cover

    score_tops = [t for cfg in net.layers
                  for t in ([cfg.get("top")] if not isinstance(
                      cfg.get("top"), list) else cfg.get("top"))
                  if is_loss_type(str(cfg.get("type")))
                  or str(cfg.get("type")) == "Accuracy"]
    score_tops = [str(t) for t in score_tops]
    if not score_tops:
        print("net has no loss/accuracy outputs to test")
        return 1
    run = jax.jit(lambda: net.forward({}, tuple(score_tops)))
    sums = {t: 0.0 for t in score_tops}
    for _ in range(args.iterations):
        out = run()
        for t in score_tops:
            sums[t] += float(out[t])
    for t in score_tops:
        print(f"{t} = {sums[t] / args.iterations:.6f}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="action", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--solver", required=True)
    tr.add_argument("--snapshot", default=None,
                    help="resume from an npz solver state")
    tr.add_argument("--mesh", default=None,
                    help="data=N: shard batches over N devices (P2PSync)")
    te = sub.add_parser("test")
    te.add_argument("--model", required=True)
    te.add_argument("--weights", default=None)
    te.add_argument("--iterations", type=int, default=50)
    ti = sub.add_parser("time")
    ti.add_argument("model")
    ti.add_argument("dims", nargs="*", default=[])
    sub.add_parser("device_query")
    args = ap.parse_args(argv)

    if args.action == "train":
        return cmd_train(args)
    if args.action == "test":
        return cmd_test(args)
    if args.action == "time":
        _sys.argv = ["layer_time.py", args.model, *args.dims]
        import importlib
        return importlib.import_module("layer_time").main()
    import importlib
    return importlib.import_module("device_query").main()


if __name__ == "__main__":
    raise SystemExit(main())
