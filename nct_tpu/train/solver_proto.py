"""SolverParameter prototxt front-end: the `caffe train -solver` surface.

Rebuilds the configuration path of the reference training stack
(src/caffe/proto/caffe.proto SolverParameter, src/caffe/solver.cpp Init +
tools/caffe.cpp:train:156-229): a solver prototxt names the net, the LR
policy, the optimizer type and its knobs; this module parses it with the
same text-format reader the Net uses and materializes the train.Solver
pieces (LrPolicy / OptimizerParams / SolverParams) plus a ready-to-train
NetSolver that wires a prototxt-defined net (with its loss layers and
fillers) into the jitted train step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax

from nct_tpu.nn.net import Net
from nct_tpu.nn.prototxt import load_prototxt, parse_prototxt
from nct_tpu.train.lr_policies import LrPolicy
from nct_tpu.train.optimizers import OptimizerParams
from nct_tpu.train.solver import Solver, SolverParams

# SolverParameter.solver_type enum and its modern string `type` field
_SOLVER_TYPES = {
    "SGD": "sgd", "NESTEROV": "nesterov", "ADAGRAD": "adagrad",
    "RMSPROP": "rmsprop", "ADADELTA": "adadelta", "ADAM": "adam",
}


@dataclass
class SolverProto:
    """Parsed solver prototxt: everything tools/caffe.cpp train() reads."""
    solver_params: SolverParams
    net: str | dict | None          # path or inline NetParameter
    test_iter: int = 0
    test_interval: int = 0
    random_seed: int = -1


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def parse_solver_prototxt(text_or_path: str) -> SolverProto:
    if "\n" in text_or_path or ":" in os.path.basename(text_or_path):
        msg = parse_prototxt(text_or_path)
        base = "."
    else:
        msg = load_prototxt(text_or_path)
        base = os.path.dirname(os.path.abspath(text_or_path))

    lr = LrPolicy(
        policy=str(msg.get("lr_policy", "fixed")),
        base_lr=float(msg.get("base_lr", 0.01)),
        gamma=float(msg.get("gamma", 0.1)),
        power=float(msg.get("power", 0.75)),
        stepsize=int(msg.get("stepsize", 100000)),
        stepvalues=tuple(int(v) for v in _as_list(msg.get("stepvalue"))),
        max_iter=int(msg.get("max_iter", 100000)),
    )
    type_field = str(msg.get("type", msg.get("solver_type", "SGD")))
    opt = OptimizerParams(
        solver_type=_SOLVER_TYPES.get(type_field.upper(), "sgd"),
        momentum=float(msg.get("momentum", 0.9)),
        momentum2=float(msg.get("momentum2", 0.999)),
        delta=float(msg.get("delta", 1e-8)),
        rms_decay=float(msg.get("rms_decay", 0.99)),
        weight_decay=float(msg.get("weight_decay", 0.0)),
        clip_gradients=float(msg.get("clip_gradients", -1.0)),
        iter_size=int(msg.get("iter_size", 1)),
    )
    sp = SolverParams(
        lr=lr, opt=opt,
        max_iter=int(msg.get("max_iter", 1000)),
        display=int(msg.get("display", 0)),
        snapshot=int(msg.get("snapshot", 0)),
        snapshot_prefix=str(msg.get("snapshot_prefix", "snapshot")),
        # SolverParameter.snapshot_format enum {HDF5, BINARYPROTO}; the
        # binaryproto analogue here is npz
        snapshot_format=(
            "hdf5"
            if str(msg.get("snapshot_format", "")).upper() == "HDF5"
            else "npz"
        ),
    )
    net = msg.get("net") or msg.get("train_net")
    if isinstance(net, str) and not os.path.isabs(net):
        net = os.path.join(base, net)
    if net is None and "net_param" in msg:
        net = msg["net_param"]
    return SolverProto(
        solver_params=sp, net=net,
        test_iter=int(_as_list(msg.get("test_iter"))[0]
                      if msg.get("test_iter") is not None else 0),
        test_interval=int(msg.get("test_interval", 0)),
        random_seed=int(msg.get("random_seed", -1)),
    )


class NetSolver:
    """`caffe train` in one object: solver prototxt -> trained net.

    The net must be self-feeding (DummyData tops) or fed per-step batches
    whose keys are the net's input blob names.  Mirrors the reference
    tools/caffe.cpp train() -> Solver::Solve flow.
    """

    def __init__(self, solver: SolverProto | str, mesh=None,
                 input_shapes: dict | None = None):
        if isinstance(solver, str):
            solver = parse_solver_prototxt(solver)
        self.proto = solver
        self.net = Net(solver.net, phase="TRAIN")
        seed = solver.random_seed if solver.random_seed >= 0 else 0

        # Data layers (ImageData, HDF5Data) are host IO, not graph ops:
        # strip them from the traced DAG and stream their tops as input
        # batches (the reference splits the same way —
        # BasePrefetchingDataLayer thread vs net forward).
        self.data_source = None
        kept = []
        shapes = dict(input_shapes or {})
        for cfg in self.net.layers:
            ltype = str(cfg.get("type"))
            if ltype in ("ImageData", "HDF5Data"):
                if ltype == "ImageData":
                    from nct_tpu.data.image_data import ImageDataSource

                    self.data_source = ImageDataSource(
                        cfg, phase="TRAIN", seed=seed)
                else:
                    from nct_tpu.data.hdf5_data import HDF5DataSource

                    self.data_source = HDF5DataSource(
                        cfg, phase="TRAIN", seed=seed)
                first = tuple(self.data_source.next_batch())
                tops = cfg.get("top")
                tops = tops if isinstance(tops, list) else [tops]
                self._data_tops = [str(t) for t in tops]
                for t, arr in zip(self._data_tops, first):
                    shapes[t] = arr.shape
                self._first_batch = first
            else:
                kept.append(cfg)
        self.net.layers = kept
        self.net.init_params(shapes, seed=seed)
        self.solver = Solver(
            self.net.make_loss_fn(), self.net.params,
            solver.solver_params, mesh=mesh,
        )

    def solve(self, batches=None) -> float:
        """Train to max_iter.  With no batches, the net feeds itself —
        DummyData tops come from the traced graph, ImageData tops stream
        from the host-side source — and each step receives a fresh
        dropout key."""
        if batches is None:
            key = jax.random.PRNGKey(
                max(self.proto.random_seed, 0))

            def empty_batches():
                it = 0
                first = getattr(self, "_first_batch", None)
                while True:
                    batch = {"__rng__": jax.random.fold_in(key, it)}
                    if self.data_source is not None:
                        if first is not None:
                            arrays, first = first, None
                        else:
                            arrays = tuple(self.data_source.next_batch())
                        for t, arr in zip(self._data_tops, arrays):
                            batch[t] = arr
                    yield batch
                    it += 1

            batches = empty_batches()
        loss = self.solver.solve(batches)
        self.net.params = self.solver.params
        return loss
