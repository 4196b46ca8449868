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

from nct_tpu.nn.losses import is_loss_type
from nct_tpu.nn.net import Net
from nct_tpu.nn.prototxt import load_prototxt, parse_prototxt
from nct_tpu.train.lr_policies import LrPolicy
from nct_tpu.train.optimizers import OptimizerParams
from nct_tpu.utils import glog
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
    # legacy solver_type enum (incl. numeric values) -> modern type string
    # (upgrade_proto.cpp UpgradeSolverType)
    from nct_tpu.nn.upgrade import upgrade_solver

    msg = upgrade_solver(msg)
    type_field = str(msg.get("type", "SGD"))
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

        # Data layers (ImageData/HDF5Data/Data/WindowData) are host IO,
        # not graph ops: strip them from the traced DAG and stream their
        # tops as input batches (the reference splits the same way —
        # BasePrefetchingDataLayer thread vs net forward).
        from nct_tpu.data import DATA_LAYER_TYPES, make_data_source

        self.data_source = None
        kept = []
        shapes = dict(input_shapes or {})
        for cfg in self.net.layers:
            ltype = str(cfg.get("type"))
            if ltype in DATA_LAYER_TYPES:
                self.data_source = make_data_source(
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

        # Periodic TEST-phase evaluation (ref solver.cpp TestAll/Test:
        # every test_interval iterations, forward the test net test_iter
        # times and print the averaged outputs).  The test net shares the
        # training parameters (ref: ShareTrainedLayersWith).
        self.test_net = None
        self._test_source = None
        if solver.test_interval > 0:
            self.test_net = Net(solver.net, phase="TEST")
            t_kept = []
            for cfg in self.test_net.layers:
                ltype = str(cfg.get("type"))
                if ltype in DATA_LAYER_TYPES:
                    self._test_source = make_data_source(
                        cfg, phase="TEST", seed=seed)
                    tops = cfg.get("top")
                    tops = tops if isinstance(tops, list) else [tops]
                    self._test_tops = [str(t) for t in tops]
                else:
                    t_kept.append(cfg)
            self.test_net.layers = t_kept

    def test(self) -> dict[str, float]:
        """One full test pass: test_iter forwards, outputs averaged
        (ref solver.cpp Test: loss/accuracy tops of the TEST net)."""
        if self.test_net is None:
            return {}
        net = self.test_net
        score_tops = []
        for cfg in net.layers:
            ltype = str(cfg.get("type"))
            tops = cfg.get("top")
            tops = tops if isinstance(tops, list) else [tops]
            if is_loss_type(ltype) or ltype == "Accuracy":
                score_tops.extend(str(t) for t in tops)
        if not score_tops:
            return {}
        names = tuple(score_tops)
        run = getattr(self, "_test_run", None)
        if run is None:
            run = jax.jit(
                lambda params, batch: net.forward(
                    batch, names, params=params)
            )
            self._test_run = run
        iters = max(self.proto.test_iter, 1)
        sums = {t: 0.0 for t in names}
        for _ in range(iters):
            batch = {}
            if self._test_source is not None:
                arrays = tuple(self._test_source.next_batch())
                batch = dict(zip(self._test_tops, arrays))
            out = run(self.solver.params, batch)
            for t in names:
                sums[t] += float(out[t])
        scores = {t: sums[t] / iters for t in names}
        glog.info(f"Iteration {self.solver.iter}, Testing net (#0)")
        for i, t in enumerate(names):
            glog.info(f"    Test net output #{i}: {t} = {scores[t]:.6f}")
        return scores

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
        on_iter = None
        if self.test_net is not None:
            interval = self.proto.test_interval

            def on_iter(solver):
                if solver.iter % interval == 0:
                    self.test()

        loss = self.solver.solve(batches, on_iter=on_iter)
        self.net.params = self.solver.params
        return loss
