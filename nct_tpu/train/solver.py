"""Solver: training loop, snapshot/restore, data-parallel gradient step.

Reference: src/caffe/solver.cpp (Solve/Step/Snapshot/Restore,
include/caffe/solver.hpp:60-103) and src/caffe/parallel.cpp (P2PSync
multi-GPU tree all-reduce).  The TPU-native replacements:

  * the train step is one jitted program: value_and_grad + the Caffe
    update rule, so forward, backward, clip/decay and the weight update
    all fuse into a single device program per iteration;
  * multi-device data parallelism is a sharding annotation, not a
    communication library — the batch is sharded over the mesh's ``data``
    axis and XLA inserts the gradient all-reduce (psum over ICI), which is
    the role P2PSync's PCIe tree reduction played (docs/multigpu.md);
  * Snapshot/Restore writes a flat npz of (params, optimizer state, iter)
    — the .caffemodel/.solverstate equivalent, resumable mid-run.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nct_tpu.train.lr_policies import LrPolicy, learning_rate
from nct_tpu.utils import glog
from nct_tpu.train.optimizers import OptimizerParams, make_optimizer


@dataclass(frozen=True)
class SolverParams:
    lr: LrPolicy = field(default_factory=LrPolicy)
    opt: OptimizerParams = field(default_factory=OptimizerParams)
    max_iter: int = 1000
    display: int = 0               # print loss every N iters (0 = never)
    snapshot: int = 0              # snapshot every N iters (0 = never)
    snapshot_prefix: str = "snapshot"
    # "npz" (the .caffemodel-binaryproto analogue) or "hdf5" (the
    # reference's SolverParameter snapshot_format HDF5,
    # solver.cpp SnapshotToHDF5); restore() detects either by extension.
    snapshot_format: str = "npz"


def _flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten_tree(tree[k], f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    if isinstance(template, dict):
        return {
            k: _unflatten_into(template[k], flat, f"{prefix}{k}/")
            for k in template
        }
    return jnp.asarray(flat[prefix.rstrip("/")])


class Solver:
    """Minimal-but-complete training driver.

    loss_fn(params, batch) -> scalar; batch is any pytree whose leaves have
    a leading batch axis (sharded over the mesh's ``data`` axis if a mesh
    is given).
    """

    def __init__(
        self,
        loss_fn: Callable,
        params,
        solver_params: SolverParams = SolverParams(),
        mesh: Mesh | None = None,
    ):
        self.param = solver_params
        self.params = params
        self.iter = 0
        opt_init, opt_update = make_optimizer(solver_params.opt)
        self.state = opt_init(params)
        self._mesh = mesh

        lr_policy = solver_params.lr

        def step(params, state, batch, it):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            rate = learning_rate(lr_policy, it)
            params, state = opt_update(params, grads, state, rate, it)
            return params, state, loss

        if mesh is None:
            self._step = jax.jit(step)
        else:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._step = jax.jit(
                step,
                in_shardings=(repl, repl, data, repl),
                out_shardings=(repl, repl, repl),
            )

    def step(self, batch) -> float:
        """One iteration (forward, all-reduced backward, update)."""
        self.params, self.state, loss = self._step(
            self.params, self.state, batch, self.iter
        )
        self.iter += 1
        return float(loss)

    def solve(self, batches: Iterable, on_iter: Callable | None = None) -> float:
        """Run up to max_iter (ref Solver::Solve), snapshotting on schedule.

        ``on_iter(solver)`` runs once before the loop (the reference's
        test_initialization eval) and after every step — the hook
        NetSolver uses for its test_interval evaluation.

        SIGINT/SIGHUP during the loop trigger a snapshot-then-stop at the
        next iteration boundary — the SignalHandler behaviour of the
        reference's training stack (include/caffe/util/signal_handler.h).
        """
        import signal

        stop_requested = []

        def _on_signal(signum, frame):
            stop_requested.append(signum)

        old_handlers = {}
        for sig in (signal.SIGINT, signal.SIGHUP):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:   # non-main thread
                pass

        loss = float("nan")
        try:
            if on_iter is not None:
                on_iter(self)          # ref test_initialization: eval before step 1
            for batch in batches:
                if self.iter >= self.param.max_iter:
                    break
                if stop_requested:
                    path = self.snapshot()
                    glog.warning(f"signal received; snapshotted to {path}")
                    break
                loss = self.step(batch)
                if self.param.display and self.iter % self.param.display == 0:
                    # glog-format lines exactly like the reference's
                    # LOG(INFO) training output (solver.cpp Step);
                    # tools/parse_log.py regexes search past the prefix.
                    glog.info(f"Iteration {self.iter}, loss = {loss}")
                    # the reference prints the effective rate alongside the
                    # loss (sgd_solver.cpp GetLearningRate display)
                    rate = learning_rate(self.param.lr, self.iter)
                    glog.info(f"Iteration {self.iter}, lr = {float(rate)}")
                if self.param.snapshot and self.iter % self.param.snapshot == 0:
                    self.snapshot()
                if on_iter is not None:
                    on_iter(self)
        finally:
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        return loss

    # --- checkpointing (ref Solver::Snapshot/Restore; HDF5 path:
    # solver.cpp SnapshotToHDF5 / RestoreSolverStateFromHDF5) -------------
    def snapshot(self, path: str | None = None) -> str:
        fmt = self.param.snapshot_format
        if path is None:
            ext = "h5" if fmt == "hdf5" else "npz"
            path = f"{self.param.snapshot_prefix}_iter_{self.iter}.{ext}"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {"__iter__": np.asarray(self.iter)}
        blob.update(_flatten_tree(self.params, "params/"))
        blob.update(_flatten_tree(self.state, "state/"))
        if path.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(path, "w") as f:
                for k, v in blob.items():
                    f.create_dataset(k, data=v)
        else:
            np.savez(path, **blob)
        return path

    def restore(self, path: str) -> None:
        if path.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(path, "r") as f:
                data = {k: np.asarray(f[k]) for k in _h5_keys(f)}
        else:
            data = np.load(path)
        self.iter = int(data["__iter__"])
        self.params = _unflatten_into(self.params, data, "params/")
        self.state = _unflatten_into(self.state, data, "state/")


def _h5_keys(group, prefix: str = "") -> list[str]:
    """Flat dataset paths under an h5py group (matching _flatten_tree's
    '/'-joined key convention)."""
    import h5py

    out: list[str] = []
    for k, v in group.items():
        p = f"{prefix}{k}"
        if isinstance(v, h5py.Group):
            out.extend(_h5_keys(v, p + "/"))
        else:
            out.append(p)
    return out
