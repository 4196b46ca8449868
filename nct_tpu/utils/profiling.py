"""Per-stage timing and profiler hooks.

Equivalent of the reference's instrumentation (reference: main.cu:328-331
"Patch Match Time", ColorTransfer.cpp:1371-1373 "Nonlocal Solve Time",
:1431-1434 "WLS Solve Time", main.cu:450-453 "**Finished Time"; Caffe's
CUDA-event Timer, include/caffe/util/benchmark.hpp:10-46).  On TPU the
device is asynchronous, so stage spans call ``block_until_ready`` on their
results before stopping the clock; deeper traces use ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def device_sync(x) -> None:
    """Hard completion barrier.

    ``block_until_ready`` is a no-op on relayed/remote PJRT backends (the
    buffer handle reports ready before the device finishes), so the only
    reliable barrier is a scalar readout that the host must wait for.
    """
    for leaf in jax.tree_util.tree_leaves(x):
        jax.block_until_ready(leaf)
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


@dataclass
class StageTimer:
    """Accumulates named stage timings; prints in the reference's format."""

    spans: dict[str, float] = field(default_factory=dict)
    verbose: bool = False

    @contextlib.contextmanager
    def stage(self, name: str, *sync_results):
        start = time.perf_counter()
        try:
            yield
        finally:
            for r in sync_results:
                device_sync(r)
            dt = time.perf_counter() - start
            self.spans[name] = self.spans.get(name, 0.0) + dt
            if self.verbose:
                print(f"{name} Time: {dt:.6f}")

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its output, and record the span."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        device_sync(out)
        dt = time.perf_counter() - start
        self.spans[name] = self.spans.get(name, 0.0) + dt
        if self.verbose:
            print(f"{name} Time: {dt:.6f}")
        return out

    def report(self) -> str:
        lines = [f"{k} Time: {v:.6f}" for k, v in self.spans.items()]
        total = sum(self.spans.values())
        lines.append(f"**Finished Time: {total:.6f} sec.")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
