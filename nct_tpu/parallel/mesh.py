"""Device-mesh construction for multi-chip runs.

The reference's only parallelism beyond one GPU is Caffe's unused P2PSync
tree all-reduce over PCIe (reference: src/caffe/parallel.cpp, docs/
multigpu.md) plus trivially-independent pairs.txt lines (main.cu:471).  The
TPU-native mapping (SURVEY §2.3, §5) is a 2-D ``jax.sharding.Mesh``:

  * ``data``  — independent image pairs (the pairs.txt batch axis), pure
    data parallelism, no cross-device traffic except result gathers;
  * ``space`` — row-sharding of the pixel grid within one pair for images
    larger than a single chip's comfortable footprint; XLA inserts halo
    exchanges (collective-permutes over ICI) for the stencil ops and
    all-gathers for the global PatchMatch candidate reads.

Collectives ride ICI automatically once shardings are annotated; there is
no hand-written communication anywhere in the framework.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_space: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "space") mesh over the available devices.

    Defaults to all devices on the data axis (pairs are embarrassingly
    parallel, so that is the right default until images outgrow one chip).
    """
    devs = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devs) // n_space
    assert n_data * n_space <= len(devs), (
        f"mesh {n_data}x{n_space} exceeds {len(devs)} devices"
    )
    grid = np.asarray(devs[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding: one pair group per data-row."""
    return NamedSharding(mesh, P("data"))


def batch_row_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] arrays: batch over 'data', rows over 'space'."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (e.g. VGG weights)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)
