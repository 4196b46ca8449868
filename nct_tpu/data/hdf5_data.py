"""HDF5Data source: batches straight from HDF5 files.

Rebuilds the reference's HDF5DataLayer (src/caffe/layers/
hdf5_data_layer.cpp: ``hdf5_data_param { source batch_size shuffle }`` —
the source file lists one .h5 path per line; every listed file must hold a
dataset per top blob; ``shuffle`` permutes both the file order and the row
order within each file; batches wrap across file boundaries forever) for
the TPU framework.  Like ImageData, the layer is host IO: NetSolver strips
it from the traced DAG and streams its tops as per-iteration batches.

Layout: Caffe stores N x C x H x W; this framework is NHWC, so 4-D
datasets are transposed on load (2-D label/vector datasets pass through).
Datasets are read whole per file (the reference memory-maps the same way —
hdf5_load_nd_dataset reads the full blob).
"""

from __future__ import annotations

import os

import numpy as np


class HDF5DataSource:
    """Iterates tuples of per-top arrays from a list of HDF5 files."""

    def __init__(self, layer_cfg: dict, phase: str = "TRAIN",
                 seed: int = 0):
        import h5py  # deferred: optional dependency

        hdp = layer_cfg.get("hdf5_data_param", {}) or {}
        tops = layer_cfg.get("top")
        self.tops = [str(t) for t in
                     (tops if isinstance(tops, list) else [tops])]
        self.batch_size = int(hdp.get("batch_size", 1))
        self.shuffle = hdp.get("shuffle") in (True, "true")
        source = str(hdp.get("source"))
        base = os.path.dirname(os.path.abspath(source))
        with open(source) as f:
            self.files = [
                ln.strip() if os.path.isabs(ln.strip())
                else os.path.join(base, ln.strip())
                for ln in f if ln.strip()
            ]
        if not self.files:
            raise ValueError(f"no HDF5 files listed in {source}")
        self._h5py = h5py
        self._rng = np.random.default_rng(seed)
        self._file_perm = np.arange(len(self.files))
        if self.shuffle:
            self._rng.shuffle(self._file_perm)
        self._file_idx = 0
        self._load_file(self.files[self._file_perm[0]])

    def _load_file(self, path: str) -> None:
        with self._h5py.File(path, "r") as f:
            data = {}
            for t in self.tops:
                arr = np.asarray(f[t])
                if arr.ndim == 4:          # Caffe NCHW -> NHWC
                    arr = np.ascontiguousarray(arr.transpose(0, 2, 3, 1))
                data[t] = arr.astype(np.float32)
        n = data[self.tops[0]].shape[0]
        for t in self.tops:
            if data[t].shape[0] != n:
                raise ValueError(
                    f"dataset {t} rows {data[t].shape[0]} != {n} in {path}"
                )
        self._data = data
        self._perm = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(self._perm)
        self._row = 0

    def _advance_file(self) -> None:
        self._file_idx += 1
        if self._file_idx >= len(self.files):
            self._file_idx = 0
            if self.shuffle:
                self._rng.shuffle(self._file_perm)
        self._load_file(self.files[self._file_perm[self._file_idx]])

    def next_batch(self) -> tuple[np.ndarray, ...]:
        """One batch per top, wrapping across files (ref Forward_cpu)."""
        chunks: list[list[np.ndarray]] = [[] for _ in self.tops]
        need = self.batch_size
        while need > 0:
            n = self._perm.shape[0]
            take = min(need, n - self._row)
            rows = self._perm[self._row:self._row + take]
            for i, t in enumerate(self.tops):
                chunks[i].append(self._data[t][rows])
            self._row += take
            need -= take
            if self._row >= n:
                self._advance_file()
        return tuple(np.concatenate(c, axis=0) for c in chunks)

    def __iter__(self):
        while True:
            yield self.next_batch()
