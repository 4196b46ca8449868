#!/usr/bin/env python
"""Convert a Caffe image list into the framework's HDF5 dataset format.

Reference: tools/convert_imageset.cpp — reads ``path label`` lines,
optionally shuffles and resizes, and ingests each image as a Datum into
an LMDB/LevelDB for DataLayer.  The TPU framework's random-access dataset
backend is HDF5 (nct_tpu/data/hdf5_data.py), so this converter produces
sharded ``.h5`` files (datasets ``data`` NCHW + ``label``, the Caffe HDF5
layout) plus the source list file ``hdf5_data_param { source }`` points
at.

Usage:
  python tools/convert_imageset.py LISTFILE OUTDIR \
      [--root-folder DIR] [--resize-height H] [--resize-width W] \
      [--shuffle] [--shard-size N] [--seed S]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

import numpy as np

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def convert(listfile: str, outdir: str, root: str = "",
            new_h: int = 0, new_w: int = 0, shuffle: bool = False,
            shard_size: int = 4096, seed: int = 0) -> str:
    import h5py

    from nct_tpu.data.image_data import _imread_bgr

    with open(listfile) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    if shuffle:
        np.random.default_rng(seed).shuffle(lines)
    if not lines:
        raise ValueError(f"no entries in {listfile}")

    _os.makedirs(outdir, exist_ok=True)
    shard_paths = []
    for s0 in range(0, len(lines), shard_size):
        chunk = lines[s0:s0 + shard_size]
        imgs, labels = [], []
        for entry in chunk:
            path, label = entry[0], (entry[1] if len(entry) > 1 else 0)
            img = _imread_bgr(_os.path.join(root, path), new_h, new_w)
            imgs.append(img)
            labels.append(float(label))
        data = np.stack(imgs).astype(np.float32)        # N,H,W,C
        data = data.transpose(0, 3, 1, 2)               # Caffe NCHW layout
        name = f"shard_{s0 // shard_size:05d}.h5"
        p = _os.path.join(outdir, name)
        with h5py.File(p, "w") as h5:
            h5.create_dataset("data", data=data)
            h5.create_dataset(
                "label", data=np.asarray(labels, np.float32))
        shard_paths.append(name)
    source = _os.path.join(outdir, "source.txt")
    with open(source, "w") as f:
        f.write("\n".join(shard_paths) + "\n")
    return source


def convert_records(listfile: str, outdir: str, root: str = "",
                    new_h: int = 0, new_w: int = 0, shuffle: bool = False,
                    shard_size: int = 4096, seed: int = 0) -> str:
    """Datum record shards — the actual LMDB-ingest analogue
    (tools/convert_imageset.cpp writes Datums into a DB; here into
    nct_tpu/data/records.py shards for `type: "Data"` layers)."""
    from nct_tpu.data.image_data import _imread_bgr
    from nct_tpu.data.records import RecordWriter

    with open(listfile) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    if shuffle:
        np.random.default_rng(seed).shuffle(lines)
    if not lines:
        raise ValueError(f"no entries in {listfile}")
    _os.makedirs(outdir, exist_ok=True)
    shard_paths = []
    for s0 in range(0, len(lines), shard_size):
        name = f"shard_{s0 // shard_size:05d}.ncr"
        p = _os.path.join(outdir, name)
        with RecordWriter(p) as wr:
            for entry in lines[s0:s0 + shard_size]:
                path = entry[0]
                label = int(float(entry[1])) if len(entry) > 1 else 0
                wr.write_image(
                    _imread_bgr(_os.path.join(root, path), new_h, new_w),
                    label)
        shard_paths.append(p)
    source = _os.path.join(outdir, "source.txt")
    with open(source, "w") as f:
        f.write("\n".join(shard_paths) + "\n")
    return source


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("listfile")
    ap.add_argument("outdir")
    ap.add_argument("--root-folder", default="")
    ap.add_argument("--resize-height", type=int, default=0)
    ap.add_argument("--resize-width", type=int, default=0)
    ap.add_argument("--shuffle", action="store_true")
    ap.add_argument("--shard-size", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", choices=("hdf5", "records"),
                    default="hdf5",
                    help="hdf5 -> HDF5Data shards; records -> Datum "
                         "record shards for `type: \"Data\"` layers "
                         "(the LMDB analogue)")
    args = ap.parse_args(argv)
    fn = convert_records if args.backend == "records" else convert
    source = fn(
        args.listfile, args.outdir, args.root_folder,
        args.resize_height, args.resize_width, args.shuffle,
        args.shard_size, args.seed)
    print(f"wrote {args.backend} source list {source}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
