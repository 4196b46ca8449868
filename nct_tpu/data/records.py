"""DB-backed data path: Datum record shards (the LMDB/LevelDB analogue).

Rebuilds the reference's database-backed training input (reference:
src/caffe/layers/data_layer.cpp + util/db_lmdb.cpp / db_leveldb.cpp +
data_reader.cpp): images are pre-serialized as Caffe **Datum** messages
(caffe.proto: 1=channels, 2=height, 3=width, 4=data CHW uint8 bytes,
5=label, 6=float_data, 7=encoded) and streamed at train time by a cursor
that wraps around at the end — no JPEG decode in the hot loop.

The storage engine is NOT LMDB (a B-tree mmap store earns nothing for the
strictly-sequential cursor Caffe uses: data_layer.cpp only ever calls
cursor->Next); instead a record shard is a flat file of length-prefixed
Datum messages plus a sidecar ``.idx`` of u64 offsets for random access
(the role LMDB's keys play for seek/rand_skip).  The Datum payload itself
is genuine protobuf wire format — ``models/caffe_io.iter_fields`` parses
it, so shards written by this module are byte-level Caffe Datums.

Layout:  [8-byte magic "NCTREC00"] then per record:
         [u32 LE payload length][payload bytes]
Sidecar: <path>.idx — u64 LE offsets of every record's length prefix.
"""

from __future__ import annotations

import os
import struct

import numpy as np

MAGIC = b"NCTREC00"


# --- Datum protobuf wire-format codec --------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_datum(img_bgr_u8: np.ndarray, label: int = 0) -> bytes:
    """uint8 HWC BGR -> Caffe Datum bytes (data stored CHW like
    CVMatToDatum, io.cpp)."""
    img = np.asarray(img_bgr_u8, np.uint8)
    h, w, c = img.shape
    chw = np.ascontiguousarray(img.transpose(2, 0, 1))
    out = bytearray()
    out += b"\x08" + _varint(c)            # field 1 varint channels
    out += b"\x10" + _varint(h)            # field 2 varint height
    out += b"\x18" + _varint(w)            # field 3 varint width
    data = chw.tobytes()
    out += b"\x22" + _varint(len(data)) + data   # field 4 bytes data
    out += b"\x28" + _varint(int(label))   # field 5 varint label
    return bytes(out)


def decode_datum(payload: bytes) -> tuple[np.ndarray, int]:
    """Datum bytes -> (uint8 HWC BGR image, label).  float_data Datums
    (field 6) decode too (converted to uint8 after clipping, the
    transformer works in float anyway)."""
    from nct_tpu.models.caffe_io import iter_fields

    c = h = w = label = 0
    data = b""
    floats: list[float] = []
    for field, wire, val in iter_fields(memoryview(payload)):
        if field == 1:
            c = int(val)
        elif field == 2:
            h = int(val)
        elif field == 3:
            w = int(val)
        elif field == 4:
            data = bytes(val)
        elif field == 5:
            label = int(val)
        elif field == 6:
            if wire == 2:  # packed floats
                floats.extend(np.frombuffer(bytes(val), "<f4").tolist())
            else:
                floats.append(struct.unpack("<f", struct.pack("<I", val))[0])
    if data:
        img = np.frombuffer(data, np.uint8).reshape(c, h, w)
    else:
        img = np.clip(np.asarray(floats, np.float32).reshape(c, h, w),
                      0, 255).astype(np.uint8)
    return np.ascontiguousarray(img.transpose(1, 2, 0)), label


# --- record shard file ------------------------------------------------------

class RecordWriter:
    """Sequential shard writer (the convert_imageset.cpp ingest role)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._offsets: list[int] = []

    def write(self, payload: bytes) -> None:
        self._offsets.append(self._f.tell())
        self._f.write(struct.pack("<I", len(payload)))
        self._f.write(payload)

    def write_image(self, img_bgr_u8: np.ndarray, label: int = 0) -> None:
        self.write(encode_datum(img_bgr_u8, label))

    def close(self) -> None:
        self._f.close()
        with open(self.path + ".idx", "wb") as idx:
            idx.write(struct.pack(f"<{len(self._offsets)}Q",
                                  *self._offsets))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordFile:
    """Random-access shard reader; ``cursor()`` is the wrap-around
    sequential iterator of db_lmdb.cpp's LMDBCursor."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            if f.read(len(MAGIC)) != MAGIC:
                raise ValueError(f"{path}: not a record shard")
        idx_path = path + ".idx"
        if os.path.exists(idx_path):
            raw = open(idx_path, "rb").read()
            self.offsets = list(struct.unpack(f"<{len(raw) // 8}Q", raw))
        else:  # rebuild by scanning (a lost sidecar is not fatal)
            self.offsets = []
            with open(path, "rb") as f:
                f.seek(len(MAGIC))
                while True:
                    pos = f.tell()
                    hdr = f.read(4)
                    if len(hdr) < 4:
                        break
                    self.offsets.append(pos)
                    f.seek(struct.unpack("<I", hdr)[0], 1)
        self._f = open(path, "rb")

    def __len__(self) -> int:
        return len(self.offsets)

    def read(self, i: int) -> bytes:
        self._f.seek(self.offsets[i])
        (n,) = struct.unpack("<I", self._f.read(4))
        return self._f.read(n)


class RecordShardSource:
    """``type: "Data"`` layer analogue (data_layer.cpp): streams
    (images [B,H,W,C] f32, labels [B] f32) batches from record shards with
    a wrap-around cursor, rand_skip, and DataTransformer crop/mirror/mean.

    ``data_param { source, batch_size, rand_skip }`` — source is one shard
    file, a directory of ``*.ncr`` shards, a list file of shard paths
    (the multi-file generalization of one LMDB directory), an actual
    LMDB environment (a directory holding ``data.mdb``, or the ``.mdb``
    file itself) read by the pure-Python walker in lmdb_reader.py, or a
    LevelDB environment (a directory holding ``CURRENT``) read by
    leveldb_reader.py — the reference's ``backend: LMDB`` / ``LEVELDB``
    ingestion paths (db_lmdb.cpp, db_leveldb.cpp) without a conversion
    step."""

    def __init__(self, layer_cfg: dict, phase: str = "TRAIN",
                 seed: int = 0):
        dp = layer_cfg.get("data_param", {}) or {}
        source = str(dp.get("source"))
        self.batch_size = int(dp.get("batch_size", 1))
        paths: list[str]
        is_lmdb = source.endswith(".mdb") or (
            os.path.isdir(source)
            and os.path.exists(os.path.join(source, "data.mdb"))
        )
        is_leveldb = not is_lmdb and (
            os.path.isdir(source)
            and os.path.exists(os.path.join(source, "CURRENT"))
        )
        if is_lmdb or is_leveldb:
            if is_lmdb:
                from nct_tpu.data.lmdb_reader import LmdbReader as _Reader
            else:
                from nct_tpu.data.leveldb_reader import (
                    LevelDbReader as _Reader)

            class _DbValues:
                """RecordFile-shaped view over a DB's values (the
                reference's cursor yields Datum values in key order —
                db_lmdb.cpp / db_leveldb.cpp behind the db.cpp factory).
                Holds only a location per entry — values materialize per
                read, so a multi-GB environment costs O(entries) index
                memory, not O(bytes)."""

                def __init__(self, path):
                    self._reader = _Reader(path)
                    self._locs = [loc for _k, loc
                                  in self._reader.item_locs()]

                def __len__(self):
                    return len(self._locs)

                def read(self, i):
                    return self._reader.value_at(self._locs[i])

            paths = [source]
            self.files = [_DbValues(source)]
            self.sizes = [len(f) for f in self.files]
            self.total = sum(self.sizes)
            self.pos = 0
            rng = np.random.default_rng(seed)
            if dp.get("rand_skip"):
                self.pos = int(rng.integers(0, int(dp["rand_skip"])))
            from nct_tpu.data.image_data import DataTransformer

            self.transform = DataTransformer(
                layer_cfg.get("transform_param"), phase=phase, seed=seed)
            return
        if os.path.isdir(source):
            paths = sorted(
                os.path.join(source, p) for p in os.listdir(source)
                if p.endswith(".ncr")
            )
        elif source.endswith(".ncr"):
            paths = [source]
        else:
            with open(source) as f:
                paths = [ln.strip() for ln in f if ln.strip()]
        if not paths:
            raise ValueError(f"no record shards under {source}")
        self.files = [RecordFile(p) for p in paths]
        self.sizes = [len(f) for f in self.files]
        self.total = sum(self.sizes)
        self.pos = 0
        rng = np.random.default_rng(seed)
        if dp.get("rand_skip"):
            self.pos = int(rng.integers(0, int(dp["rand_skip"])))
        from nct_tpu.data.image_data import DataTransformer

        self.transform = DataTransformer(
            layer_cfg.get("transform_param"), phase=phase, seed=seed)

    def _read(self, i: int) -> bytes:
        for f, n in zip(self.files, self.sizes):
            if i < n:
                return f.read(i)
            i -= n
        raise IndexError(i)

    def next_batch(self) -> tuple[np.ndarray, np.ndarray]:
        imgs, labels = [], []
        for _ in range(self.batch_size):
            img, label = decode_datum(self._read(self.pos % self.total))
            self.pos += 1
            imgs.append(self.transform(img))
            labels.append(float(label))
        return np.stack(imgs), np.asarray(labels, np.float32)

    def __iter__(self):
        while True:
            yield self.next_batch()
