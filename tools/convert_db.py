#!/usr/bin/env python
"""Convert between LMDB/LevelDB databases and the framework's record shards.

Reference: the Caffe tools write training datasets as LMDB/LevelDB of
serialized Datums (tools/convert_imageset.cpp + util/db_lmdb.cpp /
util/db_leveldb.cpp behind the db.cpp factory); the TPU framework's native
format is length-prefixed Datum record shards (nct_tpu/data/records.py).
All three hold the SAME Datum payload bytes, so conversion is a pure
container transcription — no decode/re-encode.

  lmdb2records / leveldb2records:  existing Caffe datasets become shards
  records2lmdb / records2leveldb:  small record sets exported for Caffe
                    interop (write_lmdb is a single-leaf-page writer,
                    write_leveldb a log-only environment — fixture scale;
                    large datasets should stay as shards)

Note the `type: "Data"` layer also reads LMDB and LevelDB *directly*
(records.py RecordShardSource detects a data.mdb or CURRENT source), so
converting is optional — this tool exists for shard-side dedup/resharding
workflows.

Usage:
  python tools/convert_db.py lmdb2records     /path/to/lmdb_env    out.ncr
  python tools/convert_db.py leveldb2records  /path/to/leveldb_env out.ncr
  python tools/convert_db.py records2lmdb     shard.ncr  /path/to/out_env
  python tools/convert_db.py records2leveldb  shard.ncr  /path/to/out_env
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=(
        "lmdb2records", "records2lmdb",
        "leveldb2records", "records2leveldb"))
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)

    from nct_tpu.data.records import RecordFile, RecordWriter

    if args.mode.endswith("2records"):
        if args.mode.startswith("lmdb"):
            from nct_tpu.data.lmdb_reader import LmdbReader
            reader = LmdbReader(args.src)
        else:
            from nct_tpu.data.leveldb_reader import LevelDbReader
            reader = LevelDbReader(args.src)
        n = 0
        with RecordWriter(args.dst) as w:
            for _key, val in reader.items():
                w.write(val)
                n += 1
        print(f"wrote {n} records ({len(reader)} DB entries) -> "
              f"{args.dst}")
    else:
        shard = RecordFile(args.src)
        items = [
            (f"{i:08d}".encode(), shard.read(i)) for i in range(len(shard))
        ]
        if args.mode.endswith("2lmdb"):
            from nct_tpu.data.lmdb_reader import write_lmdb
            write_lmdb(args.dst, items)
        else:
            from nct_tpu.data.leveldb_reader import write_leveldb
            write_leveldb(args.dst, items)
        print(f"wrote DB with {len(items)} entries -> {args.dst}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
