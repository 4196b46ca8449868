#!/usr/bin/env python
"""Device inventory — the ``caffe device_query`` equivalent
(reference: tools/caffe.cpp device_query, main.cu:568-570 cudaMemGetInfo)."""

import jax


def main() -> int:
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        line = (
            f"id {d.id}: {d.device_kind} platform={d.platform} "
            f"process={d.process_index}"
        )
        if "bytes_limit" in stats:
            used = stats.get("bytes_in_use", 0) / 2**30
            lim = stats["bytes_limit"] / 2**30
            line += f" hbm {used:.2f}/{lim:.2f} GiB"
        print(line)
    print(f"local devices: {jax.local_device_count()}, "
          f"total: {jax.device_count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
