"""ctypes bridge to the native data loader (native/dataloader.cpp).

The reference decodes and resizes each pair serially on the driver thread
with OpenCV (reference: main.cu:483-522); the C++ loader decodes PNG/JPEG,
applies the longer-side cap with OpenCV-parity bilinear resampling, and
prefetches the whole pairs list on a thread pool so host IO overlaps
accelerator compute.  Falls back to the PIL path (nct_tpu.io) when the
shared library is absent; ``build()`` compiles it with the in-image g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnctdata.so"))

_lib = None


def build(force: bool = False) -> str:
    """Compile native/dataloader.cpp -> libnctdata.so (one-time)."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.nct_decode.restype = ctypes.c_void_p
    lib.nct_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.nct_copy_free.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.nct_resize_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.nct_write_png.restype = ctypes.c_int
    lib.nct_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.nct_loader_create.restype = ctypes.c_void_p
    lib.nct_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.nct_loader_dims.restype = ctypes.c_int
    lib.nct_loader_dims.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.nct_loader_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.nct_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeLib:
    """Thin functional wrappers over the C ABI."""

    @staticmethod
    def imread_bgr(path: str, max_size: int = 0) -> np.ndarray:
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        h, w = ctypes.c_int(), ctypes.c_int()
        handle = lib.nct_decode(
            path.encode(), max_size, ctypes.byref(h), ctypes.byref(w)
        )
        if not handle:
            raise OSError(f"failed to decode {path}")
        out = np.empty((h.value, w.value, 3), np.uint8)
        lib.nct_copy_free(
            ctypes.c_void_p(handle), out.ctypes.data_as(ctypes.c_void_p)
        )
        return out

    @staticmethod
    def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
        lib = _load()
        img = np.ascontiguousarray(img, np.uint8)
        out = np.empty((oh, ow, 3), np.uint8)
        lib.nct_resize_u8(
            img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
            out.ctypes.data_as(ctypes.c_void_p), oh, ow,
        )
        return out

    @staticmethod
    def imwrite_png(path: str, bgr: np.ndarray) -> None:
        lib = _load()
        bgr = np.ascontiguousarray(bgr, np.uint8)
        rc = lib.nct_write_png(
            path.encode(), bgr.ctypes.data_as(ctypes.c_void_p),
            bgr.shape[0], bgr.shape[1],
        )
        if rc != 0:
            raise OSError(f"failed to write {path}")


class PairLoader:
    """Prefetching iterator over a pairs list.

    paths are interleaved (cnt0, stl0, cnt1, stl1, ...); iteration yields
    (cnt, stl) uint8 BGR arrays already capped to max_size, or None for
    unreadable pairs (reference continues past those, main.cu:484-497).
    """

    def __init__(
        self, pair_paths: Sequence[tuple[str, str]], max_size: int,
        threads: int = 4,
    ):
        self._lib = _load()
        self._n = len(pair_paths)
        flat = [p for pair in pair_paths for p in pair]
        self._fallback_paths = flat
        self._max_size = max_size
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(flat))(
                *[p.encode() for p in flat]
            )
            self._handle = self._lib.nct_loader_create(
                arr, len(flat), max_size, threads
            )
        else:
            self._handle = None

    def _fetch(self, idx: int) -> np.ndarray | None:
        if self._handle is not None:
            h, w = ctypes.c_int(), ctypes.c_int()
            rc = self._lib.nct_loader_dims(
                ctypes.c_void_p(self._handle), idx,
                ctypes.byref(h), ctypes.byref(w),
            )
            if rc != 0:
                return None
            out = np.empty((h.value, w.value, 3), np.uint8)
            self._lib.nct_loader_copy(
                ctypes.c_void_p(self._handle), idx,
                out.ctypes.data_as(ctypes.c_void_p),
            )
            return out
        from nct_tpu.io import cap_max_size, imread_bgr
        try:
            return cap_max_size(
                imread_bgr(self._fallback_paths[idx]), self._max_size
            )
        except OSError:
            return None

    def __len__(self) -> int:
        return self._n

    def __iter__(self):
        for i in range(self._n):
            cnt = self._fetch(2 * i)
            stl = self._fetch(2 * i + 1)
            yield (cnt, stl) if cnt is not None and stl is not None else None

    def close(self) -> None:
        if self._handle is not None:
            self._lib.nct_loader_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
