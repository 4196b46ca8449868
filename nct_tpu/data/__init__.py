"""Data loading: native (C++) decode/resize/prefetch with PIL fallback."""

from nct_tpu.data.loader import (  # noqa: F401
    NativeLib,
    PairLoader,
    native_available,
)
