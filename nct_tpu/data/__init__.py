"""Data loading: native (C++) decode/resize/prefetch with PIL fallback."""

from nct_tpu.data.loader import (  # noqa: F401
    NativeLib,
    PairLoader,
    native_available,
)

# Host-IO data-source layer types (the BasePrefetchingDataLayer family):
# NetSolver strips these from the traced DAG and streams their tops as
# per-step input batches.  Maps the prototxt `type` to a source class
# with (layer_cfg, phase=, seed=) -> .next_batch() -> tuple of arrays.
DATA_LAYER_TYPES = ("ImageData", "HDF5Data", "Data", "WindowData",
                    "MemoryData")


def make_data_source(layer_cfg: dict, phase: str = "TRAIN", seed: int = 0):
    """Factory over the data-source vocabulary (the reference's layer
    factory restricted to its data layers): ImageData
    (image_data_layer.cpp), HDF5Data (hdf5_data_layer.cpp), Data — the
    LMDB/LevelDB record path (data_layer.cpp + util/db_*.cpp) — and
    WindowData (window_data_layer.cpp)."""
    ltype = str(layer_cfg.get("type"))
    if ltype == "ImageData":
        from nct_tpu.data.image_data import ImageDataSource

        return ImageDataSource(layer_cfg, phase=phase, seed=seed)
    if ltype == "HDF5Data":
        from nct_tpu.data.hdf5_data import HDF5DataSource

        return HDF5DataSource(layer_cfg, phase=phase, seed=seed)
    if ltype == "Data":
        from nct_tpu.data.records import RecordShardSource

        return RecordShardSource(layer_cfg, phase=phase, seed=seed)
    if ltype == "WindowData":
        from nct_tpu.data.window_data import WindowDataSource

        return WindowDataSource(layer_cfg, phase=phase, seed=seed)
    if ltype == "MemoryData":
        from nct_tpu.data.memory_data import MemoryDataSource

        return MemoryDataSource(layer_cfg, phase=phase, seed=seed)
    raise ValueError(f"not a data layer type: {ltype}")
