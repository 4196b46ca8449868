"""ImageData source + DataTransformer: the list-file training input path.

Rebuilds the reference's ImageDataLayer (src/caffe/layers/
image_data_layer.cpp: `source` list file of "path label" lines under
`root_folder`, optional new_height/new_width resize, shuffle + rand_skip,
fixed batch_size with wrap-around) and DataTransformer
(src/caffe/data_transformer.cpp: optional crop_size — random at TRAIN,
center at TEST — random horizontal mirror, mean_value/mean_file
subtraction, scale), feeding batches through the native decoder
(native/dataloader.cpp) with a PIL fallback.

TPU-native shape: the layer is not executed inside the traced DAG (a data
source is host IO, the one thing that can't live in an XLA program);
instead NetSolver recognizes `type: "ImageData"` layers, strips them from
the graph, and streams their tops as per-iteration input batches — the
same split the reference makes between its prefetch thread
(BasePrefetchingDataLayer) and the net forward.
"""

from __future__ import annotations

import os

import numpy as np

from nct_tpu.data import loader as native_loader


def _imread_bgr(path: str, new_h: int = 0, new_w: int = 0) -> np.ndarray:
    """uint8 BGR HWC, optionally resized to (new_h, new_w) like
    ReadImageToCVMat."""
    if native_loader.native_available():
        img = native_loader.NativeLib.imread_bgr(path)
    else:
        from nct_tpu.io import imread_bgr
        img = imread_bgr(path)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
    if new_h and new_w and img.shape[:2] != (new_h, new_w):
        if native_loader.native_available():
            img = native_loader.NativeLib.resize_bilinear(img, new_h, new_w)
        else:
            import numpy as _np
            from nct_tpu.ops.resize import resize_bilinear
            img = _np.clip(
                _np.asarray(resize_bilinear(
                    img.astype(_np.float32), new_h, new_w)),
                0, 255,
            ).astype(_np.uint8)
    return img


class DataTransformer:
    """(pixel - mean) * scale with crop/mirror (data_transformer.cpp)."""

    def __init__(self, transform_param: dict | None, phase: str = "TRAIN",
                 seed: int = 0):
        tp = transform_param or {}
        self.scale = float(tp.get("scale", 1.0))
        self.mirror = bool(tp.get("mirror", False))
        self.crop_size = int(tp.get("crop_size", 0))
        mv = tp.get("mean_value", [])
        self.mean_values = [float(v) for v in
                            (mv if isinstance(mv, list) else [mv])]
        # mean_file: per-pixel mean image (data_transformer.cpp's
        # binaryproto path; here an npz/npy from tools/compute_image_mean)
        self.mean_image = None
        mf = tp.get("mean_file")
        if mf:
            if self.mean_values:
                raise ValueError(
                    "mean_file and mean_value are exclusive "
                    "(data_transformer.cpp enforces the same)")
            data = np.load(str(mf))
            self.mean_image = np.asarray(
                data["mean"] if hasattr(data, "files") else data,
                np.float32)
        self.phase = phase
        self._rng = np.random.default_rng(seed)

    def __call__(self, img_bgr_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC BGR -> float32 HWC, cropped/mirrored/normalized."""
        x = img_bgr_u8.astype(np.float32)
        h, w = x.shape[:2]
        cs = self.crop_size
        mean_img = self.mean_image
        if cs:
            if self.phase == "TRAIN":
                h_off = int(self._rng.integers(0, h - cs + 1))
                w_off = int(self._rng.integers(0, w - cs + 1))
            else:  # center crop at TEST
                h_off, w_off = (h - cs) // 2, (w - cs) // 2
            x = x[h_off:h_off + cs, w_off:w_off + cs]
            if mean_img is not None:
                # mean_file is indexed at the SAME crop offsets
                # (data_transformer.cpp: mean[(h_off+h)*W + w_off+w])
                mean_img = mean_img[h_off:h_off + cs, w_off:w_off + cs]
        if mean_img is not None:
            x = x - mean_img      # before mirror, in source coordinates
        if self.mirror and self.phase == "TRAIN" and self._rng.integers(2):
            x = x[:, ::-1]
        if self.mean_values:
            mv = self.mean_values
            if len(mv) == 1:
                mv = mv * x.shape[-1]
            x = x - np.asarray(mv, np.float32)
        if self.scale != 1.0:
            x = x * self.scale
        return np.ascontiguousarray(x)


class ImageDataSource:
    """Iterates (images [B,H,W,C] f32 NHWC, labels [B] f32) batches from a
    Caffe image list file, wrapping around forever (image_data_layer.cpp
    load_batch)."""

    def __init__(self, layer_cfg: dict, phase: str = "TRAIN",
                 seed: int = 0):
        idp = layer_cfg.get("image_data_param", {}) or {}
        self.tops = layer_cfg.get("top")
        source = str(idp.get("source"))
        root = str(idp.get("root_folder", ""))
        self.batch_size = int(idp.get("batch_size", 1))
        self.new_h = int(idp.get("new_height", 0))
        self.new_w = int(idp.get("new_width", 0))
        self.lines: list[tuple[str, float]] = []
        with open(source) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                label = float(parts[1]) if len(parts) > 1 else 0.0
                self.lines.append((os.path.join(root, parts[0]), label))
        if not self.lines:
            raise ValueError(f"empty image list {source}")
        self._rng = np.random.default_rng(seed)
        if idp.get("shuffle") in (True, "true"):
            self._rng.shuffle(self.lines)
        self.pos = 0
        if idp.get("rand_skip"):
            self.pos = int(self._rng.integers(0, int(idp["rand_skip"])))
        self.transform = DataTransformer(
            layer_cfg.get("transform_param"), phase=phase, seed=seed)

    def next_batch(self) -> tuple[np.ndarray, np.ndarray]:
        imgs, labels = [], []
        for _ in range(self.batch_size):
            path, label = self.lines[self.pos % len(self.lines)]
            self.pos += 1
            imgs.append(self.transform(
                _imread_bgr(path, self.new_h, self.new_w)))
            labels.append(label)
        return np.stack(imgs), np.asarray(labels, np.float32)

    def __iter__(self):
        while True:
            yield self.next_batch()
