"""WindowData source: fg/bg-sampled crops from annotated detection windows.

Rebuilds the reference's WindowDataLayer (reference:
src/caffe/layers/window_data_layer.cpp — the R-CNN training input):

  * ``window_data_param.source`` names a window file (format at
    window_data_layer.cpp:43-51)::

        # <image_index>
        <img_path>
        <channels>
        <height>
        <width>
        <num_windows>
        <class_index> <overlap> <x1> <y1> <x2> <y2>     (repeated)

  * windows split into foreground (overlap >= fg_threshold) and
    background (overlap < bg_threshold; label and overlap forced to 0 —
    :132-141);
  * each batch draws ``round(batch_size * fg_fraction)`` foreground and
    the rest background windows uniformly with replacement (:240-277);
  * every sampled window is cropped (optionally context-padded by
    ``context_pad`` pixels at crop scale, clipped to the image like
    :311-380), warped to crop_size x crop_size, mean-subtracted/scaled,
    and randomly mirrored at TRAIN (the transform_param fields the
    reference reads directly in its own load_batch).

Tops: (data [B, crop, crop, C] f32 NHWC, label [B] f32).
"""

from __future__ import annotations

import os

import numpy as np

from nct_tpu.data.image_data import _imread_bgr


def parse_window_file(path: str, root: str = ""):
    """-> (images [(path, (c, h, w))], fg windows, bg windows); windows are
    (image_idx, label, overlap, x1, y1, x2, y2)."""
    images: list[tuple[str, tuple[int, int, int]]] = []
    windows: list[tuple] = []
    with open(path) as f:
        tok = f.read().split()
    i = 0
    while i < len(tok):
        if tok[i] != "#":
            raise ValueError(f"window file {path}: expected '#', got "
                             f"{tok[i]!r}")
        i += 2  # '#' image_index
        img_path = os.path.join(root, tok[i]); i += 1
        c, h, w = int(tok[i]), int(tok[i + 1]), int(tok[i + 2]); i += 3
        num = int(tok[i]); i += 1
        img_idx = len(images)
        images.append((img_path, (c, h, w)))
        for _ in range(num):
            label = int(tok[i]); overlap = float(tok[i + 1])
            x1, y1, x2, y2 = (int(tok[i + 2]), int(tok[i + 3]),
                              int(tok[i + 4]), int(tok[i + 5]))
            i += 6
            windows.append((img_idx, label, overlap, x1, y1, x2, y2))
    return images, windows


def _warp(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear warp of a crop to size x size (cv::resize in the ref)."""
    from nct_tpu.ops.resize import resize_bilinear

    if img.shape[:2] == (size, size):
        return img.astype(np.float32)
    return np.asarray(
        resize_bilinear(img.astype(np.float32), size, size))


class WindowDataSource:
    """``type: "WindowData"`` layer analogue; next_batch() streams
    (data, label) like the other sources."""

    def __init__(self, layer_cfg: dict, phase: str = "TRAIN",
                 seed: int = 0):
        wp = layer_cfg.get("window_data_param", {}) or {}
        tp = layer_cfg.get("transform_param", {}) or {}
        self.batch_size = int(wp.get("batch_size", 1))
        self.fg_fraction = float(wp.get("fg_fraction", 0.25))
        fg_thr = float(wp.get("fg_threshold", 0.5))
        bg_thr = float(wp.get("bg_threshold", 0.5))
        self.context_pad = int(wp.get("context_pad", 0))
        self.crop_size = int(tp.get("crop_size", 0))
        if self.crop_size <= 0:
            raise ValueError("WindowData requires transform_param.crop_size"
                             " (window_data_layer.cpp:162)")
        self.scale = float(tp.get("scale", 1.0))
        self.mirror = bool(tp.get("mirror", False))
        mv = tp.get("mean_value", [])
        self.mean_values = [float(v) for v in
                            (mv if isinstance(mv, list) else [mv])]
        self.phase = phase
        root = str(wp.get("root_folder", ""))
        self.images, windows = parse_window_file(
            str(wp.get("source")), root)
        self.fg = [w for w in windows if w[2] >= fg_thr]
        # background windows get label/overlap zeroed (:132-141)
        self.bg = [(w[0], 0, 0.0) + w[3:] for w in windows
                   if w[2] < bg_thr]
        if not self.fg or not self.bg:
            raise ValueError("window file needs both fg and bg windows")
        self._rng = np.random.default_rng(seed)
        self._cache: dict[int, np.ndarray] = {}

    def _image(self, idx: int) -> np.ndarray:
        if idx not in self._cache:
            self._cache[idx] = _imread_bgr(self.images[idx][0])
        return self._cache[idx]

    def _sample_window(self, is_fg: bool) -> tuple[np.ndarray, float]:
        pool = self.fg if is_fg else self.bg
        img_idx, label, _, x1, y1, x2, y2 = pool[
            int(self._rng.integers(0, len(pool)))]
        img = self._image(img_idx)
        h, w = img.shape[:2]
        if self.context_pad > 0:
            # pad so the warped crop has context_pad pixels of context on
            # each side: scale the box by crop_size/(crop_size - 2*pad)
            # and clip to the image (:311-345 simplified to the clip path)
            cs = self.crop_size
            scale = cs / float(cs - 2 * self.context_pad)
            cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            half_w = (x2 - x1 + 1) * scale / 2.0
            half_h = (y2 - y1 + 1) * scale / 2.0
            x1 = int(round(cx - half_w)); x2 = int(round(cx + half_w))
            y1 = int(round(cy - half_h)); y2 = int(round(cy + half_h))
        x1 = max(0, min(x1, w - 1)); x2 = max(x1 + 1, min(x2, w - 1))
        y1 = max(0, min(y1, h - 1)); y2 = max(y1 + 1, min(y2, h - 1))
        crop = img[y1:y2 + 1, x1:x2 + 1]
        out = _warp(crop, self.crop_size)
        if self.mean_values:
            mv = self.mean_values
            if len(mv) == 1:
                mv = mv * out.shape[-1]
            out = out - np.asarray(mv, np.float32)
        if self.scale != 1.0:
            out = out * self.scale
        if self.mirror and self.phase == "TRAIN" and self._rng.integers(2):
            out = out[:, ::-1]
        return np.ascontiguousarray(out), float(label)

    def next_batch(self) -> tuple[np.ndarray, np.ndarray]:
        num_fg = int(round(self.batch_size * self.fg_fraction))
        imgs, labels = [], []
        # bg first, then fg — the reference's is_fg in {0, 1} loop order
        for is_fg, n in ((False, self.batch_size - num_fg), (True, num_fg)):
            for _ in range(n):
                img, label = self._sample_window(is_fg)
                imgs.append(img)
                labels.append(label)
        return np.stack(imgs), np.asarray(labels, np.float32)

    def __iter__(self):
        while True:
            yield self.next_batch()
