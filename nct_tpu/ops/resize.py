"""Bilinear resize matching OpenCV ``cv::resize(..., CV_INTER_LINEAR)``.

The reference builds its image pyramids with INTER_LINEAR (main.cu:106-107,
ColorTransfer.cpp:462-463).  OpenCV bilinear uses the half-pixel-centre
mapping src = (dst + 0.5) * scale - 0.5 with *no* anti-aliasing on
downscale, which differs from ``jax.image.resize`` (that one low-pass
filters when shrinking), so we implement the exact sampling here as two
separable gathers — cheap, static-shaped, and fuses fine under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(dst_n: int, src_n: int):
    """Return (lo_idx, hi_idx, hi_frac) arrays of length dst_n."""
    scale = src_n / dst_n
    coords = (jnp.arange(dst_n, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.floor(coords)
    frac = coords - lo
    lo_idx = jnp.clip(lo.astype(jnp.int32), 0, src_n - 1)
    hi_idx = jnp.clip(lo_idx + 1, 0, src_n - 1)
    # OpenCV clamps the source coordinate, replicating the border sample.
    frac = jnp.where(coords < 0, 0.0, frac)
    frac = jnp.where(coords > src_n - 1, 0.0, frac)
    return lo_idx, hi_idx, frac


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [H, W, C] (or [H, W]) float/uint8 array to [out_h, out_w, C].

    Matches cv2.resize(img, (out_w, out_h), interpolation=INTER_LINEAR) up to
    OpenCV's fixed-point coefficient quantisation.  Returns float32 unless the
    input was uint8 (then rounds back to uint8 like OpenCV's saturate_cast).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    src_h, src_w = img.shape[0], img.shape[1]
    x = img.astype(jnp.float32)

    if src_h != out_h:
        lo, hi, f = _axis_weights(out_h, src_h)
        x = x[lo] * (1.0 - f)[:, None, None] + x[hi] * f[:, None, None]
    if src_w != out_w:
        lo, hi, f = _axis_weights(out_w, src_w)
        x = x[:, lo] * (1.0 - f)[None, :, None] + x[:, hi] * f[None, :, None]

    if img.dtype == jnp.uint8:
        x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    if squeeze:
        x = x[..., 0]
    return x


def max_size_resize_dims(h: int, w: int, max_size: int) -> tuple[int, int]:
    """Longer-side cap with the reference's exact integer math (main.cu:499-522).

    Returns (new_h, new_w); identity if already within max_size.
    """
    if w <= max_size and h <= max_size:
        return h, w
    if w >= h:
        nw = max_size
        nh = int(nw / float(w) * h)
    else:
        nh = max_size
        nw = int(nh / float(h) * w)
    return nh, nw
