"""Patch statistics and the initial per-pixel linear colour transform.

TPU-native equivalents of the reference's integral tables and patch-moment
math (reference: ColorTransfer.cpp:425-455 ``build_accumTable_downsample``,
:46-58 ``getValue``, :1194-1264 patch mean/std -> (a, b) init, :1302-1357
error -> confidence).  The row-wise prefix-sum tables become 2-D
``jnp.cumsum`` integral images; the per-pixel OpenMP loops become one
vectorized window-sum expression.

Numerics preserved: statistics are computed over *uint8-scale* Lab values
(0..255 domain), ``a = sigma_ref / (sigma_src + eps)`` with eps = 0.6 in
that domain, ``b = (mu_ref - a * mu_src) / 255`` (scaleFactor :1188).
"""

from __future__ import annotations

import jax.numpy as jnp


def _integral(img: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 2-D integral image: I[y, x] = sum img[:y, :x]."""
    s = jnp.cumsum(jnp.cumsum(img.astype(jnp.float32), axis=0), axis=1)
    return jnp.pad(s, ((1, 0), (1, 0)) + ((0, 0),) * (img.ndim - 2))


def window_sums(img: jnp.ndarray, patch_size: int):
    """Clipped-window sums and counts for every pixel.

    img: [H, W, C].  Window for pixel (x, y) is
    [max(x+left,0), min(x+right,W)) x [max(y+left,0), min(y+right,H)) with
    left = -(ps//2), right = ps+left (ref :1185-1202).

    Returns (sums [H, W, C] float32, counts [H, W] float32).
    """
    h, w = img.shape[0], img.shape[1]
    half = patch_size // 2
    left = -half
    right = patch_size + left

    integ = _integral(img)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    sy = jnp.maximum(ys + left, 0)
    ey = jnp.minimum(ys + right, h)
    sx = jnp.maximum(xs + left, 0)
    ex = jnp.minimum(xs + right, w)

    a = integ[ey[:, None], ex[None, :]]
    b = integ[ey[:, None], sx[None, :]]
    c = integ[sy[:, None], ex[None, :]]
    d = integ[sy[:, None], sx[None, :]]
    sums = a - b - c + d
    counts = (
        (ey - sy).astype(jnp.float32)[:, None]
        * (ex - sx).astype(jnp.float32)[None, :]
    )
    return sums, counts


def patch_moments(img_u8: jnp.ndarray, patch_size: int):
    """Per-pixel patch mean and std of a uint8 image, 0..255 domain.

    Equivalent to getValue over table/table2 (ref :1226-1253): mean =
    sum/n, var = max(sum2/n - mean^2, 0), std = sqrt(var).
    Returns (mean [H,W,C], std [H,W,C]) float32.
    """
    x = img_u8.astype(jnp.float32)
    sums, counts = window_sums(x, patch_size)
    sums2, _ = window_sums(x * x, patch_size)
    mean = sums / counts[..., None]
    var = jnp.maximum(sums2 / counts[..., None] - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


def init_ab(
    cnt_lab_u8: jnp.ndarray,
    guide_lab_u8: jnp.ndarray,
    patch_size: int = 3,
    var_epsilon: float = 0.6,
):
    """Initial per-pixel linear transform from patch moments.

    cnt/guide are uint8-scale Lab images on the same (down-res) grid; guide
    is the BDS-voted guidance.  Returns (a [H,W,3], b [H,W,3]) float32 with
    a unitless and b in the unit (0..1) domain (ref :1255-1263).
    """
    mu_s, sd_s = patch_moments(cnt_lab_u8, patch_size)
    mu_r, sd_r = patch_moments(guide_lab_u8, patch_size)
    a = sd_r / (sd_s + var_epsilon)
    b = (mu_r - mu_s * a) / 255.0
    return a, b


def error_confidence(err: jnp.ndarray) -> jnp.ndarray:
    """BDS feature error -> data-term confidence (ref :1302-1357).

    Min-max normalizes err over the image, confidence = max(1 - e, 1e-6).
    """
    lo = jnp.min(err)
    hi = jnp.max(err)
    e = (err - lo) / jnp.maximum(hi - lo, 1e-30)
    return jnp.maximum(1.0 - e, 1e-6)
