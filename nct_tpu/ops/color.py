"""BGR <-> CIE Lab conversion with OpenCV uint8 conventions.

The reference does every colour-space hop through OpenCV's 8-bit
``cvtColor(CV_BGR2Lab)`` / ``CV_Lab2BGR`` (reference: ColorTransfer.h:54-60,
ColorTransfer.cpp:1467-1477, main.cu:351-356), so the uint8 Lab encoding
(L*255/100, a+128, b+128) is part of the algorithm's numerics: patch
statistics, epsilons (var_epsilon=0.6) and solver weights all live in that
domain.  We reproduce it in float32 JAX: sRGB gamma, D65 white point, the
classic 0.008856 knee.  OpenCV's fixed-point tables differ from the float
path by <=1 LSB, which is far inside the pipeline's SSIM tolerance.

All functions are jit-friendly and operate on [..., 3] arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


# D65 RGB->XYZ (linear sRGB primaries), rows X,Y,Z — the matrix OpenCV uses.
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875992, 0.041556),
    (0.055648, -0.204043, 1.057311),
)
_XN = 0.950456
_ZN = 1.088754
_T0 = 0.008856          # CIE knee (6/29)^3
_CBRT_KNEE = 7.787      # (1/3)(29/6)^2
_L_SCALE = 903.3        # (29/3)^3


def _srgb_to_linear(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(v > 0.04045, ((v + 0.055) / 1.055) ** 2.4, v / 12.92)


def _linear_to_srgb(v: jnp.ndarray) -> jnp.ndarray:
    v = jnp.maximum(v, 0.0)
    return jnp.where(v > 0.0031308, 1.055 * v ** (1.0 / 2.4) - 0.055, v * 12.92)


def _f_cbrt(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > _T0, jnp.cbrt(t), _CBRT_KNEE * t + 16.0 / 116.0)


def bgr_u8_to_lab_u8(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR -> uint8 Lab, OpenCV conventions (ref CV_BGR2Lab on CV_8UC3).

    Returns uint8 with L in [0,255] (=L*255/100), a/b offset by +128.
    """
    x = bgr.astype(jnp.float32) / 255.0
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    rl, gl, bl = _srgb_to_linear(r), _srgb_to_linear(g), _srgb_to_linear(b)

    m = _RGB2XYZ
    X = (m[0][0] * rl + m[0][1] * gl + m[0][2] * bl) / _XN
    Y = m[1][0] * rl + m[1][1] * gl + m[1][2] * bl
    Z = (m[2][0] * rl + m[2][1] * gl + m[2][2] * bl) / _ZN

    fx, fy, fz = _f_cbrt(X), _f_cbrt(Y), _f_cbrt(Z)
    L = jnp.where(Y > _T0, 116.0 * jnp.cbrt(Y) - 16.0, _L_SCALE * Y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0

    lab = jnp.stack([L * (255.0 / 100.0), a, bb], axis=-1)
    return jnp.clip(jnp.round(lab), 0, 255).astype(jnp.uint8)


def lab_u8_to_bgr_u8(lab: jnp.ndarray) -> jnp.ndarray:
    """uint8 Lab (OpenCV encoding) -> uint8 BGR (ref CV_Lab2BGR on CV_8UC3)."""
    x = lab.astype(jnp.float32)
    L = x[..., 0] * (100.0 / 255.0)
    a = x[..., 1] - 128.0
    b = x[..., 2] - 128.0

    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def f_inv(f):
        return jnp.where(f ** 3 > _T0, f ** 3, (f - 16.0 / 116.0) / _CBRT_KNEE)

    Y = jnp.where(L > _L_SCALE * _T0, fy ** 3, L / _L_SCALE)
    X = f_inv(fx) * _XN
    Z = f_inv(fz) * _ZN

    m = _XYZ2RGB
    rl = m[0][0] * X + m[0][1] * Y + m[0][2] * Z
    gl = m[1][0] * X + m[1][1] * Y + m[1][2] * Z
    bl = m[2][0] * X + m[2][1] * Y + m[2][2] * Z

    r, g, bch = _linear_to_srgb(rl), _linear_to_srgb(gl), _linear_to_srgb(bl)
    bgr = jnp.stack([bch, g, r], axis=-1) * 255.0
    return jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)


def lab_u8_to_unit(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 Lab -> float in [0,1] (ref: cntLab.convertTo(.., 1.0/255.0))."""
    return lab_u8.astype(jnp.float32) / 255.0


def unit_lab_to_bgr_u8(lab_unit: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] Lab -> uint8 Lab -> uint8 BGR (ref ColorTransfer.cpp:1467-1469)."""
    lab_u8 = jnp.clip(jnp.round(lab_unit * 255.0), 0, 255).astype(jnp.uint8)
    return lab_u8_to_bgr_u8(lab_u8)
