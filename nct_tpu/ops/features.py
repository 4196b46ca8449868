"""Feature normalization for correspondence search.

TPU-native equivalents of the reference host/cuBLAS routines ``norm`` and
``norm1`` (reference: GeneralizedPatchMatch.cu:237-335): per-pixel L2
normalization across channels, plus the min-max-normalized response map the
pipeline threads through (unused downstream, kept for parity and vis).

Features are [H, W, C] (NHWC without batch), not the reference's CHW planes.
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(feat: jnp.ndarray, eps: float = 1e-12):
    """Per-pixel channel L2 normalization (ref ``norm``, C > 3 path).

    Returns (normalized [H,W,C], response [H,W]) where response is the
    min-max normalized L2 magnitude (ref GeneralizedPatchMatch.cu:257-272).
    """
    f32 = feat.astype(jnp.float32)
    mag = jnp.sqrt(jnp.sum(f32 * f32, axis=-1))
    normalized = (f32 / jnp.maximum(mag, eps)[..., None]).astype(feat.dtype)
    lo, hi = jnp.min(mag), jnp.max(mag)
    response = (mag - lo) / jnp.maximum(hi - lo, eps)
    return normalized, response


def max_normalize(feat: jnp.ndarray, eps: float = 1e-12):
    """Global max normalization (ref ``norm1``, used when C <= 3).

    Divides by the element of largest |value| (cublasIsamax semantics).
    Returns (normalized, response) with the same response map as ``norm``.
    """
    f32 = feat.astype(jnp.float32)
    mag = jnp.sqrt(jnp.sum(f32 * f32, axis=-1))
    lo, hi = jnp.min(mag), jnp.max(mag)
    response = (mag - lo) / jnp.maximum(hi - lo, eps)
    flat = jnp.reshape(f32, (-1,))
    max_val = flat[jnp.argmax(jnp.abs(flat))]
    normalized = (f32 / jnp.where(jnp.abs(max_val) < eps, 1.0, max_val))
    return normalized.astype(feat.dtype), response


def cosine_error(a_norm: jnp.ndarray, b_norm: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel matching error ``-<a, b>`` over channels
    (ref ``feature_distance`` kernel, GeneralizedPatchMatch.cu:833-855)."""
    return -jnp.sum(
        a_norm.astype(jnp.float32) * b_norm.astype(jnp.float32), axis=-1
    )
