"""SSIM — the rebuild's fidelity metric against reference golden outputs.

The reference's correctness story is eyeballing 9 golden PNGs
(reference: demo/example/res/*.png; SURVEY §4); the rebuild's contract is
SSIM >= 0.98 against them (BASELINE.md).  Standard Wang et al. SSIM:
11x11 Gaussian window (sigma 1.5), K1=0.01, K2=0.03, L=255, computed per
channel on float32 and averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode 2-D correlation per channel. img: [H, W, C]."""
    c = img.shape[-1]
    x = img.transpose(2, 0, 1)[:, None]          # [C, 1, H, W]
    k = kern[None, None]                          # [1, 1, kh, kw]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # TPU convs default to bf16 accumulation; the variance terms
        # (E[x^2] - mu^2) need full f32 or SSIM can exceed 1.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0].transpose(1, 2, 0)


def ssim(a, b, data_range: float = 255.0) -> float:
    """Mean SSIM between two uint8/float [H, W, C] images."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    kern = _gaussian_kernel()
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_a = _filter2(a, kern)
    mu_b = _filter2(b, kern)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    s_aa = _filter2(a * a, kern) - mu_aa
    s_bb = _filter2(b * b, kern) - mu_bb
    s_ab = _filter2(a * b, kern) - mu_ab

    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return float(jnp.mean(num / den))


def psnr(a, b, data_range: float = 255.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))
