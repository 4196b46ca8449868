"""Debug visualizations (the reference's ENABLE_VIS surface).

TPU-native equivalents of the compiled-out visual-debugging tools
(reference: Config.h:8 ENABLE_VIS; GeneralizedPatchMatch.cu:337-353
``reconstruct_flow``; ColorTransfer.cpp:1128-1177 ``getHeat``; cluster /
coefficient visualisations at ColorTransfer.cpp:223-252 and main.cu:333-421).
All functions are pure jnp and return uint8 BGR images.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# First 64 entries of the reference's 260-colour random list (Config.h:17-52),
# used to paint cluster ids; 0xRRGGBB ints exactly as the reference.
RANDOM_COLOR_LIST = (
    0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF, 0xFF00FF, 0x9F7262,
    0xD31B4B, 0x48AA9E, 0x42FB40, 0x3F21D8, 0x04B383, 0x188C50, 0xDBF8B0,
    0x9C96EA, 0x39C3C3, 0xBF2688, 0x46CBC8, 0xDD979E, 0xC4DC91, 0x9D161C,
    0x87F9F8, 0x135CB6, 0x5DB6EE, 0xE43484, 0xC8A9E3, 0x269B97, 0xEADA0A,
    0x203BC7, 0xF949DC, 0x115C9E, 0x92723C, 0xE06264, 0xACB122, 0xF9E5B2,
    0x953E82, 0x5BF530, 0x398773, 0xDDEAB2, 0x3EC10A, 0x21D7C8, 0xCB0373,
    0x26E79D, 0xD33755, 0x66FAA7, 0x8DC6AC, 0x5630D8, 0x76BA99, 0x3E2816,
    0xEF8475, 0x9E8B07, 0x036A64, 0x578371, 0x6EE4D4, 0xC21A7E, 0x2D9CDF,
    0x5978EE, 0x09AA85, 0x7FFFA7, 0x5E0D31, 0xFA6354, 0xF7FF00, 0x1BF7D7,
    0x5BC6CA,
)


def flow_image(nnf: jnp.ndarray, bh: int, bw: int) -> jnp.ndarray:
    """NNF -> BGR visualization (ref reconstruct_flow :337-353):
    B channel = 255*x/bw, G = 0, R = 255*y/bh."""
    x = nnf[..., 0].astype(jnp.float32)
    y = nnf[..., 1].astype(jnp.float32)
    b = (255.0 * x / bw).astype(jnp.uint8)
    r = (255.0 * y / bh).astype(jnp.uint8)
    g = jnp.zeros_like(b)
    return jnp.stack([b, g, r], axis=-1)


def heat_image(err: jnp.ndarray, vmin: float = 0.0, vmax: float = 1.0):
    """Error map -> BGR heat map, the reference's exact piecewise jet
    colormap (getHeat, ColorTransfer.cpp:1128-1177)."""
    v = jnp.clip(err.astype(jnp.float32), vmin, vmax)
    v = (v - vmin) / (vmax - vmin)

    db = jnp.where(
        v < 0.1242, 0.504 + ((1.0 - 0.504) / 0.1242) * v,
        jnp.where(
            v < 0.3747, 1.0,
            jnp.where(v < 0.6253, (0.6253 - v) / (0.6253 - 0.3747), 0.0),
        ),
    )
    dg = jnp.where(
        v < 0.1242, 0.0,
        jnp.where(
            v < 0.3747, (v - 0.1242) / (0.3747 - 0.1242),
            jnp.where(
                v < 0.6253, 1.0,
                jnp.where(v < 0.8758, (0.8758 - v) / (0.8758 - 0.6253), 0.0),
            ),
        ),
    )
    dr = jnp.where(
        v < 0.3747, 0.0,
        jnp.where(
            v < 0.6253, (v - 0.3747) / (0.6253 - 0.3747),
            jnp.where(
                v < 0.8758, 1.0,
                1.0 - (v - 0.8758) * ((1.0 - 0.504) / (1.0 - 0.8758)),
            ),
        ),
    )
    to_u8 = lambda d: jnp.minimum(255, (255.0 * d).astype(jnp.int32)).astype(jnp.uint8)  # noqa: E731
    return jnp.stack([to_u8(db), to_u8(dg), to_u8(dr)], axis=-1)


def cluster_image(label_map: jnp.ndarray) -> jnp.ndarray:
    """Label map -> BGR id colours (ref visualizeClusterRandom :223-252:
    colVal%256 -> R... wait, the reference unpacks r=val%256, g=(val>>8)%256,
    b=(val>>16)%256 and stores Vec3b(r,g,b) = BGR(r,g,b))."""
    table = np.asarray(RANDOM_COLOR_LIST, dtype=np.uint32)
    r = (table % 256).astype(np.uint8)
    g = ((table >> 8) % 256).astype(np.uint8)
    b = ((table >> 16) % 256).astype(np.uint8)
    bgr = jnp.asarray(np.stack([r, g, b], axis=-1))  # ref stores (r,g,b)
    idx = jnp.clip(label_map, 0, len(RANDOM_COLOR_LIST) - 1)
    return bgr[idx]


def coefficient_images(a: jnp.ndarray, b: jnp.ndarray):
    """(a, b) maps -> BGR visualisations (ref main-loop vis blocks,
    ColorTransfer.cpp:1286-1296): a*50 clamped, b*255+127 clamped."""
    a_vis = jnp.clip((a * 50.0).astype(jnp.int32), 0, 255).astype(jnp.uint8)
    b_vis = jnp.clip(
        (b * 255.0 + 127.0).astype(jnp.int32), 0, 255
    ).astype(jnp.uint8)
    return a_vis, b_vis
