"""Nearest-neighbour-field lifecycle: init and coarse-to-fine upsampling.

TPU-native replacements for the reference's NNF kernels
(GeneralizedPatchMatch.cu:527-580).  The NNF is an int32 [H, W, 2] array of
(x, y) target coordinates — we drop the reference's ``(y<<12)|x`` packing
and its 4095-pixel coordinate ceiling.
"""

from __future__ import annotations

import jax.numpy as jnp


def _grid(h: int, w: int):
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w))


def init_scaled_identity(ah: int, aw: int, bh: int, bw: int) -> jnp.ndarray:
    """Scaled-identity init (ref init_Ann_kernel :527-544):
    bx = min(int(ax/(aw-1)*(bw-1)), bw-1)."""
    xs, ys = _grid(ah, aw)
    if aw > 1:
        bx = jnp.minimum(
            (xs.astype(jnp.float32) / (aw - 1) * (bw - 1)).astype(jnp.int32),
            bw - 1,
        )
    else:
        bx = jnp.zeros_like(xs)
    if ah > 1:
        by = jnp.minimum(
            (ys.astype(jnp.float32) / (ah - 1) * (bh - 1)).astype(jnp.int32),
            bh - 1,
        )
    else:
        by = jnp.zeros_like(ys)
    return jnp.stack([bx, by], axis=-1)


def upsample(
    nnf_half: jnp.ndarray,
    ah: int,
    aw: int,
    bh: int,
    bw: int,
) -> jnp.ndarray:
    """Coarse-to-fine NNF upsampling preserving match *offsets* scaled by the
    resolution ratio (ref upSample_kernel :546-580)."""
    ah_half, aw_half = nnf_half.shape[0], nnf_half.shape[1]
    aw_ratio = aw / aw_half
    ah_ratio = ah / ah_half

    xs, ys = _grid(ah, aw)
    ax_half = jnp.clip(
        ((xs.astype(jnp.float32) + 0.5) / aw_ratio).astype(jnp.int32),
        0, aw_half - 1,
    )
    ay_half = jnp.clip(
        ((ys.astype(jnp.float32) + 0.5) / ah_ratio).astype(jnp.int32),
        0, ah_half - 1,
    )

    coarse = nnf_half[ay_half, ax_half]          # [ah, aw, 2]
    bx_half = coarse[..., 0].astype(jnp.float32)
    by_half = coarse[..., 1].astype(jnp.float32)

    bx = jnp.floor(
        xs.astype(jnp.float32)
        + (bx_half - ax_half.astype(jnp.float32)) * aw_ratio + 0.5
    ).astype(jnp.int32)
    by = jnp.floor(
        ys.astype(jnp.float32)
        + (by_half - ay_half.astype(jnp.float32)) * ah_ratio + 0.5
    ).astype(jnp.int32)

    bx = jnp.clip(bx, 0, bw - 1)
    by = jnp.clip(by, 0, bh - 1)
    return jnp.stack([bx, by], axis=-1)
