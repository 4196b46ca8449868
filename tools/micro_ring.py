#!/usr/bin/env python
"""Micro-benchmark: ring-eval formulations at conv1_1 shapes.

Isolates the window-refine ring substage from the prefix-differencing noise:
(a) 16 narrow per-point gathers (round-2 original), (b) 5 wide strip-table
row gathers, (c) mask+where overhead alone.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.utils.compile_cache import enable as _enable

_enable()

AH, AW, BH, BW, C = 452, 680, 600, 960, 64
NB = BH * BW
RADIUS = 4
RINGS = [
    (r * sx, r * sy)
    for r in (2 * RADIUS, 4 * RADIUS)
    for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                   (1, 1), (1, -1), (-1, 1), (-1, -1))
]
REPS = 3


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    _sync(fn(*args))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + REPS):
        out = fn(*args)
    _sync(out)
    t2 = time.perf_counter() - t0
    print(f"{name}: {max(t2 - t1, 0.0) / REPS * 1000:.1f} ms")


@jax.jit
def narrow(a32, b16, idx0):
    ring_idx = jnp.stack(
        [jnp.clip(idx0 + dy * BW + dx, 0, NB - 1) for dx, dy in RINGS]
    )
    gr = b16.reshape(NB, C)[ring_idx]
    return -jnp.sum(a32[None] * gr, axis=-1, dtype=jnp.float32)


@jax.jit
def wide(a32, b16, idx0):
    ring_dxs = sorted({dx for dx, dy in RINGS})
    ring_dys = sorted({dy for dx, dy in RINGS})
    nrd = len(ring_dxs)
    strip_r = jnp.concatenate(
        [jnp.roll(b16, shift=-dx, axis=1) for dx in ring_dxs], axis=-1
    ).reshape(NB, nrd * C)
    by_dy = {}
    for dy in ring_dys:
        idx = jnp.clip(idx0 + dy * BW, 0, NB - 1)
        g = strip_r[idx.reshape(-1)].reshape(AH, AW, nrd, C)
        d = -jnp.sum(a32[:, :, None, :] * g, axis=-1, dtype=jnp.float32)
        by_dy[dy] = jnp.moveaxis(d, -1, 0)
    col = {dx: i for i, dx in enumerate(ring_dxs)}
    return jnp.stack([by_dy[dy][col[dx]] for dx, dy in RINGS])


@jax.jit
def wide_prebuilt(a32, strip_r, idx0):
    ring_dxs = sorted({dx for dx, dy in RINGS})
    ring_dys = sorted({dy for dx, dy in RINGS})
    nrd = len(ring_dxs)
    by_dy = {}
    for dy in ring_dys:
        idx = jnp.clip(idx0 + dy * BW, 0, NB - 1)
        g = strip_r[idx.reshape(-1)].reshape(AH, AW, nrd, C)
        d = -jnp.sum(a32[:, :, None, :] * g, axis=-1, dtype=jnp.float32)
        by_dy[dy] = jnp.moveaxis(d, -1, 0)
    col = {dx: i for i, dx in enumerate(ring_dxs)}
    return jnp.stack([by_dy[dy][col[dx]] for dx, dy in RINGS])


@jax.jit
def mask_only(d_center, bx0, by0, shifts):
    sdx = shifts[:, 0][:, None, None]
    sdy = shifts[:, 1][:, None, None]
    valid = (
        (bx0[None] + sdx >= 0) & (bx0[None] + sdx < BW)
        & (by0[None] + sdy >= 0) & (by0[None] + sdy < BH)
    )
    return jnp.where(valid, d_center, jnp.inf)


def main():
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.standard_normal((AH, AW, C)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((BH, BW, C)), jnp.bfloat16)
    bx0 = jnp.asarray(rng.integers(0, BW, (AH, AW)), jnp.int32)
    by0 = jnp.asarray(rng.integers(0, BH, (AH, AW)), jnp.int32)
    idx0 = by0 * BW + bx0
    print(f"== ring micro: A {AH}x{AW}, B {BH}x{BW}, C={C} ==")
    timed("narrow_16_gathers", narrow, a32, b16, idx0)
    timed("wide_5_gathers(+build)", wide, a32, b16, idx0)
    ring_dxs = sorted({dx for dx, dy in RINGS})
    strip_r = jnp.concatenate(
        [jnp.roll(b16, shift=-dx, axis=1) for dx in ring_dxs], axis=-1
    ).reshape(NB, len(ring_dxs) * C)
    strip_r = jax.block_until_ready(strip_r)
    timed("wide_5_gathers(prebuilt)", wide_prebuilt, a32, strip_r, idx0)
    nsh = (2 * RADIUS + 1) ** 2 + len(RINGS)
    d_center = jnp.asarray(
        rng.standard_normal((nsh, AH, AW)), jnp.float32)
    dense = [(dx, dy) for dy in range(-RADIUS, RADIUS + 1)
             for dx in range(-RADIUS, RADIUS + 1)]
    shifts = jnp.asarray(dense + RINGS, jnp.int32)
    timed("mask_where_only", mask_only, d_center, bx0, by0, shifts)


if __name__ == "__main__":
    main()
