#!/usr/bin/env python
"""Micro-profiles: chip calibration + piecewise timing of the slow stages."""

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


def timed(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1000:.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)

    print("== calibration ==")
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    mm = jax.jit(lambda x, y: (x @ y).astype(jnp.bfloat16))
    timed("matmul4096_bf16 (137 GFLOP)", mm, a, b)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    mmf = jax.jit(lambda x, y: x @ y)
    timed("matmul4096_f32", mmf, af, bf)
    big = jnp.asarray(rng.standard_normal((64, 1024, 1024)), jnp.float32)
    timed("elementwise mul+sum 256MB", jax.jit(lambda x: jnp.sum(x * x)), big)

    print("== conv calibration (conv4_2-ish) ==")
    x = jnp.asarray(rng.standard_normal((1, 57, 85, 512)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 512, 512)), jnp.bfloat16)
    conv = jax.jit(functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ))
    timed("conv 57x85x512->512 bf16 (22.9 GFLOP)", conv, x, w)
    xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
    timed("conv 57x85x512->512 f32", conv, xf, wf)

    print("== nonlocal CG pieces at L4 (452x680, k=8) ==")
    h, w_ = 452, 680
    n, k = h * w_, 8
    u = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    pw = jnp.asarray(rng.uniform(0.1, 1, (n, k)), jnp.float32)
    flat = ids.reshape(-1)
    order = jnp.argsort(flat)
    sids = flat[order]

    timed("gather u[ids] [N,8,6]", jax.jit(lambda u, i: u[i]), u, ids)

    def scatter_sorted(u, ids, pw, order, sids):
        uj = u[ids]
        diff = (u[:, None, :] - uj) * pw[..., None]
        out = jnp.sum(diff, axis=1)
        contrib = diff.reshape(n * k, -1)[order]
        return out.at[sids].add(contrib, indices_are_sorted=True)

    timed("nl apply sorted-scatter", jax.jit(scatter_sorted),
          u, ids, pw, order, sids)

    def scatter_unsorted(u, ids, pw):
        uj = u[ids]
        diff = (u[:, None, :] - uj) * pw[..., None]
        out = jnp.sum(diff, axis=1)
        return out.at[ids.reshape(-1)].add(-diff.reshape(n * k, -1))

    timed("nl apply unsorted-scatter", jax.jit(scatter_unsorted), u, ids, pw)

    x2 = jnp.asarray(rng.standard_normal((h, w_, 3)), jnp.float32)
    gx = jnp.asarray(rng.uniform(0.1, 1, (h, w_)), jnp.float32)

    def lap(xx, g):
        out = jnp.zeros_like(xx)
        dxe = (xx[:, :-1] - xx[:, 1:]) * g[:, :-1, None]
        out = out.at[:, :-1].add(dxe)
        out = out.at[:, 1:].add(-dxe)
        dye = (xx[:-1, :] - xx[1:, :]) * g[:-1, :, None]
        out = out.at[:-1, :].add(dye)
        out = out.at[1:, :].add(-dye)
        return out

    timed("laplacian apply", jax.jit(lap), x2, gx)
    timed("argsort 2.4M", jax.jit(lambda f: jnp.argsort(f)), flat)

    print("== knn pieces at L4 ==")
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, n, (2048,)), jnp.int32)

    def knn_chunk(qc, cand_ids, colors):
        cc = colors[cand_ids]                       # [B, M, 3]
        d = jnp.sum((cc - qc[:, None, :]) ** 2, -1)
        work = d
        outs = []
        for _ in range(8):
            j = jnp.argmin(work, axis=1)
            cid = jnp.take_along_axis(cand_ids, j[:, None], 1)[:, 0]
            outs.append(cid)
            work = jnp.where(cand_ids == cid[:, None], jnp.inf, work)
        return jnp.stack(outs, 1)

    qc = jnp.asarray(rng.uniform(0, 1, (2048, 3)), jnp.float32)
    cand2 = jnp.asarray(rng.integers(0, n, (2048, 2048)), jnp.int32)
    timed("knn one chunk (B=2048,M=2048)",
          jax.jit(knn_chunk), qc, cand2, colors)
    timed("gather colors[cand2] [2048,2048,3]",
          jax.jit(lambda c, i: c[i]), colors, cand2)

    print("== patchmatch single eval at L4 bf16 ==")
    hb, wb, c = 600, 960, 64
    pbf = jnp.asarray(
        rng.standard_normal((hb * wb, 9, c)), jnp.bfloat16
    )
    pa = jnp.asarray(
        rng.standard_normal((h, w_, 9, c)), jnp.bfloat16
    )
    flat_i = jnp.asarray(rng.integers(0, hb * wb, (h, w_)), jnp.int32)

    def one_eval(pa, pbf, flat_i):
        g = pbf[flat_i]
        return jnp.einsum("hwkc,hwkc->hw", pa, g,
                          preferred_element_type=jnp.float32)

    timed("pm gather+einsum eval", jax.jit(one_eval), pa, pbf, flat_i)


if __name__ == "__main__":
    main()
