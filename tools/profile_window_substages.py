#!/usr/bin/env python
"""Substage TPU timing inside ops/window_refine.py at conv1_1 shapes.

The window refinement is the largest remaining pipeline stage; this tool
splits it into cumulative prefixes (strip build -> centre rows -> rings ->
box-sum -> shortlist -> rescore) and reports the differenced cost of each
substage.  Prefix timing (rather than isolated substage jits) keeps XLA's
fusion behaviour identical to the real kernel: each prefix returns a small
reduction of exactly the intermediates that are live at that point, so the
compiler cannot dead-code-eliminate the work being measured, and fusion
across substage boundaries shows up as a negative-ish delta instead of
being silently double-counted.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python
tools/profile_window_substages.py [level]
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

from nct_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from nct_tpu.config import Config
from nct_tpu.ops import features, nnf
from nct_tpu.ops.patchmatch import patchify

LEVELS = {   # (ah, aw, bh, bw, C)
    3: (226, 340, 300, 480, 128),
    4: (452, 680, 600, 960, 64),
}
REPS = 3


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + REPS):
        out = fn(*args)
    _sync(out)
    t2 = time.perf_counter() - t0
    dt = max(t2 - t1, 0.0) / REPS
    print(f"{name}: {dt*1000:.1f} ms")
    return dt


def make_prefix(stop, radius, shortlist, patch_size):
    """Build a jitted function computing window_refine up to `stop`.

    stops: strip, center, rings, boxsum, shortlist, rescore (= full).
    Mirrors ops/window_refine.py line for line; any edit there must be
    reflected here for the differences to stay meaningful.
    """

    @functools.partial(jax.jit, static_argnames=())
    def fn(a_norm, b_norm, nnf0):
        ha, wa, c = a_norm.shape
        hb, wb, _ = b_norm.shape
        nb = hb * wb
        a32 = a_norm.astype(jnp.bfloat16)
        b16 = b_norm.astype(jnp.bfloat16)
        dxs = list(range(-radius, radius + 1))
        dense = [(dx, dy) for dy in dxs for dx in dxs]
        rings = [
            (r * sx, r * sy)
            for r in (2 * radius, 4 * radius)
            for sx, sy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                           (1, 1), (1, -1), (-1, 1), (-1, -1))
        ]
        shift_list = dense + rings
        shifts = jnp.asarray(shift_list, dtype=jnp.int32)
        n_shifts = len(shift_list)
        nd = len(dxs)
        bx0 = nnf0[..., 0]
        by0 = nnf0[..., 1]
        idx0 = by0 * wb + bx0

        strip = jnp.concatenate(
            [jnp.roll(b16, shift=-dx, axis=1) for dx in dxs], axis=-1
        ).reshape(nb, nd * c)
        if stop == "strip":
            return jnp.sum(strip.astype(jnp.float32))

        d_rows = []
        for dy in dxs:
            idx = jnp.clip(idx0 + dy * wb, 0, nb - 1)
            g = strip[idx.reshape(-1)].reshape(ha, wa, nd, c)
            d = -jnp.sum(a32[:, :, None, :] * g, axis=-1,
                         dtype=jnp.float32)
            d_rows.append(jnp.moveaxis(d, -1, 0))
        if stop == "center":
            return sum(jnp.sum(d) for d in d_rows)

        ring_idx = jnp.stack(
            [jnp.clip(idx0 + dy * wb + dx, 0, nb - 1) for dx, dy in rings]
        )
        gr = b16.reshape(nb, c)[ring_idx]
        d_rows.append(-jnp.sum(a32[None] * gr, axis=-1, dtype=jnp.float32))
        d_center = jnp.concatenate(d_rows, axis=0)
        sdx = shifts[:, 0][:, None, None]
        sdy = shifts[:, 1][:, None, None]
        valid = (
            (bx0[None] + sdx >= 0) & (bx0[None] + sdx < wb)
            & (by0[None] + sdy >= 0) & (by0[None] + sdy < hb)
        )
        d_center = jnp.where(valid, d_center, jnp.inf)
        if stop == "rings":
            return jnp.sum(jnp.where(valid, d_center, 0.0))

        finite = jnp.isfinite(d_center)
        win = (1, patch_size, patch_size)
        num = jax.lax.reduce_window(
            jnp.where(finite, d_center, 0.0), 0.0, jax.lax.add,
            win, (1, 1, 1), "SAME",
        )
        cnt = jax.lax.reduce_window(
            finite.astype(jnp.float32), 0.0, jax.lax.add,
            win, (1, 1, 1), "SAME",
        )
        d_patch = jnp.where(cnt > 0, num / cnt, jnp.inf)
        if stop == "boxsum":
            return jnp.sum(jnp.where(cnt > 0, d_patch, 0.0))

        s_count = min(shortlist, n_shifts)
        work = d_patch
        picks = []
        for _ in range(s_count):
            j = jnp.argmin(work, axis=0)
            picks.append(j)
            onehot = (
                jnp.arange(n_shifts, dtype=jnp.int32)[:, None, None]
                == j[None]
            )
            work = jnp.where(onehot, jnp.inf, work)
        if stop == "shortlist":
            return sum(jnp.sum(j) for j in picks)

        pa, pam = patchify(a32, patch_size)
        pb, pbm = patchify(b_norm.astype(jnp.bfloat16), patch_size)
        k = pa.shape[2]
        pa_f = pa.reshape(ha, wa, k * c)
        pb_flat = pb.reshape(nb, k * c)
        pam_f = pam.astype(jnp.bfloat16)
        pbm_flat = pbm.astype(jnp.bfloat16).reshape(nb, k)

        def full_eval(cand_x, cand_y):
            flat = jnp.clip(cand_y * wb + cand_x, 0, nb - 1)
            g = pb_flat[flat]
            gm = pbm_flat[flat]
            num = -jnp.einsum(
                "hwd,hwd->hw", pa_f, g,
                preferred_element_type=jnp.float32,
            )
            cnt = jnp.einsum(
                "hwk,hwk->hw", pam_f, gm,
                preferred_element_type=jnp.float32,
            )
            return jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), 1.0)

        best_x, best_y = bx0, by0
        best_d = full_eval(bx0, by0)
        for j in picks:
            sx = shifts[:, 0][j]
            sy = shifts[:, 1][j]
            cx = jnp.clip(bx0 + sx, 0, wb - 1)
            cy = jnp.clip(by0 + sy, 0, hb - 1)
            d = full_eval(cx, cy)
            better = d < best_d
            best_x = jnp.where(better, cx, best_x)
            best_y = jnp.where(better, cy, best_y)
            best_d = jnp.where(better, d, best_d)
        return (jnp.sum(best_x) + jnp.sum(best_y)
                + jnp.sum(best_d))

    return fn


def main():
    lvl = int(_sys.argv[1]) if len(_sys.argv) > 1 else 4
    ah, aw, bh, bw, c = LEVELS[lvl]
    cfg = Config()
    rng = np.random.default_rng(0)
    fa = jnp.asarray(rng.standard_normal((ah, aw, c)), jnp.bfloat16)
    fb = jnp.asarray(rng.standard_normal((bh, bw, c)), jnp.bfloat16)
    fa_n, _ = features.l2_normalize(fa)
    fb_n, _ = features.l2_normalize(fb)
    ann0 = nnf.init_scaled_identity(ah, aw, bh, bw)

    print(f"== window_refine substages, level {lvl}: "
          f"A {ah}x{aw}, B {bh}x{bw}, C={c}, "
          f"radius={cfg.window_radius}, shortlist={cfg.window_shortlist} ==")
    stops = ["strip", "center", "rings", "boxsum", "shortlist", "rescore"]
    prev = 0.0
    for stop in stops:
        fn = make_prefix(
            stop, cfg.window_radius, cfg.window_shortlist, cfg.patch_size
        )
        dt = timed(f"prefix:{stop}", fn, fa_n, fb_n, ann0)
        print(f"   substage {stop}: {max(dt - prev, 0.0)*1000:.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
