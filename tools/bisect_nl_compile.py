#!/usr/bin/env python
"""Bisect the MAX_SIZE nonlocal-solve COMPILE hang (round 3).

The staged sub-split got a 1000 px run through L4 match (5.8 s) and
L4 graph (18.2 s), but the `_solve_nl` program at the full 664x1000
geometry never returns from the remote compile service (>80 min, zero
client CPU — blocked in the compile RPC).  This tool compiles ONE
`_solve_nl` variant per invocation (so the shell can `timeout` it) with
shape-faithful synthetic operands, measuring compile wall time:

  PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
      python tools/bisect_nl_compile.py 1000 mg
  variants: mg        (the default config: multigrid V-cycle precond)
            jacobi    (2x2 block-Jacobi precond, simpler program)
            mg_scan   (fixed-trip scan CG instead of while_loop)
            mg_shallow(multigrid capped at 4 levels)

Compile-only (`.lower().compile()`): no execution, so a hang here is
attributable to the compile service, not the TPU worker.
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import dataclasses

import jax
import jax.numpy as jnp

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu import pipeline
from nct_tpu.utils.compile_cache import enable as enable_compile_cache

SIZE = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1000
VARIANT = _sys.argv[2] if len(_sys.argv) > 2 else "mg"


def main():
    enable_compile_cache()
    # in0.png is 680x452; the bench upscales the long side to SIZE.
    w = SIZE
    h = int(round(452 * SIZE / 680))
    config = Config()
    if VARIANT == "jacobi":
        config = dataclasses.replace(config, nl_precond="block_jacobi")
    elif VARIANT == "mg_tables":
        config = dataclasses.replace(config, nl_transpose="tables")
    elif VARIANT == "mg_scan":
        config = dataclasses.replace(config, cg_dynamic=False)
    elif VARIANT == "mg_shallow":
        from nct_tpu.solve import nonlocal_solve as _nl
        _orig = _nl.make_mg_preconditioner

        def shallow(*a, **k):
            k["max_levels"] = 4
            return _orig(*a, **k)

        _nl.make_mg_preconditioner = shallow

    taps = tuple(config.vgg_layers())
    l = len(taps) - 1           # finest level: down-res == full res
    lh, lw = vgg19.feature_dims(h, w)[taps[0]]

    import numpy as _np

    graph_args = dict(
        config=config, l=l, key=_np.zeros((2,), _np.uint32),
        down_cnt=_np.zeros((h, w, 3), _np.uint8),
        guide_bgr=_np.zeros((h, w, 3), _np.uint8),
        bds_err=_np.zeros((h, w), _np.float32),
        label_map=_np.zeros((lh, lw), _np.int32),
        membership=_np.zeros((config.cluster_num, lh, lw), bool),
    )
    print(f"[nl-bisect] {VARIANT} content {h}x{w} L{l} "
          f"precond={config.nl_precond} dynamic={config.cg_dynamic}",
          flush=True)
    import numpy as np

    if VARIANT in ("loop_only", "loop_scan"):
        # while_loop/scan PCG over a trivial diagonal system at the same
        # [h, w, 3]x2 operand shape — isolates "CG loop at this shape"
        # from "nonlocal system build".
        from nct_tpu.solve import cg as _cg

        def run(x):
            op = lambda u: (2.0 * u[0], 2.0 * u[1])
            pre = lambda r: (0.5 * r[0], 0.5 * r[1])
            return _cg.cg_solve(
                op, (x, x * 2.0), (jnp.zeros_like(x), jnp.zeros_like(x)),
                iters=config.cg_iters_final_mg, tol=config.cg_tol,
                preconditioner=pre, dynamic=(VARIANT == "loop_only"),
            )

        x = np.zeros((h, w, 3), np.float32)
        t0 = time.perf_counter()
        lowered = jax.jit(run).lower(x)
        print(f"[nl-bisect] lowered in {time.perf_counter() - t0:.1f}s "
              f"(HLO {len(lowered.as_text()) // 1000}kB)", flush=True)
        t0 = time.perf_counter()
        lowered.compile()
        print(f"[nl-bisect] COMPILED in {time.perf_counter() - t0:.1f}s",
              flush=True)
        return

    static = dict(config=config, l=l)
    arrs = {k: v for k, v in graph_args.items() if k not in static}
    shapes = jax.eval_shape(
        lambda **kw: pipeline._solve_graph(**static, **kw), **arrs
    )
    if VARIANT in ("sort_only", "searchsorted", "sort_scan", "tables"):
        # the 5.3M-element in-edge table build chain in isolation
        (nbr_ids_s, nbr_w_s, nbr_slots_s, candidates_s, *_r) = shapes
        n = h * w
        k = nbr_ids_s.shape[1]

        def run(slots, wts, cands):
            flat_t = slots.reshape(-1).astype(jnp.int32)
            sort_key = flat_t.astype(jnp.float32) * 16.0 - jnp.clip(
                wts.reshape(-1), 0.0, 15.0)
            order = jnp.argsort(sort_key)
            sorted_t = flat_t[order]
            if VARIANT == "sort_only":
                return sorted_t.sum() + order.sum()
            pos = jnp.arange(n * k, dtype=jnp.int32)
            if VARIANT == "searchsorted":
                seg_first = jnp.searchsorted(
                    sorted_t, sorted_t, side="left"
                ).astype(jnp.int32)
                return (pos - seg_first).sum() + order.sum()
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), sorted_t[1:] != sorted_t[:-1]])
            seg_first = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, pos, 0))
            rank = pos - seg_first
            if VARIANT == "sort_scan":
                return rank.sum() + order.sum()
            in_max = 64
            n_targets = cands.reshape(-1).shape[0]
            keep = rank < in_max
            in_tab = jnp.full((n_targets, in_max), n * k, jnp.int32)
            in_tab = in_tab.at[
                jnp.where(keep, sorted_t, n_targets - 1),
                jnp.where(keep, rank, in_max - 1),
            ].min(jnp.where(keep, order, n * k).astype(jnp.int32))
            keep_by_pair = jnp.zeros((n * k,), bool).at[order].set(keep)
            return in_tab.sum() + keep_by_pair.sum()

        ops = [np.zeros(s.shape, s.dtype) for s in
               (nbr_slots_s, nbr_w_s, candidates_s)]
        t0 = time.perf_counter()
        lowered = jax.jit(run).lower(*ops)
        print(f"[nl-bisect] lowered in {time.perf_counter() - t0:.1f}s "
              f"(HLO {len(lowered.as_text()) // 1000}kB)", flush=True)
        t0 = time.perf_counter()
        lowered.compile()
        print(f"[nl-bisect] COMPILED in {time.perf_counter() - t0:.1f}s",
              flush=True)
        return

    if VARIANT in ("build_only", "build_apply", "build_mg"):
        from nct_tpu.solve import nonlocal_solve as _nl

        (nbr_ids_s, nbr_w_s, nbr_slots_s, candidates_s, a0_s, b0_s,
         conf_s, lab_s, glab_s, _k) = shapes

        def run(lab, glab, conf, ids, wts, slots, cands):
            op, rhs, pre = _nl.make_nonlocal_system(
                lab, glab, conf, ids, wts, 1.0,
                candidates=cands, nbr_slots=slots,
                precond_kind=("mg" if VARIANT == "build_mg"
                              else "block_jacobi"),
                in_cap=config.nl_in_cap,
            )
            if VARIANT == "build_only":
                return rhs
            x = pre(rhs)
            return op(x)

        ops = [np.zeros(s.shape, s.dtype) for s in
               (lab_s, glab_s, conf_s, nbr_ids_s, nbr_w_s, nbr_slots_s,
                candidates_s)]
        t0 = time.perf_counter()
        lowered = jax.jit(run).lower(*ops)
        print(f"[nl-bisect] lowered in {time.perf_counter() - t0:.1f}s "
              f"(HLO {len(lowered.as_text()) // 1000}kB)", flush=True)
        t0 = time.perf_counter()
        lowered.compile()
        print(f"[nl-bisect] COMPILED in {time.perf_counter() - t0:.1f}s",
              flush=True)
        return
    # numpy zeros, NOT jnp: on the relayed backend every jnp.zeros shape
    # is its own remote-compiled program (minutes each).
    (nbr_ids, nbr_w, nbr_slots, candidates, a0, b0, confidence,
     cnt_lab_d, guide_lab_d, _key) = [
        np.zeros(s.shape, s.dtype) for s in shapes
    ]
    ph, pw = vgg19.feature_dims(h, w)[taps[l - 1]]
    prev_ab = (np.zeros((ph, pw, 3), np.float32),
               np.zeros((ph, pw, 3), np.float32))
    print("[nl-bisect] operands built", flush=True)
    t0 = time.perf_counter()
    lowered = pipeline._solve_nl_jit.lower(
        config=config, l=l, numlayer=len(taps), full_hw=(h, w),
        a0=a0, b0=b0, prev_ab=prev_ab, cnt_lab_d=cnt_lab_d,
        guide_lab_d=guide_lab_d, confidence=confidence,
        nbr_ids=nbr_ids, nbr_w=nbr_w, nbr_slots=nbr_slots,
        candidates=candidates,
    )
    print(f"[nl-bisect] lowered in {time.perf_counter() - t0:.1f}s "
          f"(HLO {len(lowered.as_text()) // 1000}kB)", flush=True)
    t0 = time.perf_counter()
    lowered.compile()
    print(f"[nl-bisect] COMPILED in {time.perf_counter() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
