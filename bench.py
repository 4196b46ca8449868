#!/usr/bin/env python
"""End-to-end benchmark: full 5-level pipeline on one demo-scale pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is end-to-end megapixels/sec/chip on the full progressive pipeline
(BASELINE.md north star).  The baseline rate is the rebuild target from
BASELINE.json — a 700 px pair (~0.33 MP) through all 5 levels in 2 s on one
chip, i.e. 0.163 MP/s — so vs_baseline > 1 means faster than target.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.config import Config
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.models import vgg19
from nct_tpu.pipeline import transfer_pair_jit
from nct_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

DEMO = "/root/reference/demo/example/in"
BASELINE_MPS = (700 * 466 / 1e6) / 2.0  # 700px pair in 2 s (BASELINE.md)
# optional argv size (e.g. `bench.py 1000` for the MAX_SIZE configuration;
# sizes above the demo assets upscale).  The driver's no-arg invocation
# keeps the demo pair's native 680x452 — the round-1 headline geometry —
# by capping (never upscaling) at the default, exactly like the CLI does.
BENCH_MAX_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 700
BENCH_UPSCALE = len(sys.argv) > 1
BENCH_FORCE_STAGED = "staged" in sys.argv[2:]
BENCH_FORCE_FUSED = "fused" in sys.argv[2:]


def _fit_to_size(img: np.ndarray, size: int) -> np.ndarray:
    """Cap to `size` — and for bench geometries LARGER than the demo
    assets, upscale so the long side hits `size` exactly (the reference
    only ever downscales, main.cu:499-522; upscale is bench-only)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if max(h, w) >= size or not BENCH_UPSCALE:
        return np.asarray(cap_max_size(img, size))
    from nct_tpu.ops.resize import resize_bilinear
    import jax.numpy as _jnp
    scale = size / max(h, w)
    out = resize_bilinear(
        _jnp.asarray(img), int(round(h * scale)), int(round(w * scale))
    )
    return np.asarray(out).astype(np.uint8)


def load_pair():
    cnt_p = os.path.join(DEMO, "in0.png")
    stl_p = os.path.join(DEMO, "tar0.png")
    if os.path.exists(cnt_p) and os.path.exists(stl_p):
        cnt = _fit_to_size(imread_bgr(cnt_p), BENCH_MAX_SIZE)
        stl = _fit_to_size(imread_bgr(stl_p), BENCH_MAX_SIZE)
    else:  # synthetic fallback at demo-pair geometry
        rng = np.random.default_rng(0)
        cnt = rng.integers(0, 256, (452, 680, 3)).astype(np.uint8)
        stl = rng.integers(0, 256, (600, 960, 3)).astype(np.uint8)
    return cnt, stl


def _devices_or_die(timeout_s: float = 900.0):
    """Fail FAST when the relay is down instead of hanging forever.

    The axon PJRT plugin retries its first device RPC indefinitely; if
    the relay/terminal process has died (observed: terminal-side compile
    OOM takes it down, CLAUDE.md quirks), `jax.devices()` never returns
    and the whole bench run hangs.  Probe it on a daemon thread with a
    hard deadline and emit an honest infra-failure JSON line on timeout.
    """
    import threading

    box: dict = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            box["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in box:
        return box["devices"]
    print(json.dumps({
        "metric": "e2e_megapixels_per_sec",
        "value": 0.0,
        "unit": "INFRA FAILURE: device discovery timed out "
                f"({box.get('error', 'relay unreachable')})",
        "vs_baseline": 0.0,
    }))
    os._exit(2)


def main() -> None:
    _devices_or_die()
    cnt, stl = load_pair()
    # Fused vs staged: same rule as the CLI — the fused whole-pipeline
    # program is known-safe only below FUSED_ENVELOPE_PIXELS of content
    # (larger fused programs kernel-fault the relayed worker or OOM the
    # remote compile service; see pipeline.py).
    from nct_tpu.pipeline import FUSED_ENVELOPE_PIXELS

    BENCH_STAGED = not BENCH_FORCE_FUSED and (
        BENCH_FORCE_STAGED
        or cnt.shape[0] * cnt.shape[1] > FUSED_ENVELOPE_PIXELS
    )
    # device_put once: numpy params would re-upload ~80 MB per call
    params = jax.device_put(vgg19.init_params())
    config = Config()
    key = jax.random.PRNGKey(7)

    cnt_d = jax.device_put(cnt)
    stl_d = jax.device_put(stl)

    from nct_tpu.pipeline import transfer_pair

    def run():
        if BENCH_STAGED:
            out = transfer_pair(
                params, cnt_d, stl_d, 2.0, config, key=key, staged=True
            )
        else:
            out = transfer_pair_jit(params, cnt_d, stl_d, 2.0, key, config)
        # block_until_ready is a no-op on relayed backends; a scalar D2H
        # readout is the only reliable completion barrier.
        return float(jnp.sum(out.astype(jnp.float32)))

    try:
        run()  # warmup: compile + drain
    except Exception as e:  # noqa: BLE001
        # A fused-run kernel fault must degrade to a bench number, not
        # an infra failure: fall back to the staged per-level programs
        # (same math; the CLI has the same fallback, cli.py) after the
        # relayed worker restarts.
        if BENCH_STAGED or BENCH_FORCE_FUSED:
            raise
        print(f"# fused run failed ({type(e).__name__}); "
              "falling back to staged", file=sys.stderr, flush=True)
        BENCH_STAGED = True
        deadline = time.time() + 1200
        while time.time() < deadline:
            try:
                jax.devices()
                run()
                break
            except Exception:  # noqa: BLE001
                time.sleep(60)
        else:
            raise
    # subtract the fixed readout/rpc latency via a trivial program
    tiny = jax.jit(lambda x: x + 1)(jnp.zeros((), jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(tiny))
    readout = time.perf_counter() - t0
    # 3 timed reps: the relay adds ~0.5 s day-dependent jitter at the
    # headline geometry (PERFORMANCE.md), so report the median and keep
    # the raw reps in the JSON for the round-over-round record.
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        reps.append(max(time.perf_counter() - t0 - readout, 1e-3))
    dt = sorted(reps)[1]

    mp = cnt.shape[0] * cnt.shape[1] / 1e6
    mps = mp / dt

    # Sustained-throughput cross-check: ONE scan-of-4 dispatch (a single
    # program running the fused per-pair body 4x sequentially) bounds the
    # true device time without the per-call relay overhead credit.
    scan_mps = None
    if not BENCH_STAGED and os.environ.get("NCT_BENCH_SCAN", "1") != "0":
        from nct_tpu.parallel.batch import make_batch_transfer

        batch_fn = make_batch_transfer(config, mode="scan")
        cnt_b = jnp.broadcast_to(cnt_d[None], (4,) + cnt_d.shape)
        stl_b = jnp.broadcast_to(stl_d[None], (4,) + stl_d.shape)
        keys = jnp.broadcast_to(key[None], (4,) + key.shape)
        out_b = batch_fn(params, cnt_b, stl_b, keys, 2.0)
        float(jnp.sum(out_b.astype(jnp.float32)))  # warmup compile + drain
        t0 = time.perf_counter()
        out_b = batch_fn(params, cnt_b, stl_b, keys, 2.0)
        float(jnp.sum(out_b.astype(jnp.float32)))
        scan_dt = max(time.perf_counter() - t0 - readout, 1e-3)
        scan_mps = round(4 * mp / scan_dt, 4)

    # MFU / roofline accounting (VERDICT r04 #5): analytic FLOP + HBM
    # byte counts for this exact geometry (nct_tpu/utils/flops.py; the
    # matmul-stage counts are exact, the solver stages first-order)
    from nct_tpu.utils import flops as flops_mod

    counts = flops_mod.pipeline_counts(
        cnt.shape[0], cnt.shape[1], stl.shape[0], stl.shape[1], config)
    total = counts["total"]
    print(json.dumps({
        "metric": "e2e_megapixels_per_sec",
        "value": round(mps, 4),
        "unit": f"MP/s/chip (pair {cnt.shape[1]}x{cnt.shape[0]}, 5 levels, "
                f"median {dt:.2f}s)",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
        "median_s": round(dt, 4),
        "reps_s": [round(r, 4) for r in reps],
        "scan_mps": scan_mps,
        "analytic_gflops": round(total["flops"] / 1e9, 1),
        "analytic_hbm_gb": round(total["bytes"] / 1e9, 3),
        "mfu": round(flops_mod.mfu(total["flops"], dt), 5),
        "hbm_frac": round(
            total["bytes"] / (dt * flops_mod.V5E_HBM_BW), 4),
    }))


if __name__ == "__main__":
    main()
