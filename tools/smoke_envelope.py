#!/usr/bin/env python
"""Geometry smoke-test ladder — the release gate for the envelope.

The relayed TPU toolchain has a recurring composition-fault class:
programs whose every constituent runs fine can kernel-fault the worker
or hang the compile service when FUSED at specific geometries (five
instances bisected across rounds 3-4: the >=465x700 _level_match live
set, the 452 px bf16 Pallas-matcher prep, the vmapped mg-WLS hierarchy,
the >=1000 px argsort+scan rank chain, the fused-700 compile hang —
PERFORMANCE.md has the bisections).  Each new instance cost a manual
bisection day, so VERDICT r04 #2 demands a harness: walk the supported
geometry ladder, one warm run per rung with a hard device barrier,
emit a JSON record.  Run it after ANY change to the pipeline's program
structure (new fusion boundaries, solver restructures, envelope
constant changes) and commit the refreshed SMOKE_r0N.json.

Each rung runs in its own SUBPROCESS with a timeout: a kernel fault
must not take down the ladder, and a wedged relay (killed mid-compile
RPC) is waited out with a liveness probe between rungs rather than
re-wedged (CLAUDE.md quirks).  Fused rungs above FUSED_ENVELOPE_PIXELS
are SKIPPED by design — the fused compile at those sizes never returns
(108 min abandoned, round 4), and firing it would wedge the relay.

The reference's analogue is the golden demo run as de-facto regression
gate (reference: demo/run.bat walking all pairs through the driver).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_envelope.py \
      --out SMOKE_r05.json
  ... --sizes 256 452            # subset ladder
  ... --rung 452 fused           # single rung (internal / debugging)
  ... --batch 452                # include the vmapped batch-of-2 probe
"""

import argparse
import json
import os as _os
import subprocess
import sys as _sys
import time

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

LADDER = (256, 452, 680, 700, 1000)
RUNG_TIMEOUT_S = 3600          # staged MAX_SIZE warmup compiles ~25 min
PROBE_TIMEOUT_S = 120
WEDGE_WAIT_S = 1500


def _run_rung(size: int, mode: str) -> int:
    """Child process: one geometry/mode, one warm run, hard barrier."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nct_tpu.config import Config
    from nct_tpu.models import vgg19
    from nct_tpu.pipeline import transfer_pair, transfer_pair_jit
    from nct_tpu.utils.compile_cache import enable

    enable()
    # borrow bench.py's pair loader (repo root is on sys.path); bench
    # parses sys.argv at import time, so hand it a clean one
    _sys.argv = [_sys.argv[0]]
    import bench as _b
    _b.BENCH_MAX_SIZE = size
    _b.BENCH_UPSCALE = True
    cnt, stl = _b.load_pair()

    params = jax.device_put(vgg19.init_params())
    config = Config()
    key = jax.random.PRNGKey(7)
    cnt_d = jax.device_put(cnt)
    stl_d = jax.device_put(stl)

    t0 = time.perf_counter()
    if mode == "fused":
        out = transfer_pair_jit(params, cnt_d, stl_d, 2.0, key, config)
    elif mode == "staged":
        out = transfer_pair(params, cnt_d, stl_d, 2.0, config, key=key,
                            staged=True)
    elif mode == "batch":
        from nct_tpu.parallel.batch import make_batch_transfer

        fn = make_batch_transfer(config, mode="vmap")
        cnt_b = jnp.broadcast_to(cnt_d[None], (2,) + cnt_d.shape)
        stl_b = jnp.broadcast_to(stl_d[None], (2,) + stl_d.shape)
        keys = jnp.broadcast_to(key[None], (2,) + key.shape)
        out = fn(params, cnt_b, stl_b, keys, 2.0)
    else:
        raise ValueError(mode)
    # hard device barrier: scalar D2H readout (block_until_ready is a
    # no-op on the relay)
    checksum = float(jnp.sum(out.astype(jnp.float32)))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    # second run = the warm figure (first includes the compile)
    if mode == "fused":
        out = transfer_pair_jit(params, cnt_d, stl_d, 2.0, key, config)
    elif mode == "staged":
        out = transfer_pair(params, cnt_d, stl_d, 2.0, config, key=key,
                            staged=True)
    else:
        out = fn(params, cnt_b, stl_b, keys, 2.0)
    checksum2 = float(jnp.sum(out.astype(jnp.float32)))
    print(json.dumps({
        "ok": True, "size": size, "mode": mode,
        "geometry": f"{cnt.shape[1]}x{cnt.shape[0]}",
        "compile_plus_run_s": round(warm, 2),
        "warm_s": round(time.perf_counter() - t0, 3),
        "deterministic": bool(abs(checksum - checksum2) < 1e-3
                              * max(abs(checksum), 1.0)),
    }))
    return 0


def _probe_alive() -> bool:
    """Cheap relay liveness probe with a hard deadline."""
    try:
        r = subprocess.run(
            [_sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True, timeout=PROBE_TIMEOUT_S,
            env=_os.environ.copy(),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rung", nargs=2, metavar=("SIZE", "MODE"),
                    default=None, help="internal: run one rung inline")
    ap.add_argument("--sizes", type=int, nargs="*", default=list(LADDER))
    ap.add_argument("--batch", type=int, nargs="*", default=[],
                    help="sizes at which to also smoke the vmapped batch")
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=RUNG_TIMEOUT_S)
    args = ap.parse_args(argv)

    if args.rung:
        return _run_rung(int(args.rung[0]), args.rung[1])

    from nct_tpu.pipeline import FUSED_ENVELOPE_PIXELS

    # rung list: fused within the envelope, staged everywhere
    rungs = []
    for size in args.sizes:
        # content pixels ~ size * size*452/680 for the demo aspect ratio
        approx_px = int(size * size * 452 / 680)
        if approx_px <= FUSED_ENVELOPE_PIXELS:
            rungs.append((size, "fused"))
        rungs.append((size, "staged"))
    for size in args.batch:
        rungs.append((size, "batch"))

    results = []
    for size, mode in rungs:
        print(f"[smoke] {size}px {mode} ...", flush=True)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [_sys.executable, _os.path.abspath(__file__),
                 "--rung", str(size), mode],
                capture_output=True, text=True, timeout=args.timeout,
                env=_os.environ.copy(), cwd=_REPO,
            )
            line = (r.stdout.strip().splitlines() or [""])[-1]
            if r.returncode == 0 and line.startswith("{"):
                rec = json.loads(line)
            else:
                rec = {"ok": False, "size": size, "mode": mode,
                       "error": (r.stderr or r.stdout)[-800:],
                       "returncode": r.returncode}
        except subprocess.TimeoutExpired:
            rec = {"ok": False, "size": size, "mode": mode,
                   "error": f"timeout after {args.timeout}s "
                            "(compile hang or wedged relay)"}
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(rec)
        print(f"[smoke] -> {json.dumps(rec)}", flush=True)
        if not rec["ok"]:
            # a faulted/kill-9'd client can wedge the relay; wait it out
            # before the next rung instead of re-wedging it
            deadline = time.time() + WEDGE_WAIT_S
            while time.time() < deadline and not _probe_alive():
                print("[smoke] relay unresponsive; waiting 60s ...",
                      flush=True)
                time.sleep(60)

    report = {
        "ladder": results,
        "all_ok": all(r["ok"] for r in results),
        "fused_envelope_pixels": FUSED_ENVELOPE_PIXELS,
    }
    print(json.dumps({"all_ok": report["all_ok"],
                      "rungs": len(results)}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0 if report["all_ok"] else 1


if __name__ == "__main__":
    _sys.exit(main())
