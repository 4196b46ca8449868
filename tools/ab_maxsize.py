#!/usr/bin/env python
"""Controlled same-process A/B of the MAX_SIZE stage-1 channel subset.

Round-5 finding (PERFORMANCE.md "Cross-process variance caveat"): the
same staged 665x1000 program's warm rate spreads up to ~0.44 s across
PROCESSES on the relayed TPU (worker state; within-process reps are
millisecond-tight), so separate `bench.py 1000` runs CANNOT resolve
sub-300 ms changes.  This harness measures both sides in ONE process:
every jitted program except the two L4 search-per-direction programs is
shared between the variants — the subset is toggled via
``pipeline._STAGE1_SUBSET_PIXELS`` with a ``_match_search_dir_jit``
cache clear, exactly the knob the shipped default keys on.

Reference analogue: `caffe time`'s same-process per-layer repetitions
(/root/reference/code/tools/caffe.cpp, time()).

Usage (on the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_maxsize.py [size]
Set NCT_STAGED_VERBOSE=1 for per-level walls (adds ~0.1 s readout per
level to every rep; keep it off for headline numbers).
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from nct_tpu.utils.compile_cache import enable as _enable

_enable()

SIZE = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1000
_sys.argv = [_sys.argv[0], str(SIZE)]

import bench as _b                                    # noqa: E402
from nct_tpu import pipeline                          # noqa: E402
from nct_tpu.config import Config                     # noqa: E402
from nct_tpu.models import vgg19                      # noqa: E402
from nct_tpu.pipeline import transfer_pair            # noqa: E402


def main():
    cnt, stl = _b.load_pair()
    params = jax.device_put(vgg19.init_params())
    config = Config()
    key = jax.random.PRNGKey(7)
    cnt_d = jax.device_put(jnp.asarray(cnt))
    stl_d = jax.device_put(jnp.asarray(stl))

    def run():
        out = transfer_pair(params, cnt_d, stl_d, 2.0, config, key=key,
                            staged=True)
        return float(jnp.sum(out.astype(jnp.float32)))

    default_thresh = pipeline._STAGE1_SUBSET_PIXELS
    for name, thresh in (("subset(default)", default_thresh),
                         ("full-channels", 10 ** 12)):
        pipeline._STAGE1_SUBSET_PIXELS = thresh
        pipeline._match_search_dir_jit.clear_cache()
        print(f"=== variant {name} (compile pass) ===", flush=True)
        run()
        run()   # drain any post-compile autotune before timing
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = run()
            reps.append(time.perf_counter() - t0)
        print(f"RESULT {name}: reps={[round(r, 3) for r in reps]} "
              f"median={sorted(reps)[1]:.3f} checksum={s:.1f}", flush=True)
    pipeline._STAGE1_SUBSET_PIXELS = default_thresh


if __name__ == "__main__":
    main()
