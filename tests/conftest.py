"""Test harness: run everything on a virtual 8-device CPU mesh.

The CPU backend is the "fake device" of the test matrix (SURVEY §4: Caffe's
CPU mode played this role); multi-chip sharding tests use the 8 virtual
host devices.  Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen has segfaulted flakily under the
    # suite's cumulative compile load (SIGSEGV inside
    # backend_compile_and_load after ~50 tests, three different tests);
    # the box is single-core, so serializing codegen costs nothing.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize imports jax before conftest runs, so the env var
# alone cannot win; force the platform through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: a no-op on the CPU backend these tests
# force — XLA:CPU AOT deserialization can abort the process (see
# utils/compile_cache.py) — but kept so a TPU-backed test invocation
# would still get cached remote compiles.
from nct_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"

# Each JIT'd XLA:CPU executable pins multiple anonymous mappings for code
# and constants; the suite's ~60 pipeline-scale compiles in one process
# have segfaulted inside backend_compile_and_load (three times, three
# different tests, always after ~50 tests) — the profile of address-space
# / mapping exhaustion rather than a code bug, since every crashing test
# passes standalone.  Relief valve: drop all cached executables whenever
# the process's mapping count crosses half the default vm.max_map_count.
# Costs a recompile for later tests that shared a program; a tiny price
# for a suite that finishes.
_MAPS_RELIEF_THRESHOLD = 32_000


def _n_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # pragma: no cover - non-Linux
        return 0


@pytest.fixture(autouse=True)
def _map_pressure_relief(request):
    yield
    n = _n_maps()
    if os.environ.get("NCT_LOG_MAPS"):
        with open("/tmp/nct_maps.log", "a") as f:
            f.write(f"{n}\t{request.node.nodeid}\n")
    if n > _MAPS_RELIEF_THRESHOLD:
        jax.clear_caches()


@pytest.fixture(scope="session")
def demo_dir():
    path = os.path.join(REFERENCE_DIR, "demo", "example")
    if not os.path.isdir(path):
        pytest.skip("reference demo assets not available")
    return path


@pytest.fixture()
def rng():
    """Function-scoped: every test sees the same stream regardless of
    which tests ran before it (a session-scoped generator made test data
    depend on suite order, producing order-dependent 'flaky' failures)."""
    return np.random.default_rng(0)
