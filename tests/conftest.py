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


@pytest.fixture(scope="session")
def demo_dir():
    path = os.path.join(REFERENCE_DIR, "demo", "example")
    if not os.path.isdir(path):
        pytest.skip("reference demo assets not available")
    return path


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
