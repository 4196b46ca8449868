"""Test harness: run everything on a virtual 8-device CPU mesh.

The CPU backend is the "fake device" of the test matrix (SURVEY §4: Caffe's
CPU mode played this role); multi-chip sharding tests use the 8 virtual
host devices.  Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax before conftest runs, so the env var
# alone cannot win; force the platform through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: pipeline-scale tests recompile identical
# programs across runs otherwise (minutes each).
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
