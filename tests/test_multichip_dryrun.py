"""Driver-entry multichip dryrun must pass (VERDICT round 1, missing #1).

The driver validates multi-chip sharding by calling
``__graft_entry__.dryrun_multichip(8)`` — in its environment jax sees ONE
real TPU, so the entry must self-provision a virtual CPU mesh.  Here the
conftest already provides 8 virtual CPU devices, exercising the in-process
path; the subprocess self-provisioning path is covered by shrinking the
visible device budget check (monkeypatched) in the second test.
"""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_in_process():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess(monkeypatch):
    """Force the self-provisioning branch: pretend the ambient backend has
    fewer devices than requested and verify the subprocess re-exec works."""
    real_devices = jax.devices()

    def one_device():
        return real_devices[:1]

    monkeypatch.setattr(graft.jax, "devices", one_device)
    # ask for 2 virtual devices to keep the subprocess compile small
    graft.dryrun_multichip(2)
