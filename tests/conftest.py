"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; multi-chip sharding
is validated on host-platform virtual devices (and separately by the
driver's dryrun_multichip)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_TEST = "/root/reference/test"


@pytest.fixture(scope="session")
def ref_test_dir():
    if not os.path.isdir(REF_TEST):
        pytest.skip("reference test corpus not available")
    return REF_TEST


def ref_path(*parts):
    return os.path.join(REF_TEST, *parts)


def has_ref(*parts) -> bool:
    return os.path.exists(ref_path(*parts))
