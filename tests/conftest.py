"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; multi-chip sharding
is validated on host-platform virtual devices (and separately by the
driver's dryrun_multichip)."""
import os
import sys

# The axon TPU-tunnel plugin (loaded by a PYTHONPATH sitecustomize before
# this file runs) breaks XLA:CPU execution.  Tests need the CPU backend
# with virtual devices, so re-exec once with a cleaned environment.
if (".axon_site" in os.environ.get("PYTHONPATH", "")
        and os.environ.get("HTS_TPU_TEST_REEXEC") != "1"):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p)
    env["HTS_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"]
              + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
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
