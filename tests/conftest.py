"""Test configuration.

JAX tests target a virtual 8-device CPU mesh.  In environments where the
axon TPU-tunnel plugin is preloaded (it deadlocks XLA:CPU execution),
jax-dependent tests run in a clean-environment subprocess via
`clean_jax_run`; everything else runs in-process.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REF_TEST = "/root/reference/test"


def axon_plugin_active() -> bool:
    return (".axon_site" in os.environ.get("PYTHONPATH", "")
            or any(".axon_site" in p for p in sys.path))


def clean_jax_run(code: str, timeout: int = 900) -> str:
    """Run python code needing the XLA:CPU backend; returns stdout.
    Uses a subprocess with the axon plugin stripped when necessary."""
    if not axon_plugin_active():
        ns: dict = {}
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(code, ns)
        return buf.getvalue()
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and ".axon_site" not in p])
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=timeout)
    if res.returncode != 0:
        raise AssertionError(
            f"clean_jax_run failed (rc={res.returncode}):\n{res.stderr[-4000:]}")
    return res.stdout


@pytest.fixture(scope="session")
def ref_test_dir():
    if not os.path.isdir(REF_TEST):
        pytest.skip("reference test corpus not available")
    return REF_TEST


def ref_path(*parts):
    return os.path.join(REF_TEST, *parts)


def has_ref(*parts) -> bool:
    return os.path.exists(ref_path(*parts))
