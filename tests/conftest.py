"""Test harness: force an 8-virtual-device CPU platform before JAX import.

This is the standard JAX substitute for multi-chip testing (SURVEY.md §4): all
sharding/collective paths are exercised on a fake 8-device mesh, mirroring how
the driver validates ``dryrun_multichip``.
"""

import os

# Unconditional: the session environment pins JAX_PLATFORMS to the TPU platform
# (and a sitecustomize hook imports jax at interpreter start), so both the env
# var and the live config must be overridden to get a CPU test platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


def pytest_configure(config):
    """Build the native chunk codec if the toolchain is present, so the codec
    tests run instead of skipping (the .so is gitignored)."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libzarr_codec.so")
    if not os.path.exists(so) and shutil.which("make") and shutil.which("g++"):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(root, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass  # tests fall back to their skip gate
