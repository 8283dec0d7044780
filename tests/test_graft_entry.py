"""Driver contract: entry() compiles and dryrun_multichip runs on 8 devices."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 128, 128, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_eight_devices(devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_subset(devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_dryrun_bootstraps_in_driver_like_env(tmp_path):
    """Simulate the driver invocation context: a child interpreter that sees a
    SINGLE device (no xla_force_host_platform_device_count pre-set, platform
    pinned by env exactly like the session pins axon) calling
    dryrun_multichip(8). The entry must provision its own virtual devices via
    subprocess re-exec rather than assume the caller set them up.
    """
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = os.environ.copy()
    # single-device env: platform pinned, no forced device count, no child marker
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        env=env, cwd=root, capture_output=True, text=True, timeout=300,
    )
    assert probe.stdout.strip() == "1", (probe.stdout, probe.stderr)

    proc = subprocess.run(
        [sys.executable, os.path.join(root, "__graft_entry__.py"), "--dryrun", "8"],
        env=env, cwd=root, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout
