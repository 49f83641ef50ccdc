"""Regression test for the driver-facing multi-chip dry run.

Round 1's MULTICHIP artifact was red because ``dryrun_multichip`` depended on
the pytest harness to configure the virtual CPU mesh and silently clamped the
device count. These tests invoke ``__graft_entry__.dryrun_multichip`` exactly
as the driver does — a fresh interpreter with NO
``xla_force_host_platform_device_count`` in XLA_FLAGS — and assert it
self-configures an 8-device mesh, executes, and exits 0.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("DEEPV_DRYRUN_SUBPROCESS", None)
    return env


@pytest.mark.slow
def test_dryrun_multichip_as_driver_invokes_it():
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=_driver_env(), capture_output=True, text=True,
                         timeout=1800)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    # proof it ran on a real (2,4) mesh, not a clamped 1-device one
    assert "mesh (2, 4)" in res.stdout and "cp mesh (8,)" in res.stdout, res.stdout


@pytest.mark.slow
def test_dryrun_multichip_recovers_from_preinitialised_cpu_client():
    # simulate a host process whose CPU client initialised with 1 device
    # before dryrun_multichip could inject the flag
    code = ("import jax; assert len(jax.devices('cpu')) == 1; "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         env=_driver_env(), capture_output=True, text=True,
                         timeout=1800)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "mesh (2, 4)" in res.stdout, res.stdout


def test_run_dryrun_refuses_to_clamp():
    import jax
    from deepv_tpu.parallel.dryrun import run_dryrun
    n = len(jax.devices("cpu"))
    with pytest.raises(RuntimeError, match="needs"):
        run_dryrun(n + 1)
