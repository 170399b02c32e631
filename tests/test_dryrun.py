"""The multichip dry run must execute on the virtual 8-device mesh.

Mirrors what the driver validates (__graft_entry__.dryrun_multichip) in BOTH
entry modes:
* inline — the calling process already has >= 8 devices (this test session),
* bootstrap — the calling process has 1 device / a foreign backend (the
  driver's axon environment), in which case dryrun_multichip must re-launch
  itself in a virtual-CPU subprocess. Round 1 shipped without this and the
  driver run failed with "need 8 devices, have 1"; never again.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_inline(capsys):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "DP MAP step on 8 devices" in out
    assert "single-device replay" in out
    assert "sharded inducing optimize_step" in out
    assert "sharded stochastic optimize_step" in out


def test_dryrun_multichip_bootstraps_from_single_device_env():
    """Simulate the driver: a fresh process whose environment would give jax
    ONE device (no force-host-device-count flag, foreign platform name).
    dryrun_multichip(8) must succeed anyway by self-bootstrapping."""
    env = dict(os.environ)
    env.pop("_LIPT_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "axon"        # driver-like; parent must not init it
    env["PALLAS_AXON_POOL_IPS"] = ""     # ...and must never touch the tunnel
    env["XLA_FLAGS"] = ""                # no virtual-device escape hatch
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK8')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "bootstrapping a 8-device virtual CPU mesh" in proc.stdout
    assert "OK8" in proc.stdout
