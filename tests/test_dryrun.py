"""The multichip dry run must execute on the virtual 8-device mesh.

Mirrors what the driver validates (__graft_entry__.dryrun_multichip), so a
regression is caught in CI before the driver sees it.
"""

import jax
import pytest


def test_dryrun_multichip_8(capsys):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "DP MAP step on 8 devices" in out
    assert "sharded inducing optimize_step" in out
    assert "sharded stochastic optimize_step" in out
