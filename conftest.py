"""Root conftest: escape the axon TPU tunnel before JAX loads.

The container routes every python process through an axon PJRT plugin
(sitecustomize registers it at interpreter start; even CPU compiles then
take ~15s each through the remote-compile relay). Unit tests need the plain
local CPU backend (with 8 virtual devices for sharding tests), so re-exec
pytest once with the plugin disabled. Capture is stopped through pytest's
own capture manager first so fd 1/2 are the real stdout/stderr again and
the re-run's output reaches the caller.
"""

import os
import sys


def pytest_configure(config):
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get("_LIPT_TEST_REEXEC") != "1"):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            try:
                capman.stop_global_capturing()
            except Exception:
                pass
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""   # sitecustomize skips axon register
        env["JAX_PLATFORMS"] = "cpu"
        env["_LIPT_TEST_REEXEC"] = "1"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
