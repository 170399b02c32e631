"""Test harness: force a clean 8-virtual-device CPU backend.

The shell environment routes every JAX process through the axon TPU tunnel
(``JAX_PLATFORMS=axon`` + a sitecustomize that registers a remote-compile
PJRT plugin — making even CPU compiles take ~15s through the relay). Unit
tests must run on the local CPU backend with 8 virtual devices for the
sharding tests, so if the axon plugin got registered at interpreter start we
re-exec pytest once with it disabled.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compile cache: makes re-runs near-instant even on one core
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
