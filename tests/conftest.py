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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's concurrency-optimized thunk schedule lets virtual devices reach
# independent collectives of one program in different orders — the
# in-process rendezvous then deadlocks and the stuck-detector ABORTS the
# process (rc=-6; see __graft_entry__._bootstrap_subprocess). A sequential
# schedule removes the race deterministically.
if "concurrency_optimized_scheduler" not in _flags:
    _flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = _flags

# persistent compile cache: makes re-runs near-instant even on one core.
# Keyed by the host-CPU-feature fingerprint (SIGILL hazard rationale in
# laplace_inducing_points_tpu.utils.host_cpu_fingerprint).
import jax  # noqa: E402

from laplace_inducing_points_tpu.utils import host_cpu_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_cpu_{host_cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
