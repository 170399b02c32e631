"""Shared small utilities."""

import jax.numpy as jnp


def host_cpu_fingerprint() -> str:
    """Short fingerprint of the host CPU's visible ISA feature set.

    XLA:CPU persistent-cache entries are AOT-compiled against the compiling
    host's ISA extensions, and this VM's feature set varies across boots —
    loading a foreign entry risks SIGILL. Every CPU compile-cache directory
    is keyed by this value (here, tests/conftest.py, __graft_entry__).
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        return "nofp"


def is_pd(mat, tol: float = 1e-9) -> bool:
    """All eigenvalues >= tol (parity: /root/reference/src/utils.py:9)."""
    return bool(jnp.all(jnp.linalg.eigvalsh(0.5 * (mat + mat.T)) >= tol))


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Remote compiles through the axon tunnel are slow (minutes for grad
    graphs); caching makes them one-time. Separate directories per backend
    avoid machine-feature mismatches between locally- and remotely-compiled
    entries; the CPU dir is additionally keyed by a host-CPU-feature
    fingerprint — XLA:CPU entries are AOT-compiled against the compiling
    host's ISA and this VM's visible feature set varies across boots
    (loading a foreign entry risks SIGILL).
    """
    import os

    import jax

    if path is None:
        backend = os.environ.get("JAX_PLATFORMS", "tpu") or "tpu"
        backend = backend.split(",")[0]
        path = f"/tmp/jax_cache_{backend}"
        if backend == "cpu":
            path += "_" + host_cpu_fingerprint()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
