"""Shared small utilities."""

import jax.numpy as jnp


def is_pd(mat, tol: float = 1e-9) -> bool:
    """All eigenvalues >= tol (parity: /root/reference/src/utils.py:9)."""
    return bool(jnp.all(jnp.linalg.eigvalsh(0.5 * (mat + mat.T)) >= tol))


def setup_compile_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Remote compiles through the axon tunnel are slow (minutes for grad
    graphs); caching makes them one-time. Separate directories per backend
    avoid machine-feature mismatches between locally- and remotely-compiled
    entries.
    """
    import os

    import jax

    if path is None:
        backend = os.environ.get("JAX_PLATFORMS", "tpu") or "tpu"
        path = f"/tmp/jax_cache_{backend.split(',')[0]}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
