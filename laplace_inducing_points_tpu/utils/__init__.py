"""Shared small utilities."""

import jax.numpy as jnp


def is_pd(mat, tol: float = 1e-9) -> bool:
    """All eigenvalues >= tol (parity: /root/reference/src/utils.py:9)."""
    return bool(jnp.all(jnp.linalg.eigvalsh(0.5 * (mat + mat.T)) >= tol))
