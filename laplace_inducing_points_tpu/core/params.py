"""Parameter pytree utilities.

Parity: ``/root/reference/src/utils.py:12-17`` (``flatten_nn_params``) and
``:84-89`` (``count_model_params``/``print_summary``). The curvature of a model
is always taken w.r.t. the *network weights only* — auxiliary variable
collections (the learned observation-noise ``logvar`` of regressors, BatchNorm
``batch_stats``) are excluded from the flat vector.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

# Collections that never enter the curvature / posterior.
EXCLUDED_COLLECTIONS = ("logvar", "batch_stats")


def split_nn_params(params: Any) -> Tuple[dict, dict]:
    """Split a top-level param dict into (curvature params, excluded aux)."""
    nn = {k: v for k, v in params.items() if k not in EXCLUDED_COLLECTIONS}
    aux = {k: v for k, v in params.items() if k in EXCLUDED_COLLECTIONS}
    return nn, aux


def flatten_nn_params(params: Any) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], Any]]:
    """Ravel the network-weight pytree to a flat vector.

    Returns ``(flat, unravel)`` where ``unravel(flat)`` rebuilds the pytree of
    *network weights only* (excluded collections are dropped, matching the
    reference's ``flatten_nn_params``).
    """
    nn, _ = split_nn_params(params)
    return jax.flatten_util.ravel_pytree(nn)


def count_params(tree: Any) -> int:
    """Total number of scalars in a pytree."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def num_curvature_params(params: Any) -> int:
    """Dimension D of the flat curvature-parameter vector."""
    nn, _ = split_nn_params(params)
    return count_params(nn)


def print_summary(params: Any) -> None:
    d = count_params(params)
    print(f"Param count     (D) : {d}")
    print(f"Cov. mat. size (D^2): {d**2:.3e}")
