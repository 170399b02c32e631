"""Closed-form per-example loss Hessians and their (asymmetric) square roots.

The GGN is ``sum_i J_i^T H_i J_i`` where ``H_i`` is the Hessian of the loss
w.r.t. the network output at example ``i``. For the two supported likelihoods
both ``H`` and a factor ``L`` with ``L L^T = H`` are closed form:

* **softmax cross-entropy** (``classifier``): ``H = diag(p) - p p^T`` with
  ``p = softmax(f)``. Factor ``L = diag(sqrt(p)) - p sqrt(p)^T`` (so
  ``L v = s*v - (s.v) p`` and ``L^T v = s*v - (p.v) s`` with ``s = sqrt(p)``).
  Parity: ``/root/reference/src/ggn.py:16-39,126-129``.
* **Gaussian NLL with learned homoscedastic variance** (``regressor``):
  ``H = exp(-logvar)`` (scalar), ``L = exp(-logvar/2)``.
  Parity: ``/root/reference/src/ggn.py:17-19,112-113``.

Everything here is **batched over examples** — inputs are ``(M, K)`` arrays of
network outputs/tangents, never per-example vectors. On TPU these lower to a
handful of fused VPU elementwise ops + a tiny reduction; the reference instead
applies them inside a per-example ``fori_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

REGRESSOR = "regressor"
CLASSIFIER = "classifier"


def _ce_sqrt_h(f: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched ``L v`` for softmax-CE: rows ``s ⊙ v − (sᵀv) p``."""
    p = jax.nn.softmax(f, axis=-1)
    s = jnp.sqrt(p)
    coeff = jnp.sum(s * v, axis=-1, keepdims=True)
    return s * v - coeff * p


def _ce_sqrt_h_t(f: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched ``Lᵀ v`` for softmax-CE: rows ``s ⊙ v − (pᵀv) s``."""
    p = jax.nn.softmax(f, axis=-1)
    s = jnp.sqrt(p)
    coeff = jnp.sum(p * v, axis=-1, keepdims=True)
    return s * v - coeff * s


def _ce_h(f: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched ``H v`` for softmax-CE: rows ``p ⊙ v − (pᵀv) p``."""
    p = jax.nn.softmax(f, axis=-1)
    coeff = jnp.sum(p * v, axis=-1, keepdims=True)
    return p * v - coeff * p


def sqrt_h_apply(model_kind: str, f: jnp.ndarray, v: jnp.ndarray,
                 logvar: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Apply the Hessian square-root factor ``L`` rowwise: ``(M,K)->(M,K)``.

    Matches the reference's ``sqrt_Hi_apply_T`` (their ``L``-side naming is
    swapped; this is the map used on the *W* side, i.e. before ``J^T``).
    """
    if model_kind == CLASSIFIER:
        return _ce_sqrt_h(f, v)
    if model_kind == REGRESSOR:
        return jnp.exp(-0.5 * logvar) * v
    raise ValueError(f"unknown model_kind: {model_kind}")


def sqrt_h_t_apply(model_kind: str, f: jnp.ndarray, v: jnp.ndarray,
                   logvar: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Apply ``Lᵀ`` rowwise (used on the ``Wᵀ`` side, i.e. after ``J``)."""
    if model_kind == CLASSIFIER:
        return _ce_sqrt_h_t(f, v)
    if model_kind == REGRESSOR:
        return jnp.exp(-0.5 * logvar) * v
    raise ValueError(f"unknown model_kind: {model_kind}")


def h_apply(model_kind: str, f: jnp.ndarray, v: jnp.ndarray,
            logvar: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Apply the full per-example loss Hessian ``H = L Lᵀ`` rowwise."""
    if model_kind == CLASSIFIER:
        return _ce_h(f, v)
    if model_kind == REGRESSOR:
        return jnp.exp(-logvar) * v
    raise ValueError(f"unknown model_kind: {model_kind}")


def h_dense(model_kind: str, f: jnp.ndarray,
            logvar: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Materialize per-example loss Hessians, batched: ``(M,K) -> (M,K,K)``."""
    if model_kind == CLASSIFIER:
        p = jax.nn.softmax(f, axis=-1)
        eye = jnp.eye(f.shape[-1], dtype=f.dtype)
        return p[..., :, None] * eye - p[..., :, None] * p[..., None, :]
    if model_kind == REGRESSOR:
        k = f.shape[-1]
        return jnp.exp(-logvar) * jnp.broadcast_to(
            jnp.eye(k, dtype=f.dtype), f.shape + (k,))
    raise ValueError(f"unknown model_kind: {model_kind}")
