"""Prior-precision (α) optimization by evidence maximization.

Parity: ``/root/reference/src/train_alpha.py`` — log marginal likelihood via
the low-rank logdet identity, gradient ascent on log α, and the interleaved
MAP/α training loop. The logdet runs through the small Gram (one MXU matmul
+ slogdet) instead of the reference's one-hot blocked build.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.core.params import flatten_nn_params
from laplace_inducing_points_tpu.data.loader import device_iter
from laplace_inducing_points_tpu.ops.pallas.syrk import syrk
from laplace_inducing_points_tpu.training.map import (eval_classification,
                                                      eval_regression,
                                                      map_step)


def log_marginal_likelihood(alpha, X, state,
                            full_set_size: Optional[int] = None) -> jnp.ndarray:
    """log p(D|α) up to α-independent constants.

    Parity: ``log_marginal_likelihood``
    (``/root/reference/src/train_alpha.py:13-44``):
    ``log N(θ_MAP | 0, α⁻¹I) − ½·[logdet(I + (rescale/α)·WᵀW) + D·log α]``.
    """
    N = full_set_size or X.shape[0]
    rescale = N / X.shape[0]

    R = ops.dense_wt(state, X)                        # (d, D), unscaled
    D = R.shape[1]
    G = syrk(R)
    eye = jnp.eye(G.shape[0], dtype=G.dtype)
    logdet_lowrank = jnp.linalg.slogdet(eye + (rescale / alpha) * G)[1]
    logdet_term = logdet_lowrank + D * jnp.log(alpha)

    flat, _ = flatten_nn_params(state.params)
    log_prior = -0.5 * alpha * jnp.dot(flat, flat) + 0.5 * D * jnp.log(alpha)
    return log_prior - 0.5 * logdet_term


def update_alpha(log_alpha: jnp.ndarray, opt_state, opt, X, state,
                 full_set_size: Optional[int] = None):
    """One ascent step on log α (parity: ``update_alpha``,
    ``/root/reference/src/train_alpha.py:47-59``)."""
    def loss_fn(la):
        return -log_marginal_likelihood(jnp.exp(la), X, state, full_set_size)

    grad = jax.grad(loss_fn)(log_alpha)
    updates, new_opt_state = opt.update(grad, opt_state, log_alpha)
    return optax.apply_updates(log_alpha, updates), new_opt_state


def train_map_then_alpha(state, train_loader: Iterable, test_loader: Iterable,
                         *, num_epochs: int = 500, alpha0: float = 1.0,
                         alpha_lr: float = 5e-2, alpha_every: int = 5,
                         burnin: int = 100,
                         full_set_size: Optional[int] = None,
                         verbose: bool = True):
    """Interleave MAP epochs with α hyper-steps after burn-in.

    Parity: ``train_map_then_alpha``
    (``/root/reference/src/train_alpha.py:65-121``).
    """
    log_alpha = jnp.log(jnp.asarray(alpha0, dtype=jnp.float32))
    opt = optax.adam(alpha_lr)
    opt_state = opt.init(log_alpha)
    eval_step = (eval_regression if state.model_kind == "regressor"
                 else eval_classification)

    last_batch = None
    for epoch in range(num_epochs):
        for batch in device_iter(train_loader):
            # traced scalar: alpha updates reuse the same compiled step
            state, _ = map_step(state, batch, jnp.exp(log_alpha))
            last_batch = batch

        if epoch >= burnin and (epoch + 1) % alpha_every == 0:
            log_alpha, opt_state = update_alpha(
                log_alpha, opt_state, opt, last_batch[0], state,
                full_set_size)

        if verbose and epoch % 4 == 0:
            tot_nll, tot_acc, nb = 0.0, 0.0, 0
            for batch in device_iter(test_loader):
                nll, acc = eval_step(state, batch)
                tot_nll += float(nll)
                tot_acc += float(acc)
                nb += 1
            nb = max(nb, 1)
            msg = (f"[MAP+α e{epoch:4d}] NLL={tot_nll / nb:.4f} "
                   f"α={float(jnp.exp(log_alpha)):.4f}")
            if state.model_kind == "classifier":
                msg += f" ACC={tot_acc / nb:.4f}"
            print(msg)

    return state, float(jnp.exp(log_alpha))
