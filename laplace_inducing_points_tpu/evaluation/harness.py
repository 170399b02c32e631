"""Dataset-level evaluation harness.

Parity: ``eval_dataset`` / ``eval_dataset_extended`` / ``auroc_ood``
(``/root/reference/scale_experiments/evaluate.py:157-231,70-93``).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laplace_inducing_points_tpu.evaluation import metrics
from laplace_inducing_points_tpu.inference.lla import (predict_lla_dense,
                                                       predict_lla_scalable)


def batch_logit_samples(state, x, Z, *, alpha, full_set_size, num_mc_samples,
                        rng, scalable: bool = True) -> jnp.ndarray:
    """(S, B, C) predictive logit samples for one batch."""
    if scalable:
        return predict_lla_scalable(
            state, x, Z, alpha, key=rng, full_set_size=full_set_size,
            num_samples=num_mc_samples)
    dist = predict_lla_dense(state, x, Z, alpha, full_set_size=full_set_size)
    return dist.sample(rng, num_mc_samples)


def _batch_metrics(state, out_samples, y):
    """Dispatch NLL/score on the model kind: softmax-CE MC-NLL for
    classifiers, Gaussian MC-NLL (+rmse as the 'acc' slot) for regressors."""
    if state.model_kind == "regressor":
        logvar = state.params.get("logvar", 0.0)
        nll, rmse = metrics.mc_gaussian_nll(out_samples, jnp.asarray(y),
                                            logvar)
        return nll, rmse, None
    return metrics.mc_predictive_nll_acc(out_samples, jnp.asarray(y))


def eval_dataset(state, loader: Iterable, Z, *, alpha, full_set_size,
                 num_mc_samples, rng, scalable: bool = True,
                 verbose: bool = False) -> Tuple[float, float]:
    """Weighted-mean NLL and accuracy (rmse for regressors) over a loader."""
    tot_nll = tot_acc = tot_n = 0.0
    for x, y in loader:
        rng, sub = jax.random.split(rng)
        x = jnp.asarray(x, dtype=jnp.float32)
        logits = batch_logit_samples(
            state, x, Z, alpha=alpha, full_set_size=full_set_size,
            num_mc_samples=num_mc_samples, rng=sub, scalable=scalable)
        nll, acc, _ = _batch_metrics(state, logits, y)
        bs = x.shape[0]
        tot_nll += float(nll) * bs
        tot_acc += float(acc) * bs
        tot_n += bs
        if verbose:
            print(f"  [eval] NLL={float(nll):.3f} ACC={float(acc):.3f}")
    if tot_n == 0:
        raise ValueError("eval_dataset: loader yielded no batches")
    return tot_nll / tot_n, tot_acc / tot_n


def eval_dataset_extended(state, loader: Iterable, Z, *, alpha, full_set_size,
                          num_mc_samples, rng, scalable: bool = True):
    """NLL/ACC plus Brier, ECE and collected mean-probabilities."""
    tot_nll = tot_acc = tot_n = 0.0
    all_probs, all_labels = [], []
    for x, y in loader:
        rng, sub = jax.random.split(rng)
        x = jnp.asarray(x, dtype=jnp.float32)
        logits = batch_logit_samples(
            state, x, Z, alpha=alpha, full_set_size=full_set_size,
            num_mc_samples=num_mc_samples, rng=sub, scalable=scalable)
        nll, acc, mean_probs = metrics.mc_predictive_nll_acc(
            logits, jnp.asarray(y))
        bs = x.shape[0]
        tot_nll += float(nll) * bs
        tot_acc += float(acc) * bs
        tot_n += bs
        all_probs.append(np.asarray(mean_probs))
        all_labels.append(np.asarray(y).reshape(-1))
    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    return (tot_nll / tot_n, tot_acc / tot_n,
            metrics.brier_score(probs, labels), metrics.ece(probs, labels),
            probs, labels)


def auroc_ood(state, id_probs: np.ndarray, ood_loader: Iterable, Z, *,
              alpha, full_set_size, num_mc_samples, rng,
              scalable: bool = True) -> float:
    """OOD AUROC against an out-of-distribution loader."""
    ood_probs = []
    for x, _ in ood_loader:
        rng, sub = jax.random.split(rng)
        x = jnp.asarray(x, dtype=jnp.float32)
        logits = batch_logit_samples(
            state, x, Z, alpha=alpha, full_set_size=full_set_size,
            num_mc_samples=num_mc_samples, rng=sub, scalable=scalable)
        _, _, mean_probs = metrics.mc_predictive_nll_acc(
            logits, jnp.zeros(x.shape[0], dtype=jnp.int32))
        ood_probs.append(np.asarray(mean_probs))
    return metrics.auroc_ood(id_probs, np.concatenate(ood_probs))
