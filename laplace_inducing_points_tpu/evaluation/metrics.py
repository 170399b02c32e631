"""Calibration / uncertainty metrics.

Parity: ``/root/reference/scale_experiments/evaluate.py:40-154`` — MC
predictive NLL, accuracy, multi-class Brier, 15-bin ECE, OOD AUROC. The
AUROC is computed in-house by rank statistics (the reference pulls in
sklearn, which isn't even in its requirements). ``batch_nll`` is fully
jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mc_predictive_nll_acc(logit_samples: jnp.ndarray, labels: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MC-averaged predictive NLL ``−log(1/S Σ_s p_s(y))``, accuracy, mean
    probabilities.

    Parity: ``batch_nll`` (``/root/reference/scale_experiments/evaluate.py:98-154``).
    ``logit_samples``: (S, B, C); ``labels``: (B,). Returns (nll, acc, (B, C)).
    """
    S = logit_samples.shape[0]
    log_probs = jax.nn.log_softmax(logit_samples, axis=-1)      # (S, B, C)
    y = labels.reshape(-1).astype(jnp.int32)
    log_p_true = jnp.take_along_axis(
        log_probs, y[None, :, None], axis=-1).squeeze(-1)       # (S, B)
    log_avg = jax.scipy.special.logsumexp(log_p_true, axis=0) - jnp.log(S)
    nll = -jnp.mean(log_avg)

    probs = jnp.exp(log_probs)
    mean_probs = probs.mean(axis=0)                             # (B, C)
    acc = jnp.mean(mean_probs.argmax(-1) == y)
    return nll, acc, mean_probs


def brier_score(probs: np.ndarray, labels: np.ndarray) -> float:
    """Multi-class Brier (parity: ``evaluate.py:40-43``)."""
    probs = np.asarray(probs)
    one_hot = np.eye(probs.shape[-1])[np.asarray(labels, dtype=int)]
    return float(np.mean(np.sum((probs - one_hot) ** 2, axis=1)))


def ece(probs: np.ndarray, labels: np.ndarray, n_bins: int = 15) -> float:
    """Expected calibration error, naive histogram binning
    (parity: ``evaluate.py:45-62``)."""
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(1)
    correct = probs.argmax(1) == labels
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    total = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (conf >= lo) & (conf < hi)
        if hi >= 1.0:
            # deliberate deviation from the reference: its top bin excludes
            # conf == 1.0 exactly (common with saturated f32 softmax),
            # biasing ECE low on confident models — include it here
            mask = (conf >= lo) & (conf <= hi)
        if not mask.any():
            continue
        total += abs(conf[mask].mean() - correct[mask].mean()) * mask.mean()
    return float(total)


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Binary AUROC by the rank-statistic (Mann–Whitney) formula.

    Equivalent to sklearn's ``roc_auc_score`` — ties handled via midranks.
    """
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    r = 1.0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        midrank = 0.5 * ((i + 1) + (j + 1))
        ranks[order[i:j + 1]] = midrank
        i = j + 1
    rank_sum_pos = ranks[labels].sum()
    return float((rank_sum_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def ood_scores(probs: np.ndarray) -> np.ndarray:
    """Higher ⇒ more OOD-like (negative max-probability).

    Parity: ``ood_scores`` (``evaluate.py:64-67``) — the reference labels OOD
    as the positive class with score ``−max p``.
    """
    return -np.asarray(probs).max(1)


def auroc_ood(id_probs: np.ndarray, ood_probs: np.ndarray) -> float:
    """AUROC of separating OOD (positive) from in-distribution samples."""
    scores = np.concatenate([ood_scores(id_probs), ood_scores(ood_probs)])
    labels = np.concatenate([np.zeros(len(id_probs)), np.ones(len(ood_probs))])
    return roc_auc(scores, labels)


def mc_gaussian_nll(mu_samples: jnp.ndarray, targets: jnp.ndarray,
                    logvar: jnp.ndarray | float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC predictive NLL for Gaussian likelihoods.

    ``−log(1/S Σ_s N(y | μ_s, σ²))`` with the learned observation noise
    σ² = exp(logvar). Returns (nll, rmse of the posterior-mean predictor).
    The reference's harness is classification-only
    (``/root/reference/scale_experiments/evaluate.py:98-154``), which makes
    its regression grid search silently meaningless; this closes that gap.
    """
    S = mu_samples.shape[0]
    y = targets.reshape(1, *mu_samples.shape[1:])
    var = jnp.exp(logvar)
    log_comp = (-0.5 * (jnp.log(2 * jnp.pi * var)
                        + (mu_samples - y) ** 2 / var))
    log_comp = log_comp.reshape(S, -1)                      # (S, B·K)
    log_avg = jax.scipy.special.logsumexp(log_comp, axis=0) - jnp.log(S)
    nll = -jnp.mean(log_avg)
    rmse = jnp.sqrt(jnp.mean((mu_samples.mean(0) - y[0]) ** 2))
    return nll, rmse
