"""Dataset-level evaluation harness.

Parity: ``eval_dataset`` / ``eval_dataset_extended`` / ``auroc_ood``
(``/root/reference/scale_experiments/evaluate.py:157-231,70-93``).

TPU-first: the scalable path builds the posterior spectral factor ONCE per
``(state, Z)`` via :class:`ScalableLLAPredictor` and reuses it across every
batch, repetition, and alpha value — the reference (and round 1 of this
framework) rebuilt the row factor + Gram + eigh per batch, which dominated
eval wall-clock at ResNet1M scale.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laplace_inducing_points_tpu.evaluation import metrics
from laplace_inducing_points_tpu.inference.lla import (ScalableLLAPredictor,
                                                       predict_lla_dense,
                                                       predict_lla_scalable)


def batch_logit_samples(state, x, Z, *, alpha, full_set_size, num_mc_samples,
                        rng, scalable: bool = True) -> jnp.ndarray:
    """(S, B, C) predictive logit samples for one batch (one-shot path —
    rebuilds the posterior factor; use :func:`make_batch_sampler` in loops)."""
    if scalable:
        return predict_lla_scalable(
            state, x, Z, alpha, key=rng, full_set_size=full_set_size,
            num_samples=num_mc_samples)
    dist = predict_lla_dense(state, x, Z, alpha, full_set_size=full_set_size)
    return dist.sample(rng, num_mc_samples)


def make_batch_sampler(state, Z, *, alpha, full_set_size, num_mc_samples,
                       scalable: bool = True,
                       predictor: Optional[ScalableLLAPredictor] = None,
                       example_block: Optional[int] = None,
                       range_clip_min: Optional[float] = None,
                       sample_block: Optional[int] = None):
    """Return ``fn(x, key) -> (S, B, C)`` with the posterior factor hoisted
    out of the per-batch loop (built once per (state, Z); alpha stays traced
    so callers may vary it against the same factor)."""
    if scalable:
        pred = predictor if predictor is not None else ScalableLLAPredictor(
            state, Z, full_set_size=full_set_size,
            example_block=example_block, range_clip_min=range_clip_min,
            sample_block=sample_block)
        # cache_key (the loop's batch index) lets the cov-method predictor
        # reuse its alpha-independent per-image statistics across
        # repetitions and alpha grid points
        return lambda x, key, cache_key=None: pred.logit_samples(
            x, alpha, key, num_mc_samples, cache_key=cache_key)

    def dense_sampler(x, key, cache_key=None):
        dist = predict_lla_dense(state, jnp.asarray(x, dtype=jnp.float32), Z,
                                 alpha, full_set_size=full_set_size)
        return dist.sample(key, num_mc_samples)

    return dense_sampler


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
                 verbose: bool = False,
                 predictor: Optional[ScalableLLAPredictor] = None,
                 example_block: Optional[int] = None,
                 range_clip_min: Optional[float] = None,
                 sample_block: Optional[int] = None) -> Tuple[float, float]:
    """Weighted-mean NLL and accuracy (rmse for regressors) over a loader."""
    sampler = make_batch_sampler(
        state, Z, alpha=alpha, full_set_size=full_set_size,
        num_mc_samples=num_mc_samples, scalable=scalable,
        predictor=predictor, example_block=example_block,
        range_clip_min=range_clip_min, sample_block=sample_block)
    tot_nll = tot_acc = tot_n = 0.0
    is_regressor = state.model_kind == "regressor"
    for i, (x, y) in enumerate(loader):
        rng, sub = jax.random.split(rng)
        logits = sampler(jnp.asarray(x, dtype=jnp.float32), sub,
                         ("eval", id(loader), i))
        nll, acc, _ = _batch_metrics(state, logits, y)
        bs = x.shape[0]
        tot_nll += float(nll) * bs
        # the regressor's 'acc' slot is a per-batch RMSE: aggregate the
        # MSE (sum of squares), not the RMSEs, or the dataset value is
        # biased low under heterogeneous batch errors
        tot_acc += (float(acc) ** 2 if is_regressor else float(acc)) * bs
        tot_n += bs
        if verbose:
            print(f"  [eval] NLL={float(nll):.3f} ACC={float(acc):.3f}")
    if tot_n == 0:
        raise ValueError("eval_dataset: loader yielded no batches")
    score = tot_acc / tot_n
    return tot_nll / tot_n, (score ** 0.5 if is_regressor else score)


def eval_dataset_extended(state, loader: Iterable, Z, *, alpha, full_set_size,
                          num_mc_samples, rng, scalable: bool = True,
                          predictor: Optional[ScalableLLAPredictor] = None,
                          example_block: Optional[int] = None,
                          range_clip_min: Optional[float] = None,
                          sample_block: Optional[int] = None) -> dict:
    """Extended metrics record, dispatched on the model kind.

    Classifier: ``{"nll", "acc", "brier", "ece", "probs", "labels"}``.
    Regressor:  ``{"nll", "rmse", "picp90", "picp_err", "means", "targets"}``
    — PICP90 is the coverage of the moment-matched 90% credible interval
    (predictive var = sample var of the means + observation noise), and
    ``picp_err = |picp90 - 0.9|`` is its calibration error.
    """
    sampler = make_batch_sampler(
        state, Z, alpha=alpha, full_set_size=full_set_size,
        num_mc_samples=num_mc_samples, scalable=scalable,
        predictor=predictor, example_block=example_block,
        range_clip_min=range_clip_min, sample_block=sample_block)
    tot_nll = tot_acc = tot_n = 0.0
    collected, all_labels = [], []
    covered = 0.0
    is_regressor = state.model_kind == "regressor"
    for i, (x, y) in enumerate(loader):
        rng, sub = jax.random.split(rng)
        out = sampler(jnp.asarray(x, dtype=jnp.float32), sub,
                      ("eval", id(loader), i))
        nll, acc, mean_probs = _batch_metrics(state, out, y)
        bs = x.shape[0]
        tot_nll += float(nll) * bs
        # regressor 'acc' slot is a per-batch RMSE — aggregate the MSE
        tot_acc += (float(acc) ** 2 if is_regressor else float(acc)) * bs
        tot_n += bs
        if is_regressor:
            mu = jnp.mean(out, axis=0).reshape(bs)          # (B,)
            logvar = state.params.get("logvar", 0.0)
            if isinstance(logvar, dict):
                logvar = logvar["logvar"]
            var = jnp.var(out, axis=0).reshape(bs) + jnp.exp(
                jnp.asarray(logvar))
            half = 1.6449 * jnp.sqrt(var)                    # 90% two-sided
            yb = jnp.asarray(y).reshape(bs)
            covered += float(jnp.sum(jnp.abs(yb - mu) <= half))
            collected.append(np.asarray(mu))
            all_labels.append(np.asarray(yb))
        else:
            collected.append(np.asarray(mean_probs))
            all_labels.append(np.asarray(y).reshape(-1))
    if tot_n == 0:
        raise ValueError("eval_dataset_extended: loader yielded no batches")
    flat = np.concatenate(collected)
    labels = np.concatenate(all_labels)
    if is_regressor:
        picp = covered / tot_n
        return {"nll": tot_nll / tot_n, "rmse": (tot_acc / tot_n) ** 0.5,
                "picp90": picp, "picp_err": abs(picp - 0.9),
                "means": flat, "targets": labels}
    return {"nll": tot_nll / tot_n, "acc": tot_acc / tot_n,
            "brier": metrics.brier_score(flat, labels),
            "ece": metrics.ece(flat, labels),
            "probs": flat, "labels": labels}


def auroc_ood(state, id_probs: np.ndarray, ood_loader: Iterable, Z, *,
              alpha, full_set_size, num_mc_samples, rng,
              scalable: bool = True,
              predictor: Optional[ScalableLLAPredictor] = None,
              example_block: Optional[int] = None,
              range_clip_min: Optional[float] = None,
              sample_block: Optional[int] = None) -> float:
    """OOD AUROC against an out-of-distribution loader."""
    sampler = make_batch_sampler(
        state, Z, alpha=alpha, full_set_size=full_set_size,
        num_mc_samples=num_mc_samples, scalable=scalable,
        predictor=predictor, example_block=example_block,
        range_clip_min=range_clip_min, sample_block=sample_block)
    ood_probs = []
    for i, (x, _) in enumerate(ood_loader):
        rng, sub = jax.random.split(rng)
        logits = sampler(jnp.asarray(x, dtype=jnp.float32), sub,
                         ("ood", id(ood_loader), i))
        _, _, mean_probs = metrics.mc_predictive_nll_acc(
            logits, jnp.zeros(x.shape[0], dtype=jnp.int32))
        ood_probs.append(np.asarray(mean_probs))
    return metrics.auroc_ood(id_probs, np.concatenate(ood_probs))
