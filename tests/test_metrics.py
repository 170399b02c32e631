"""Metric correctness tests (Brier, ECE, AUROC, MC-NLL)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_inducing_points_tpu.evaluation import metrics as m


def test_brier_perfect_and_uniform():
    labels = np.array([0, 1, 2])
    perfect = np.eye(3)
    assert m.brier_score(perfect, labels) == 0.0
    uniform = np.full((3, 3), 1 / 3)
    # sum over classes: (1/3-1)^2 + 2*(1/3)^2 = 2/3
    assert abs(m.brier_score(uniform, labels) - 2 / 3) < 1e-9


def test_ece_zero_when_calibrated():
    # confidence 0.75, accuracy 0.75 in one bin → ECE ~ 0
    probs = np.array([[0.75, 0.25]] * 4)
    labels = np.array([0, 0, 0, 1])
    assert m.ece(probs, labels) < 1e-9


def test_roc_auc_matches_sklearn():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=200)
    labels = (rng.random(200) > 0.4).astype(int)
    scores[labels == 1] += 0.8
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        pytest.skip("sklearn unavailable")
    assert abs(m.roc_auc(scores, labels)
               - roc_auc_score(labels, scores)) < 1e-12


def test_roc_auc_with_ties():
    scores = np.array([0.1, 0.1, 0.5, 0.5, 0.9])
    labels = np.array([0, 1, 0, 1, 1])
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        pytest.skip("sklearn unavailable")
    assert abs(m.roc_auc(scores, labels)
               - roc_auc_score(labels, scores)) < 1e-12


def test_mc_nll_single_sample_equals_ce():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 4)))
    labels = jnp.arange(6) % 4
    nll, acc, probs = m.mc_predictive_nll_acc(logits, labels)
    lp = jax.nn.log_softmax(logits[0], axis=-1)
    expect = -jnp.mean(lp[jnp.arange(6), labels])
    assert jnp.allclose(nll, expect, atol=1e-6)
    assert probs.shape == (6, 4)


def test_mc_nll_averages_probabilities_not_logits():
    # two samples: one confident right, one confident wrong =>
    # predictive p = mean of probs, NOT softmax of mean logits
    big = 10.0
    logits = jnp.asarray([[[big, 0.0]], [[0.0, big]]])    # (2, 1, 2)
    labels = jnp.array([0])
    nll, _, probs = m.mc_predictive_nll_acc(logits, labels)
    assert jnp.allclose(probs[0, 0], 0.5, atol=1e-3)
    assert jnp.allclose(nll, -jnp.log(0.5), atol=1e-2)


def test_auroc_ood_direction():
    """More-confident ID than OOD ⇒ AUROC near 1."""
    id_probs = np.array([[0.99, 0.01]] * 50)
    ood_probs = np.array([[0.55, 0.45]] * 50)
    assert m.auroc_ood(id_probs, ood_probs) > 0.99


def test_mc_gaussian_nll_single_sample_closed_form():
    """One MC sample => exact Gaussian NLL."""
    mu = jnp.asarray([[1.0], [2.0]])[None]         # (1, 2, 1)
    y = jnp.asarray([[1.5], [2.0]])
    logvar = jnp.log(jnp.asarray(0.25))
    nll, rmse = m.mc_gaussian_nll(mu, y, logvar)
    import numpy as _np
    expect = 0.5 * (_np.log(2 * _np.pi * 0.25) + _np.array([1.0, 0.0])).mean()
    assert jnp.allclose(nll, expect, atol=1e-5)
    assert jnp.allclose(rmse, jnp.sqrt(0.125), atol=1e-6)


def test_mc_gaussian_nll_mixture_behavior():
    """Two far-apart samples: predictive is a mixture, NLL ~ -log(0.5 pdf)."""
    mu = jnp.asarray([[[0.0]], [[10.0]]])          # (2, 1, 1)
    y = jnp.zeros((1, 1))
    nll, _ = m.mc_gaussian_nll(mu, y, 0.0)
    import numpy as _np
    expect = -_np.log(0.5 / _np.sqrt(2 * _np.pi))
    assert jnp.allclose(nll, expect, atol=1e-3)


def test_exp_plots_renders(tmp_path):
    import json
    from laplace_inducing_points_tpu.viz import exp_plots

    rec = {"dataset": "banana", "alpha": 0.05, "iter": 0, "nll": 0.17,
           "acc": 0.98, "brier": 0.08, "ece": 0.15, "wallclock_s": 1.0,
           "ood_auroc": 0.92}
    p = tmp_path / "r.jsonl"
    p.write_text(json.dumps(rec) + "\n")
    out = exp_plots.plot_records(exp_plots.load_records([str(p)]),
                                 str(tmp_path / "out.png"))
    import os
    assert os.path.exists(out)
