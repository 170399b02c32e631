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


def test_cov_method_matches_dense_predictive_covariance():
    """method="cov"'s analytic per-image moments must equal the dense twin
    J S^{-1} J^T exactly (f32): the 2K-joint construction is the same
    distribution as the weight-space draw, marginalized per image."""
    from laplace_inducing_points_tpu.core import operators as ops
    from laplace_inducing_points_tpu.inference.lla import (
        _joint_logit_samples)

    _, state, (x, _) = classifier_state()
    Z, xt = x[:6], x[:5]
    alpha, full = 0.3, 32.0
    beta = full / Z.shape[0]

    pred = ScalableLLAPredictor(state, Z, full_set_size=32, method="cov")
    f0, JJt, A = pred.batch_stats(xt)
    K = f0.shape[-1]

    # analytic covariance, both assembly forms (Woodbury solve is the
    # production path for alpha >= clip; spectral q-form for clip-active)
    d_z = pred.gram.shape[0]
    C = alpha * jnp.eye(d_z) + beta * pred.gram
    sol = jnp.linalg.solve(C, A.reshape(-1, d_z).T)
    quad = (A.reshape(-1, d_z) @ sol).reshape(
        xt.shape[0], K, xt.shape[0], K)
    quad = quad[jnp.arange(xt.shape[0]), :, jnp.arange(xt.shape[0]), :]
    Sigma = (JJt - beta * quad) / alpha

    lam, V = pred.lam, pred.V
    mask = lam > 1e-7 * jnp.maximum(jnp.max(lam), 1.0)
    lam_safe = jnp.where(mask, lam, 1.0)
    q = jnp.where(mask,
                  (1 / (alpha + beta * lam_safe) - 1 / alpha) / lam_safe,
                  0.0)
    W = jnp.einsum("bkd,de->bke", A, V)
    Sigma_q = JJt / alpha + jnp.einsum("bkd,d,bld->bkl", W, q, W)
    # at this well-conditioned toy scale the two forms agree
    np.testing.assert_allclose(np.asarray(Sigma_q), np.asarray(Sigma),
                               rtol=5e-3, atol=1e-4)

    # dense twin: J S^{-1} J^T through the D x D curvature
    S_dense = ops.curvature_dense(state, Z, alpha, full_set_size=32)
    S_inv = jnp.linalg.inv(S_dense)
    lin = ops.linearize_model(state, xt)
    J = jax.vmap(lambda xi: jax.jacrev(
        lambda p: lin.f_single(p, xi))(lin.flat_params))(xt)   # (B, K, D)
    Sigma_dense = jnp.einsum("bkd,de,ble->bkl", J, S_inv, J)

    np.testing.assert_allclose(np.asarray(Sigma), np.asarray(Sigma_dense),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(lin.f0),
                               rtol=1e-6, atol=1e-6)

    # sample moments: cov method vs weight method, large-S MC agreement
    key = jax.random.PRNGKey(3)
    S_mc = 4096
    cov_s = np.asarray(pred.logit_samples(xt, alpha, key, S_mc))
    w_pred = ScalableLLAPredictor(state, Z, full_set_size=32)
    wt_s = np.asarray(w_pred.logit_samples(xt, alpha, key, S_mc))
    tol = 6.0 * np.maximum(cov_s.std(0), wt_s.std(0)) / np.sqrt(S_mc) + 1e-3
    assert np.all(np.abs(cov_s.mean(0) - wt_s.mean(0)) <= tol)
    np.testing.assert_allclose(cov_s.std(0), wt_s.std(0), rtol=0.15,
                               atol=5e-3)


def test_cov_method_cache_and_harness_integration():
    """cache_key reuse must be exact, jac_block must not change values, and
    the eval harness must run end-to-end with a cov predictor."""
    _, state, (x, y) = classifier_state()
    Z = x[:6]
    pred = ScalableLLAPredictor(state, Z, full_set_size=32, method="cov",
                                jac_block=3)
    key = jax.random.PRNGKey(0)
    a = np.asarray(pred.logit_samples(x[:7], 0.5, key, 8, cache_key=("t", 0)))
    assert ("t", 0) in pred._stats_cache
    b = np.asarray(pred.logit_samples(x[:7], 0.5, key, 8, cache_key=("t", 0)))
    np.testing.assert_array_equal(a, b)

    nob = ScalableLLAPredictor(state, Z, full_set_size=32, method="cov")
    c = np.asarray(nob.logit_samples(x[:7], 0.5, key, 8))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)

    loader = DataLoader(ArrayDataset(x, y), batch_size=8, shuffle=False,
                        drop_last=False)
    nll, acc = eval_dataset(state, loader, Z, alpha=0.5, full_set_size=32,
                            num_mc_samples=16, rng=jax.random.PRNGKey(1),
                            predictor=pred)
    assert np.isfinite(nll) and 0.0 <= acc <= 1.0
    assert any(k[0] == "eval" for k in pred._stats_cache)


def test_cov_woodbury_accurate_on_ill_conditioned_gram():
    """Regression for the LeNet silent-variance-shrink bug: with a Gram
    spectrum spanning ~5 decades, f32 eigh reconstruction of S^-1 is
    O(1)-wrong (measured negative predictive variances). Pin the
    production H-form assembly against a dense D x D oracle."""
    from laplace_inducing_points_tpu.inference.lla import _joint_logit_samples

    key = jax.random.PRNGKey(0)
    d_z, D, K, B = 100, 1500, 3, 2
    basis = jax.random.normal(key, (d_z, D)) / jnp.sqrt(D)
    scales = jnp.exp(jnp.linspace(jnp.log(1e-3), jnp.log(300.0), d_z))
    R = basis * scales[:, None]                      # lam up to ~9e4
    gram = R @ R.T
    lam, V = jnp.linalg.eigh(0.5 * (gram + gram.T))
    J = jax.random.normal(jax.random.fold_in(key, 1), (B, K, D))
    JJt = jnp.einsum("bkd,bld->bkl", J, J)
    A = jnp.einsum("bkd,ed->bke", J, R)
    f0 = jnp.zeros((B, K))
    alpha, beta = 50.0, 80.0

    S_mc = 8000
    draws = _joint_logit_samples(f0, JJt, A, gram, lam, V, alpha, beta,
                                 jax.random.PRNGKey(2), S_mc, 1e-7, 1.0)
    emp = jnp.einsum("sbk,sbl->bkl", draws, draws) / S_mc

    S_dense = alpha * jnp.eye(D) + beta * (R.T @ R)
    Sigma_oracle = jnp.einsum("bkd,de,ble->bkl", J,
                              jnp.linalg.inv(S_dense), J)
    # diagonal: MC rel error ~ sqrt(2/S) ~ 1.6%; off-diagonal entries are
    # near zero with MC std ~ sqrt(Sii*Sjj/S) ~ 0.33 — bound absolutely
    d_emp = np.asarray(jnp.diagonal(emp, axis1=-2, axis2=-1))
    d_orc = np.asarray(jnp.diagonal(Sigma_oracle, axis1=-2, axis2=-1))
    np.testing.assert_allclose(d_emp, d_orc, rtol=0.08)
    np.testing.assert_allclose(np.asarray(emp), np.asarray(Sigma_oracle),
                               atol=4.0 * float(d_orc.max()) / np.sqrt(S_mc))


def test_matfree_predictor_matches_matheron_sampler():
    """method='matfree' (round 4, VERDICT r3 item 3): the d_z-unbounded
    predictor's draws must equal sample(method='matheron',
    materialize_w=False) pushed through the same linearized forward — the
    documented RNG contract — at equal CG configuration. The sampler
    itself carries the covariance-exactness dense twins
    (tests/test_sample.py); this pins the predictor wiring to it."""
    from laplace_inducing_points_tpu.core import operators as ops
    from laplace_inducing_points_tpu.inference.sample import sample

    _, state, (x, y) = classifier_state()
    Z = x[:5]
    alpha, key, S = 0.3, jax.random.PRNGKey(21), 6
    xt = jnp.asarray(x[:8], jnp.float32)

    pred = ScalableLLAPredictor(state, Z, full_set_size=17,
                                method="matfree", cg_tol=1e-10,
                                precond_rank=4)
    got = pred.logit_samples(xt, alpha, key, S)

    w = sample(state, Z, alpha, key, num_samples=S, full_set_size=17,
               method="matheron", materialize_w=False, cg_tol=1e-10,
               precond_rank=4)
    lin = ops.linearize_model(state, xt)
    want = lin.f0[None] + jax.vmap(lin.jvp)(w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_matfree_predictor_never_materializes_rows_and_evals():
    """The matfree predictor must hold NO (d_z, D) or (d_z, d_z) arrays
    (that is its reason to exist), and the eval harness must run end-to-end
    on it with metrics matching the materialized weight path within MC
    noise."""
    _, state, (x, y) = classifier_state()
    Z = x[:6]
    D = 0
    from laplace_inducing_points_tpu.core.params import flatten_nn_params
    D = flatten_nn_params(state.params)[0].shape[0]

    pred = ScalableLLAPredictor(state, Z, full_set_size=32,
                                method="matfree", cg_tol=1e-8,
                                precond_rank=4)
    assert not hasattr(pred, "R")
    d_z = pred.nys[0].shape[0]
    for leaf in jax.tree_util.tree_leaves(pred.nys):
        assert leaf.ndim < 2 or leaf.shape[1] < d_z       # (d_z, rank) only
        assert D not in leaf.shape

    loader = DataLoader(ArrayDataset(x, y), batch_size=16)
    rng = jax.random.PRNGKey(5)
    nll_mf, acc_mf = eval_dataset(state, loader, Z, alpha=0.3,
                                  full_set_size=32, num_mc_samples=64,
                                  rng=rng, predictor=pred)
    pred_w = ScalableLLAPredictor(state, Z, full_set_size=32)
    nll_w, acc_w = eval_dataset(state, loader, Z, alpha=0.3,
                                full_set_size=32, num_mc_samples=64,
                                rng=rng, predictor=pred_w)
    assert abs(acc_mf - acc_w) < 0.15
    assert abs(nll_mf - nll_w) < 0.2


def test_matfree_predictor_warns_on_cg_stall():
    """Accuracy contract: a maxiter exit must not be silent."""
    import pytest

    _, state, (x, y) = classifier_state()
    Z = x[:5]
    pred = ScalableLLAPredictor(state, Z, full_set_size=17,
                                method="matfree", cg_tol=1e-8,
                                cg_maxiter=1, precond_rank=None)
    with pytest.warns(UserWarning, match="maxiter"):
        pred.logit_samples(jnp.asarray(x[:4], jnp.float32), 0.3,
                           jax.random.PRNGKey(2), 4)


def test_eigh_host_factor_matches_device_eigh():
    """Round-5: the host-LAPACK eigh fallback (v5e HBM escape hatch for
    d_z >= 8192 weight/cov factor builds) must produce the same posterior
    factor as the on-device eigh — same eigenvalues, same draws through
    the amortized sampler under a shared key."""
    _, state, (x, y) = classifier_state()
    Z = x[:6]
    key = jax.random.PRNGKey(7)

    dev = ScalableLLAPredictor(state, Z, full_set_size=32, eigh_host=False)
    host = ScalableLLAPredictor(state, Z, full_set_size=32, eigh_host=True)
    np.testing.assert_allclose(np.asarray(host.lam), np.asarray(dev.lam),
                               rtol=1e-5, atol=1e-6)
    # V has per-column sign/rotation freedom; compare through the draws
    got = host.logit_samples(x[:8], 0.3, key, 32)
    want = dev.logit_samples(x[:8], 0.3, key, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_matfree_predictor_cg_example_block_twin():
    """The blocked-operator matfree predictor (cg_example_block, round 5)
    must produce the same logit samples as the monolithic one — identical
    RNG stream, identical CG fixed point, block-structured jvp/vjp only."""
    _, state, (x, _) = classifier_state()
    Z, xt = x[:6], x[6:14]
    kw = dict(full_set_size=24, method="matfree", cg_tol=1e-8,
              cg_maxiter=400, precond_rank=4)
    p_mono = ScalableLLAPredictor(state, Z, **kw)
    p_blk = ScalableLLAPredictor(state, Z, cg_example_block=2, **kw)
    key = jax.random.PRNGKey(11)
    s_mono = p_mono.logit_samples(xt, 0.45, key, 8)
    s_blk = p_blk.logit_samples(xt, 0.45, key, 8)
    assert jnp.allclose(s_mono, s_blk, rtol=1e-4, atol=1e-4)
