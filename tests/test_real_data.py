"""The REAL-data ingestion path, exercised by a committed fixture.

``data/fixtures/digits_mini`` holds 100 train / 40 test REAL handwritten
digit images (UCI optical digits via sklearn, 8x8, public domain) written
as canonical IDX .gz files — so the IDX reader, the import tool's
validation, and an end-to-end learning run all execute on genuine image
data despite the zero-egress environment (round-1 VERDICT item 8).
"""

import gzip
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "data", "fixtures", "digits_mini")


def test_idx_reader_loads_real_digits():
    from laplace_inducing_points_tpu.data.scale import load_arrays

    x, y = load_arrays("mnist", train=True, root=FIXTURE,
                       allow_synthetic=False)
    xt, yt = load_arrays("mnist", train=False, root=FIXTURE,
                         allow_synthetic=False)
    assert x.shape == (100, 8, 8, 1) and xt.shape == (40, 8, 8, 1)
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert set(np.unique(y)) <= set(range(10))
    # real data, not the synthetic surrogate: the surrogate's per-class
    # images are near-identical smooth patterns; real digits vary
    cls = y[0]
    same = x[y == cls]
    assert same.shape[0] >= 2
    assert np.abs(same[0] - same[1]).max() > 0.2


def test_import_tool_validates_and_installs(tmp_path):
    from laplace_inducing_points_tpu.data.import_data import (
        import_idx, validate_idx_pair)
    from laplace_inducing_points_tpu.data.scale import load_arrays

    src = os.path.join(FIXTURE, "MNIST", "raw")
    n, rows, cols = validate_idx_pair(
        os.path.join(src, "train-images-idx3-ubyte.gz"),
        os.path.join(src, "train-labels-idx1-ubyte.gz"))
    assert (n, rows, cols) == (100, 8, 8)

    root = str(tmp_path / "data")
    # non-strict: the fixture is NOT the canonical MNIST files, so md5s
    # differ — a warning, not an error
    import_idx("mnist", src, root=root, strict=False)
    x, y = load_arrays("mnist", train=True, root=root,
                       allow_synthetic=False)
    assert x.shape == (100, 8, 8, 1)
    with pytest.raises(ValueError, match="md5"):
        import_idx("mnist", src, root=str(tmp_path / "d2"), strict=True)


def test_import_rejects_corrupt_idx(tmp_path):
    from laplace_inducing_points_tpu.data.import_data import validate_idx_pair

    img = os.path.join(FIXTURE, "MNIST", "raw", "train-images-idx3-ubyte.gz")
    lab = os.path.join(FIXTURE, "MNIST", "raw", "train-labels-idx1-ubyte.gz")
    bad = str(tmp_path / "train-images-idx3-ubyte.gz")
    payload = gzip.open(img, "rb").read()
    with gzip.open(bad, "wb") as f:
        f.write(payload[:16] + payload[16:-5])      # truncated pixel body
    with pytest.raises(ValueError, match="pixel"):
        validate_idx_pair(bad, lab)


def test_model_learns_real_digits():
    """End-to-end: MAP training on the real 8x8 digits beats chance by a
    wide margin — the data is real and the pipeline learns from it."""
    from laplace_inducing_points_tpu.data.scale import load_arrays
    from laplace_inducing_points_tpu.models.scale import LargeClassifier
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.training.map import map_step

    x, y = load_arrays("mnist", train=True, root=FIXTURE,
                       allow_synthetic=False)
    xt, yt = load_arrays("mnist", train=False, root=FIXTURE,
                         allow_synthetic=False)
    model = LargeClassifier(input_shape=(8, 8, 1), num_hidden=[32],
                            num_layers=1, num_classes=10)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), optax.adam(5e-3),
                               model_kind="classifier")
    batch = (jnp.asarray(x), jnp.asarray(y))
    for _ in range(60):
        state, loss = map_step(state, batch, 1e-4)
    logits = state.apply_fn({"params": state.params}, jnp.asarray(xt),
                            train=False)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(yt)))
    assert acc > 0.5, f"real-digit test accuracy {acc} (chance = 0.1)"


def _digits_heldout_map(seed: int = 0):
    """Shared prologue of the real-digit e2e tests: the 5-way held-out-class
    split (train on digits 0-4; real 5-9 = OOD — the zero-egress analog of
    the reference's MNIST-vs-FMNIST pairing,
    ``scale_experiments/evaluate.py:236-351``) + a trained MAP state."""
    from laplace_inducing_points_tpu.data.scale import load_arrays
    from laplace_inducing_points_tpu.models.scale import LargeClassifier
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.training.map import map_step

    x, y = load_arrays("mnist", train=True, root=FIXTURE,
                       allow_synthetic=False)
    xt, yt = load_arrays("mnist", train=False, root=FIXTURE,
                         allow_synthetic=False)
    id_tr = y < 5
    id_te, ood_te = yt < 5, yt >= 5
    xtr, ytr = jnp.asarray(x[id_tr]), jnp.asarray(y[id_tr])
    xte, yte = xt[id_te], yt[id_te]
    xood, yood = xt[ood_te], yt[ood_te] - 5   # OOD labels unused

    model = LargeClassifier(input_shape=(8, 8, 1), num_hidden=[32],
                            num_layers=1, num_classes=5)
    state = create_train_state(model, jax.random.PRNGKey(seed), xtr[:1],
                               optax.adam(5e-3), model_kind="classifier")
    for _ in range(80):
        state, _ = map_step(state, (xtr, ytr), 1e-4)
    return state, xtr, ytr, xte, yte, xood, yood


def _digits_full_pipeline(num_mc: int = 64, seed: int = 0):
    """MAP -> inducing -> IP-LLA eval -> OOD, entirely on REAL images.

    Returns the metrics record dict (shared by the CI test and the
    ``results/digits_mini_e2e.jsonl`` writer).
    """
    from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                         make_dataloaders)
    from laplace_inducing_points_tpu.evaluation.harness import (
        auroc_ood, eval_dataset_extended)
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
    from laplace_inducing_points_tpu.training.inducing import (
        train_inducing_points)

    state, xtr, ytr, xte, yte, xood, yood = _digits_heldout_map(seed)

    # inducing points: M=12 real images, gram objective on full-batch X
    N = int(xtr.shape[0])
    Z = train_inducing_points(
        state, xtr[:12], optax.adam(5e-2),
        batches=iter(lambda: (xtr, ytr), None),    # infinite full batches
        alpha=0.1, num_steps=15, full_set_size=N, objective="gram",
        verbose=False)

    _, test_loader, _ = make_dataloaders(
        ArrayDataset(np.asarray(xtr), np.asarray(ytr)),
        ArrayDataset(xte, yte), ArrayDataset(xte, yte), 20)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(xood, yood), ArrayDataset(xood, yood),
        ArrayDataset(xood, yood), 20)

    pred = ScalableLLAPredictor(state, Z, full_set_size=N,
                                range_clip_min=1.0)
    rec = eval_dataset_extended(
        state, test_loader, Z, alpha=0.1, full_set_size=N,
        num_mc_samples=num_mc, rng=jax.random.PRNGKey(1), predictor=pred)
    rec["ood_auroc"] = auroc_ood(
        state, rec["probs"], ood_loader, Z, alpha=0.1, full_set_size=N,
        num_mc_samples=num_mc, rng=jax.random.PRNGKey(2), predictor=pred)
    rec["n_train"], rec["n_test"], rec["n_ood"] = (
        int(xtr.shape[0]), int(xte.shape[0]), int(xood.shape[0]))
    return rec


def test_full_pipeline_on_real_digits():
    """CI: the complete MAP->inducing->IP-LLA->OOD pipeline on real images
    (round-2 VERDICT item 5). Asserts learning, calibration finiteness and
    genuine OOD separation on held-out real classes."""
    rec = _digits_full_pipeline()
    assert rec["acc"] > 0.6, rec
    assert np.isfinite(rec["nll"]) and np.isfinite(rec["ece"])
    assert rec["nll"] < 1.2, rec
    assert rec["ood_auroc"] > 0.6, rec


def test_round3_paths_on_real_digits():
    """Round 4 (VERDICT r3 item 6): the round-3/4 production machinery on
    REAL images, not only the gram+spectral pair — the
    ``stochastic_matfree`` objective (Nyström-preconditioned CG-Woodbury)
    TRAINS Z, and the matfree (Matheron-CG), cov, and weight predictives
    all EVALUATE on the committed real digits with consistent metrics."""
    from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                         make_dataloaders)
    from laplace_inducing_points_tpu.evaluation.harness import (
        auroc_ood, eval_dataset_extended)
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor
    from laplace_inducing_points_tpu.training.inducing import (
        matfree_cg_healthcheck, train_inducing_points)

    state, xtr, ytr, xte, yte, xood, yood = _digits_heldout_map()
    N = int(xtr.shape[0])

    # matfree KL objective trains Z on real images (CG-Woodbury + Nyström)
    Z = train_inducing_points(
        state, xtr[:8], optax.adam(5e-2),
        batches=iter(lambda: (xtr, ytr), None),
        alpha=0.1, num_steps=6, full_set_size=N,
        objective="stochastic_matfree", st_samples=16, slq_samples=1,
        slq_num_matvecs=8, cg_tol=1e-5, precond_rank=8, verbose=False)
    assert bool(jnp.all(jnp.isfinite(Z)))
    # cg_tol=1e-5 sits at this problem's f32 residual floor (eps*kappa ~
    # 6e-8 * 619 ~ 4e-5, and the measured residual lands 3.7-5.5e-5
    # depending on compile-to-compile op ordering), so asserting the
    # healthcheck's converged flag at that tol pinned a threshold inside
    # round-off noise. Assert against the floor with headroom instead —
    # a genuine maxiter stall is orders of magnitude above it (the pre-fix
    # failure mode measured residuals of 1e-1..1e+0).
    hc = matfree_cg_healthcheck(state, Z, 0.1, full_set_size=N,
                                cg_tol=1e-5, precond_rank=8, warn=False)
    assert hc["cg_rel_residual"] < 2e-4, hc

    _, test_loader, _ = make_dataloaders(
        ArrayDataset(np.asarray(xtr), np.asarray(ytr)),
        ArrayDataset(xte, yte), ArrayDataset(xte, yte), 20)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(xood, yood), ArrayDataset(xood, yood),
        ArrayDataset(xood, yood), 20)

    recs = {}
    for method in ("weight", "cov", "matfree"):
        pred = ScalableLLAPredictor(state, Z, full_set_size=N,
                                    method=method, precond_rank=8,
                                    cg_tol=1e-5)
        rec = eval_dataset_extended(
            state, test_loader, Z, alpha=0.1, full_set_size=N,
            num_mc_samples=96, rng=jax.random.PRNGKey(1), predictor=pred)
        rec["ood_auroc"] = auroc_ood(
            state, rec["probs"], ood_loader, Z, alpha=0.1, full_set_size=N,
            num_mc_samples=96, rng=jax.random.PRNGKey(2), predictor=pred)
        recs[method] = rec
        assert np.isfinite(rec["nll"]) and np.isfinite(rec["ece"]), (method,
                                                                     rec)
        assert rec["acc"] > 0.6, (method, rec)
        assert rec["ood_auroc"] > 0.6, (method, rec)

    # the three predictives sample the SAME posterior — metrics agree
    # within MC noise (weight/matfree differ only by CG tolerance; cov by
    # construction of the per-image Gaussian)
    for m in ("cov", "matfree"):
        assert abs(recs[m]["nll"] - recs["weight"]["nll"]) < 0.25, (m, recs)
        assert abs(recs[m]["acc"] - recs["weight"]["acc"]) < 0.15, (m, recs)
