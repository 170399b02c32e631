"""Golden-value parity test: banana IP-LLA vs the reference's recorded
operating point (BASELINE.md, `/root/reference/vis-exp-data.py:5-39`).

The fixtures under tests/golden/banana/ are the artifacts of one
`main_toy full_pipeline` run with the DEFAULT settings (config alpha
end-to-end, gram objective, reference-parity range clip) on the
bit-faithful reference data instance (banana n=500, noise=0.090,
seed=584848 — `/root/reference/Makefile:125-131`; our generator consumes
randomness in the reference's order, `data/toy.py::banana_dataset`).

Reference recorded operating points (mean over reps):
  scalable IP-LLA MC=1000 : NLL 0.1704  ECE 0.1468  AUROC 92.96
  dense    IP-LLA         : NLL 0.2008  ECE 0.1732  AUROC 93.98
This framework's pipeline (recorded in RESULTS.md): NLL 0.233, ECE 0.146,
AUROC 100.0 — ECE matches the scalable row to 1e-3, NLL sits within the
reference's own scalable-vs-dense spread (+0.03 of the dense row), AUROC
beats both. The exact values are irreproducible even from the reference
repo (its MAP batch order is torch-shuffle unseeded), so the assertions pin
(a) a tight regression band around OUR recorded artifacts and (b) a
reference-envelope band.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "banana")


@pytest.fixture(scope="module")
def banana_setup(tmp_path_factory):
    from laplace_inducing_points_tpu.data.loader import (ArrayDataset,
                                                         make_dataloaders)
    from laplace_inducing_points_tpu.data.toy import (ensure_toy_npz,
                                                      load_dataset,
                                                      train_test_val_split)
    from laplace_inducing_points_tpu.models.registry import get_model
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.utils.checkpoint import (
        load_array, load_run_meta, load_train_state)

    data_dir = str(tmp_path_factory.mktemp("golden_data"))
    # the reference's published generation params -> bit-stable instance
    path = ensure_toy_npz("banana", data_dir=data_dir, n=500, noise=0.090,
                          seed=584848)
    x, y = load_dataset(path)
    tr, te, va = train_test_val_split(x, y)
    _, test_loader, _ = make_dataloaders(
        ArrayDataset(*tr), ArrayDataset(*te), ArrayDataset(*va), 32)
    ring = ensure_toy_npz("ring", data_dir=data_dir)
    xr, yr = load_dataset(ring)
    trr, terr, varr = train_test_val_split(xr, yr)
    _, ood_loader, _ = make_dataloaders(
        ArrayDataset(*trr), ArrayDataset(*terr), ArrayDataset(*varr), 32)

    model = get_model({"name": "classifier", "type": "classifier",
                       "num_h": 16, "num_l": 3, "num_c": 2})
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(tr[0][:1]), optax.adam(1e-3),
                               model_kind="classifier")
    state = load_train_state(state, os.path.join(GOLDEN, "map"))
    Z = load_array(GOLDEN, "ind_banana", 500)
    meta = load_run_meta(GOLDEN, "ind_banana")
    return state, Z, meta, test_loader, ood_loader


def test_golden_banana_parity(banana_setup):
    from laplace_inducing_points_tpu.evaluation.harness import (
        auroc_ood, eval_dataset_extended)
    from laplace_inducing_points_tpu.inference.lla import ScalableLLAPredictor

    state, Z, meta, test_loader, ood_loader = banana_setup
    alpha = meta["alpha_ip"]            # pipeline-recorded, NOT hand-picked
    assert alpha == pytest.approx(0.0025)

    pred = ScalableLLAPredictor(state, Z, full_set_size=450,
                                range_clip_min=1.0)
    rec = eval_dataset_extended(
        state, test_loader, Z, alpha=alpha, full_set_size=450,
        num_mc_samples=200, rng=jax.random.PRNGKey(0), predictor=pred)
    auroc = auroc_ood(
        state, rec["probs"], ood_loader, Z, alpha=alpha, full_set_size=450,
        num_mc_samples=200, rng=jax.random.PRNGKey(1), predictor=pred)

    # (a) tight regression band around the recorded pipeline output
    # (MC=200 vs the recorded MC=1000 adds a little sampling slack)
    assert rec["nll"] == pytest.approx(0.233, abs=0.03), rec
    assert rec["ece"] == pytest.approx(0.146, abs=0.03), rec
    assert rec["acc"] == pytest.approx(0.98, abs=0.021), rec
    assert auroc >= 0.97

    # (b) reference-envelope band (BASELINE.md scalable/dense rows)
    assert abs(rec["nll"] - 0.1704) < 0.09
    assert abs(rec["ece"] - 0.1468) < 0.035
    assert auroc >= 0.9296 - 0.02
