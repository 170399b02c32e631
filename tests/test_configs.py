"""Config parity: every reference YAML has a named analog that loads, and
every experiment config builds its model and runs one MAP step.

Reference inventory: ``/root/reference/config/{toy,scale,tests}/*.yml``.
"""

import glob
import os

import jax
import jax.numpy as jnp
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs")

# reference file -> our analog (relative to configs/)
REFERENCE_ANALOGS = {
    "toy/toyclassifier_banana.yml": "toy/classifier_banana.yml",
    "toy/toyclassifier_spiral.yml": "toy/classifier_spiral.yml",
    "toy/toyclassifier_xor.yml": "toy/classifier_xor.yml",
    "toy/toyregressor_sine.yml": "toy/regressor_sine.yml",
    "toy/optimization_toyclassifier_banana.yml":
        "toy/optimization_classifier_banana.yml",
    "toy/optimization_toyclassifier_xor.yml":
        "toy/optimization_classifier_xor.yml",
    "toy/optimization_toyregressor_sine.yml":
        "toy/optimization_regressor_sine.yml",
    "scale/lenet5_mnist.yml": "scale/lenet5_mnist.yml",
    "scale/lenet5_fmnist.yml": "scale/lenet5_fmnist.yml",
    "scale/lenet5-2_mnist.yml": "scale/lenet5-2_mnist.yml",
    "scale/lenet5-2_fmnist.yml": "scale/lenet5-2_fmnist.yml",
    "scale/mlp_mnist.yml": "scale/mlp_mnist.yml",
    "scale/mlp_fmnist.yml": "scale/mlp_fmnist.yml",
    "scale/resnet1_cifar10.yml": "scale/resnet1m_cifar10.yml",
    "scale/resnet1-2_cifar10.yml": "scale/resnet1-2_cifar10.yml",
    "scale/resnet1_fmnist.yml": "scale/resnet1_fmnist.yml",
    "tests/toyclassifier.yml": "tests/toyclassifier.yml",
}

_INPUT_SHAPES = {"mnist": (28, 28, 1), "fmnist": (28, 28, 1),
                 "cifar10": (32, 32, 3)}


def test_every_reference_config_has_an_analog():
    for ref, ours in REFERENCE_ANALOGS.items():
        assert os.path.exists(os.path.join("/root/reference/config", ref)), \
            f"reference moved: {ref}"
        assert os.path.exists(os.path.join(CFG, ours)), \
            f"missing analog for reference config {ref}: configs/{ours}"


def _dummy_input(path, model_cfg):
    if "input_shape" in model_cfg:
        return jnp.zeros((2,) + tuple(model_cfg["input_shape"]))
    name = model_cfg["name"]
    if name in ("LeNet5", "ResNet1"):
        base = os.path.basename(path)
        for ds, shape in _INPUT_SHAPES.items():
            if ds in base:
                return jnp.zeros((2,) + shape)
        return jnp.zeros((2, 28, 28, 1))
    if name == "regressor":
        return jnp.zeros((2, 1))
    return jnp.zeros((2, 2))


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(CFG, "**", "*.yml"), recursive=True)))
def test_config_loads_and_runs_one_step(path):
    from laplace_inducing_points_tpu.models.registry import get_model
    from laplace_inducing_points_tpu.models.state import create_train_state
    from laplace_inducing_points_tpu.training.map import map_step
    from laplace_inducing_points_tpu.utils.config import (
        load_experiment_config)

    cfg = load_experiment_config(path)
    assert "optimization" in cfg
    if "model" not in cfg:        # standalone optimization_* variants
        assert "optimization_" in os.path.basename(path)
        assert cfg["optimization"]["map"]["epochs"] > 0
        return

    model = get_model(cfg["model"])
    x = _dummy_input(path, cfg["model"])
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               optax.adam(1e-3),
                               model_kind=cfg["model"]["type"])
    if cfg["model"]["type"] == "classifier":
        y = jnp.zeros((x.shape[0],), jnp.int32)
    else:
        y = jnp.zeros((x.shape[0], 1))
    state, loss = map_step(state, (x, y), cfg["optimization"]["alpha"])
    assert jnp.isfinite(loss)
