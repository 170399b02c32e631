"""Model factory keyed by config name.

Parity: ``get_model`` (``/root/reference/src/scalemodels.py:166-186``) with
the toy regressor added so every experiment flows through one registry.
"""

from __future__ import annotations

from typing import Any, Mapping

from laplace_inducing_points_tpu.models.scale import LargeClassifier, LeNet5, ResNet1M
from laplace_inducing_points_tpu.models.toy import SimpleClassifier, SimpleRegressor


def get_model(model_cfg: Mapping[str, Any]):
    name = model_cfg["name"]
    if name == "LeNet5":
        return LeNet5()
    if name == "large_classifier":
        return LargeClassifier(
            input_shape=tuple(model_cfg["input_shape"]),
            num_hidden=model_cfg["num_h"],
            num_layers=model_cfg["num_l"],
            num_classes=model_cfg.get("num_c"),
        )
    if name == "classifier":
        return SimpleClassifier(
            num_hidden=model_cfg["num_h"],
            num_layers=model_cfg["num_l"],
            num_classes=model_cfg.get("num_c"),
        )
    if name == "regressor":
        return SimpleRegressor(
            num_hidden=model_cfg["num_h"],
            num_layers=model_cfg["num_l"],
        )
    if name == "ResNet1":
        return ResNet1M(num_classes=model_cfg.get("num_c"))
    raise ValueError(f"Unknown model name: {name}")
