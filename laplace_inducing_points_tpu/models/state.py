"""Train state with auxiliary collections and model-kind tag.

Parity: ``/root/reference/src/scalemodels.py:160-163`` (``TrainState`` with
``batch_stats``) — extended with a static ``model_kind`` field so downstream
code never threads a ``model_type`` string separately.
"""

from __future__ import annotations

from typing import Any

import optax
from flax import struct
from flax.core.frozen_dict import freeze
from flax.training import train_state

EMPTY_STATS = freeze({})


class TrainState(train_state.TrainState):
    batch_stats: Any = EMPTY_STATS
    model_kind: str = struct.field(pytree_node=False, default="classifier")


def create_train_state(model, rng, dummy_input, tx: optax.GradientTransformation,
                       model_kind: str) -> TrainState:
    """Initialize a model and wrap it in a TrainState.

    The regressor's learned ``logvar`` lives inside ``params`` as a top-level
    ``logvar`` collection key so the optimizer trains it while curvature code
    excludes it (see ``core.params.EXCLUDED_COLLECTIONS``).
    """
    variables = model.init(rng, dummy_input, train=True)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", EMPTY_STATS),
        tx=tx,
        model_kind=model_kind,
    )
