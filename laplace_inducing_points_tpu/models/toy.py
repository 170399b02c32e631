"""Toy models: small MLP regressor / classifier.

Parity: ``/root/reference/src/toymodels.py:4-37``. Architectures match
(GELU MLP + learned scalar observation-noise ``logvar`` for regression;
tanh MLP for classification) with a uniform ``__call__(x, train=...)``
signature so every model in the zoo is interchangeable downstream.
"""

from __future__ import annotations

import flax.linen as nn


class SimpleRegressor(nn.Module):
    """GELU MLP with a learned homoscedastic log-variance.

    Returns ``(mu, logvar)``; ``logvar`` is a trainable parameter that is
    *excluded* from curvature (it parametrizes the Gaussian likelihood, not
    the function). It lives at ``params['logvar']``.
    """
    num_hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(self.num_layers):
            h = nn.gelu(nn.Dense(self.num_hidden)(h))
        mu = nn.Dense(1)(h)
        logvar = self.param("logvar", nn.initializers.zeros, ())
        return mu, logvar


class SimpleClassifier(nn.Module):
    """tanh MLP emitting ``num_classes`` logits."""
    num_hidden: int
    num_layers: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(self.num_layers):
            h = nn.tanh(nn.Dense(self.num_hidden)(h))
        return nn.Dense(self.num_classes)(h)
