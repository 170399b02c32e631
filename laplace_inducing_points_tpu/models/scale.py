"""Scale models: LeNet-5, wide MLP, ~1M-param ResNet.

Parity: ``/root/reference/src/scalemodels.py:11-157``. Same architectures
(parameter counts match so curvature dimensions line up with the reference
experiments) with a uniform ``__call__(x, train=...)`` signature.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class LeNet5(nn.Module):
    """LeNet-5 for 28×28×1 inputs (~62k params), padded to 32×32."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[None]
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        x = nn.relu(nn.Conv(6, (5, 5), padding="VALID")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(16, (5, 5), padding="VALID")(x))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(120)(x))
        x = nn.relu(nn.Dense(84)(x))
        return nn.Dense(10)(x)


class LargeClassifier(nn.Module):
    """Wide tanh MLP over flattened inputs."""
    input_shape: tuple
    num_hidden: Sequence[int]
    num_layers: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape == tuple(self.input_shape):
            x = x.reshape(-1)
        else:
            x = x.reshape(x.shape[0], -1)
        for j in range(self.num_layers):
            x = nn.tanh(nn.Dense(self.num_hidden[j])(x))
        return nn.Dense(self.num_classes)(x)


class BasicBlock(nn.Module):
    """Residual block: two 3×3 convs with BatchNorm, projection shortcut."""
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               padding="SAME", use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet1M(nn.Module):
    """~1M-parameter ResNet: stages of 3 BasicBlocks at widths [32, 64, 128]."""
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            x = x[None]
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        for _ in range(3):
            x = BasicBlock(32)(x, train=train)
        x = BasicBlock(64, stride=2)(x, train=train)
        for _ in range(2):
            x = BasicBlock(64)(x, train=train)
        x = BasicBlock(128, stride=2)(x, train=train)
        for _ in range(2):
            x = BasicBlock(128)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
