"""MLP backbones (Flax).

ResidualMLP mirrors the reference's IBC-style pre-activation residual network
(agents/models/common/mlp.py:9-46 TwoLayerPreActivationResNetLinear,
:114 ResidualMLPNetwork; default activation Mish, dropout 0, no norm in the
benchmark configs).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS = {"Mish": mish, "ReLU": nn.relu, "relu": nn.relu, "tanh": nn.tanh,
         "gelu": nn.gelu}


class ResidualBlock(nn.Module):
    hidden_dim: int
    act: Callable = mish
    dropout_rate: float = 0.0
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        if self.use_norm:
            h = nn.LayerNorm(epsilon=1e-6)(h)
        h = self.act(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.hidden_dim)(h)
        if self.use_norm:
            h = nn.LayerNorm(epsilon=1e-6)(h)
        h = self.act(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.hidden_dim)(h)
        return x + h


class ResidualMLP(nn.Module):
    hidden_dim: int = 100
    num_hidden_layers: int = 4   # must be even: pairs form residual blocks
    output_dim: int = 2
    activation: str = "Mish"
    dropout_rate: float = 0.0
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.activation]
        x = nn.Dense(self.hidden_dim)(x)
        for _ in range(self.num_hidden_layers // 2):
            x = ResidualBlock(self.hidden_dim, act, self.dropout_rate,
                              self.use_norm)(x, train)
        return nn.Dense(self.output_dim)(x)


class MLP(nn.Module):
    """Plain MLP (reference MLPNetwork, mlp.py:49-106)."""
    hidden_dim: int = 100
    num_hidden_layers: int = 1
    output_dim: int = 1
    activation: str = "ReLU"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.activation]
        for _ in range(self.num_hidden_layers):
            x = act(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)
