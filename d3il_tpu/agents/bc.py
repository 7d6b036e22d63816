"""BC-MLP agent: MSE behavioral cloning (reference agents/bc_agent.py:72).

Model: ResidualMLP on the (windowed, flattened) observation; training scales
obs/actions with the dataset Scaler and regresses scaled actions with MSE
(bc_agent.py:109-175); inference scales the obs, runs one forward pass and
clamps the unscaled action to 1.1x data bounds (bc_agent.py:247-274).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from d3il_tpu.agents import base
from d3il_tpu.agents.nets.mlp import ResidualMLP
from d3il_tpu.data.scaler import Scaler


@dataclass
class BCAgent:
    model: ResidualMLP
    params: Any
    scaler: Scaler
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim: int, action_dim: int, scaler: Scaler,
               hidden_dim: int = 256, num_hidden_layers: int = 4,
               window_size: int = 1) -> "BCAgent":
        model = ResidualMLP(hidden_dim=hidden_dim,
                            num_hidden_layers=num_hidden_layers,
                            output_dim=action_dim)
        params = model.init(key, jnp.zeros((1, obs_dim * window_size)))
        return BCAgent(model=model, params=params, scaler=scaler,
                       window_size=window_size)

    def loss_fn(self):
        model, scaler = self.model, self.scaler

        def loss(params, obs_w, act_w, key):
            # window flattened into features; target = last action in window
            x = scaler.scale_input(obs_w).reshape(obs_w.shape[0], -1)
            y = scaler.scale_output(act_w[:, -1])
            pred = model.apply(params, x)
            return jnp.mean((pred - y) ** 2)

        return loss

    def policy_apply(self):
        """(params, carry, obs) -> (carry, action) for the rollout harness.

        carry holds the obs window deque as a fixed-size array
        (reference predict keeps a deque of window_size obs,
        bc_agent.py:247-260).
        """
        model, scaler, W = self.model, self.scaler, self.window_size

        def apply(params, carry, obs):
            window, filled = carry
            shifted = jnp.concatenate([window[1:], obs[None]], axis=0)
            # before the window fills, repeat the oldest available obs —
            # done by seeding all W rows with the FIRST obs (gather-free;
            # the old dynamic-index form idx=max(arange, W-filled) faulted
            # the TPU runtime inside long batched rollouts)
            window = jnp.where(filled == 0,
                               jnp.broadcast_to(obs[None], shifted.shape),
                               shifted)
            filled = jnp.minimum(filled + 1, W)
            w = window
            x = scaler.scale_input(w).reshape(-1)
            pred = model.apply(params, x[None])[0]
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return (window, filled), act

        return apply

    def init_carry(self, obs_dim: int, key=None):
        del key  # deterministic policy
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32))
