"""LSTM-GMM agent (reference agents/models/gmm/lstm_gmm.py:12-97).

An LSTM consumes the observation sequence and a GMM head models the action
distribution at every step; training maximizes the likelihood of the final
window action, inference carries the recurrent state across env steps (the
policy carry IS the LSTM state — the functional fit for the reference's
`init_hidden_states` threading).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.gmm import gmm_log_prob
from d3il_tpu.data.scaler import Scaler


class LSTMGMMNet(nn.Module):
    hidden_dim: int = 256
    num_layers: int = 2
    action_dim: int = 2
    n_gaussians: int = 8
    min_std: float = 1e-4

    def setup(self):
        self.cells = [nn.OptimizedLSTMCell(self.hidden_dim)
                      for _ in range(self.num_layers)]
        self.mid = nn.Dense(self.hidden_dim)
        self.mean_head = nn.Dense(self.n_gaussians * self.action_dim)
        self.std_head = nn.Dense(self.n_gaussians * self.action_dim)
        self.logit_head = nn.Dense(self.n_gaussians)

    @staticmethod
    def zero_state(num_layers, hidden_dim, batch_shape):
        """LSTM carry (c, h per layer) — plain zeros, usable outside apply."""
        z = jnp.zeros(batch_shape + (hidden_dim,), jnp.float32)
        return tuple((z, z) for _ in range(num_layers))

    def step(self, state, x):
        """One LSTM tick: x [..., Do] -> (state', features [..., H])."""
        new_state = []
        h = x
        for cell, st in zip(self.cells, state):
            st, h = cell(st, h)
            new_state.append(st)
        return tuple(new_state), h

    def head(self, h):
        h = nn.relu(self.mid(h))
        K, D = self.n_gaussians, self.action_dim
        # 2.1*tanh mean squash (ref agents/models/gmm/lstm_gmm.py:82) —
        # bounds component means to the scaled-action range
        means = 2.1 * jnp.tanh(
            self.mean_head(h).reshape(h.shape[:-1] + (K, D)))
        stds = jax.nn.softplus(self.std_head(h)).reshape(
            h.shape[:-1] + (K, D)) + self.min_std
        return means, stds, self.logit_head(h)

    def __call__(self, xs):
        """xs [B, W, Do] -> GMM params of the final step."""
        state = self.zero_state(self.num_layers, self.hidden_dim,
                                xs.shape[:1])
        scan = nn.scan(lambda mdl, c, x: mdl.step(c, x),
                       variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        state, hs = scan(self, state, xs)
        return self.head(hs[:, -1])


@dataclass
class LSTMGMMAgent:
    model: LSTMGMMNet
    params: Any
    scaler: Scaler
    window_size: int = 5
    low_noise_eval: bool = True

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, hidden_dim=256,
               num_layers=2, n_gaussians=8, window_size=5, **_):
        model = LSTMGMMNet(hidden_dim=hidden_dim, num_layers=num_layers,
                           action_dim=action_dim, n_gaussians=n_gaussians)
        params = model.init(key, jnp.zeros((1, window_size, obs_dim)))
        return LSTMGMMAgent(model=model, params=params, scaler=scaler,
                            window_size=window_size)

    def loss_fn(self):
        model, scaler = self.model, self.scaler

        def loss(params, obs_w, act_w, key):
            x = scaler.scale_input(obs_w)
            a = scaler.scale_output(act_w[:, -1])
            means, stds, logits = model.apply(params, x)
            return -jnp.mean(gmm_log_prob(means, stds, logits, a))

        return loss

    def policy_apply(self):
        model, scaler = self.model, self.scaler
        low_noise = self.low_noise_eval

        def apply(params, carry, obs):
            state, key = carry
            x = scaler.scale_input(obs)[None]
            state, h = model.apply(params, state, x,
                                   method=LSTMGMMNet.step)
            means, stds, logits = model.apply(params, h,
                                              method=LSTMGMMNet.head)
            key, k1, k2 = jax.random.split(key, 3)
            comp = jax.random.categorical(k1, logits[0])
            std = jnp.where(low_noise, 1e-4, 1.0) * stds[0, comp]
            a = means[0, comp] + std * jax.random.normal(k2, std.shape)
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (state, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        state = LSTMGMMNet.zero_state(self.model.num_layers,
                                      self.model.hidden_dim, (1,))
        return (state, key if key is not None else jax.random.PRNGKey(0))
