"""BC-GMM agent (reference agents/models/gmm/bc_gmm.py + bc_gmm_agent config).

ResidualMLP trunk -> (means, stds, logits) heads for an n-component Gaussian
mixture over actions; trained with NLL, sampled at inference (component by
logits, then Gaussian; low_noise_eval uses tiny stds, bc_gmm.py:74-78).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP, mish
from d3il_tpu.data.scaler import Scaler


class GMMNet(nn.Module):
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    action_dim: int = 2
    n_gaussians: int = 8
    min_std: float = 1e-4

    @nn.compact
    def __call__(self, x):
        h = mish(ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                             self.hidden_dim)(x))
        K, D = self.n_gaussians, self.action_dim
        means = nn.Dense(K * D)(h).reshape(x.shape[:-1] + (K, D))
        stds = jax.nn.softplus(nn.Dense(K * D)(h)).reshape(
            x.shape[:-1] + (K, D)) + self.min_std
        logits = nn.Dense(K)(h)
        return means, stds, logits


def gmm_log_prob(means, stds, logits, a):
    """log p(a) under the mixture; a broadcast against [.., K, D]."""
    log_w = jax.nn.log_softmax(logits, axis=-1)
    z = (a[..., None, :] - means) / stds
    comp = -0.5 * jnp.sum(z ** 2 + jnp.log(2 * jnp.pi) + 2 * jnp.log(stds), axis=-1)
    return jax.scipy.special.logsumexp(log_w + comp, axis=-1)


@dataclass
class GMMAgent:
    model: GMMNet
    params: Any
    scaler: Scaler
    window_size: int = 1
    low_noise_eval: bool = True

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, hidden_dim=256,
               num_hidden_layers=4, n_gaussians=8, window_size=1,
               low_noise_eval=True):
        model = GMMNet(hidden_dim=hidden_dim,
                       num_hidden_layers=num_hidden_layers,
                       action_dim=action_dim, n_gaussians=n_gaussians)
        params = model.init(key, jnp.zeros((1, obs_dim * window_size)))
        return GMMAgent(model=model, params=params, scaler=scaler,
                        window_size=window_size, low_noise_eval=low_noise_eval)

    def loss_fn(self):
        model, scaler = self.model, self.scaler

        def loss(params, obs_w, act_w, key):
            x = scaler.scale_input(obs_w).reshape(obs_w.shape[0], -1)
            a = scaler.scale_output(act_w[:, -1])
            means, stds, logits = model.apply(params, x)
            return -jnp.mean(gmm_log_prob(means, stds, logits, a))

        return loss

    def policy_apply(self):
        model, scaler, W = self.model, self.scaler, self.window_size
        low_noise = self.low_noise_eval

        def apply(params, carry, obs):
            window, filled, key = carry
            shifted = jnp.concatenate([window[1:], obs[None]], axis=0)
            # before the window fills, repeat the oldest available obs —
            # done by seeding all W rows with the FIRST obs (gather-free;
            # the old dynamic-index form idx=max(arange, W-filled) faulted
            # the TPU runtime inside long batched rollouts)
            window = jnp.where(filled == 0,
                               jnp.broadcast_to(obs[None], shifted.shape),
                               shifted)
            filled = jnp.minimum(filled + 1, W)
            x = scaler.scale_input(window).reshape(-1)
            means, stds, logits = model.apply(params, x[None])
            key, k1, k2 = jax.random.split(key, 3)
            comp = jax.random.categorical(k1, logits[0])
            std = jnp.where(low_noise, 1e-4, 1.0) * stds[0, comp]
            a = means[0, comp] + std * jax.random.normal(k2, std.shape)
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
