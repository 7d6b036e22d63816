"""Conditional VAE agent (reference agents/cvae_agent.py:17 + models/vae/cvae.py).

Encoder([s,a]) -> (mu, std); z = mu + std*eps; decoder([s,z]) -> a_hat.
Loss: recon MSE + beta * KL (cvae_agent loss). Inference: z ~ N(0,1)
clamped to +-0.5, decode (cvae.py:56-62).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP
from d3il_tpu.data.scaler import Scaler


class CVAENet(nn.Module):
    latent_dim: int = 32
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    action_dim: int = 2

    def setup(self):
        self.enc = ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                               self.hidden_dim)
        self.mean_head = nn.Dense(self.latent_dim)
        self.logstd_head = nn.Dense(self.latent_dim)
        self.dec = ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                               self.action_dim)

    def encode(self, s, a):
        h = self.enc(jnp.concatenate([s, a], axis=-1))
        # NB: the reference treats the second head's output directly as std
        # (cvae.py:49-51: z = mean + std * eps with std = log_std head output)
        return self.mean_head(h), self.logstd_head(h)

    def decode(self, s, z):
        return self.dec(jnp.concatenate([s, z], axis=-1))

    def __call__(self, s, a, key):
        mean, std = self.encode(s, a)
        z = mean + std * jax.random.normal(key, std.shape)
        return self.decode(s, z), mean, std


@dataclass
class CVAEAgent:
    model: CVAENet
    params: Any
    scaler: Scaler
    beta: float = 1.0
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, latent_dim=32,
               hidden_dim=256, num_hidden_layers=4, beta=1.0, window_size=1):
        model = CVAENet(latent_dim=latent_dim, hidden_dim=hidden_dim,
                        num_hidden_layers=num_hidden_layers,
                        action_dim=action_dim)
        params = model.init(key, jnp.zeros((1, obs_dim * window_size)),
                            jnp.zeros((1, action_dim)), jax.random.PRNGKey(0))
        return CVAEAgent(model=model, params=params, scaler=scaler, beta=beta,
                         window_size=window_size)

    def loss_fn(self):
        model, scaler, beta = self.model, self.scaler, self.beta

        def loss(params, obs_w, act_w, key):
            s = scaler.scale_input(obs_w).reshape(obs_w.shape[0], -1)
            a = scaler.scale_output(act_w[:, -1])
            a_hat, mean, std = model.apply(params, s, a, key)
            recon = jnp.mean((a_hat - a) ** 2)
            var = std ** 2
            kl = 0.5 * jnp.mean(jnp.sum(mean ** 2 + var - jnp.log(var + 1e-8) - 1,
                                        axis=-1))
            return recon + beta * kl

        return loss

    def policy_apply(self):
        model, scaler, W = self.model, self.scaler, self.window_size
        latent_dim = self.model.latent_dim

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
            key, sub = jax.random.split(key)
            z = jnp.clip(jax.random.normal(sub, (latent_dim,)), -0.5, 0.5)
            pred = model.apply(params, x[None], z[None], method=CVAENet.decode)[0]
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        import jax.random as jr
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jr.PRNGKey(0))
