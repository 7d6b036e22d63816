"""DDPM diffusion-policy agent.

Reference: agents/ddpm_agent.py:23 + models/diffusion/diffusion_policy.py
(cosine beta schedule, epsilon prediction, T=50 default with script overrides,
EMA decay 0.995) and DiffusionMLPNetwork (diffusion_models.py:20: sinusoidal
t-embedding (t_dim=16) -> [obs, a_t, t_emb] -> residual MLP -> eps).

The reverse-diffusion sampler runs as a `lax.scan` inside the jitted policy —
T network forwards per env step stay entirely on device (the reference's
hot loop #2, SURVEY.md §3.2).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP, mish
from d3il_tpu.data.scaler import Scaler


def cosine_betas(T: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (diffusion_policy.py beta_schedule='cosine')."""
    t = np.linspace(0, T, T + 1) / T
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    alphas_bar = f / f[0]
    betas = 1 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0, 0.999)


class TimeEmbed(nn.Module):
    t_dim: int = 16

    @nn.compact
    def __call__(self, t):
        half = self.t_dim // 2
        freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / (half - 1))
        ang = t[..., None] * freqs
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(self.t_dim * 2)(emb)
        emb = mish(emb)
        return nn.Dense(self.t_dim)(emb)


class DenoiseMLP(nn.Module):
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    action_dim: int = 2
    t_dim: int = 16

    @nn.compact
    def __call__(self, obs, a_t, t):
        temb = TimeEmbed(self.t_dim)(t.astype(jnp.float32))
        x = jnp.concatenate([obs, a_t, temb], axis=-1)
        return ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                           self.action_dim)(x)


@dataclass
class DDPMAgent:
    model: DenoiseMLP
    params: Any
    scaler: Scaler
    n_timesteps: int = 16
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, hidden_dim=256,
               num_hidden_layers=4, n_timesteps=16, window_size=1):
        model = DenoiseMLP(hidden_dim=hidden_dim,
                           num_hidden_layers=num_hidden_layers,
                           action_dim=action_dim)
        params = model.init(key, jnp.zeros((1, obs_dim * window_size)),
                            jnp.zeros((1, action_dim)), jnp.zeros((1,)))
        return DDPMAgent(model=model, params=params, scaler=scaler,
                         n_timesteps=n_timesteps, window_size=window_size)

    def _schedule(self):
        betas = jnp.asarray(cosine_betas(self.n_timesteps), jnp.float32)
        alphas = 1.0 - betas
        abar = jnp.cumprod(alphas)
        abar_prev = jnp.concatenate([jnp.ones(1), abar[:-1]])
        return betas, alphas, abar, abar_prev

    def loss_fn(self):
        model, scaler, T = self.model, self.scaler, self.n_timesteps
        _, _, abar, _ = self._schedule()

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            s = scaler.scale_input(obs_w).reshape(B, -1)
            a0 = scaler.scale_output(act_w[:, -1])
            k1, k2 = jax.random.split(key)
            t = jax.random.randint(k1, (B,), 0, T)
            eps = jax.random.normal(k2, a0.shape)
            ab = abar[t][:, None]
            a_t = jnp.sqrt(ab) * a0 + jnp.sqrt(1 - ab) * eps
            eps_hat = model.apply(params, s, a_t, t)
            return jnp.mean((eps_hat - eps) ** 2)

        return loss

    def sample(self, params, s, key):
        """Reverse diffusion for a batch of scaled observations s [B, D]."""
        model, T = self.model, self.n_timesteps
        betas, alphas, abar, abar_prev = self._schedule()
        lo = self.scaler.y_bounds[0] * 1.1
        hi = self.scaler.y_bounds[1] * 1.1
        B = s.shape[0]
        key, k0 = jax.random.split(key)
        a = jax.random.normal(k0, (B, self.model.action_dim))

        def body(carry, t):
            a, key = carry
            key, kn = jax.random.split(key)
            tt = jnp.full((B,), t)
            eps_hat = model.apply(params, s, a, tt)
            # x0 estimate, clipped (clip_denoised=True, ddpm_agent.yaml:14)
            x0 = (a - jnp.sqrt(1 - abar[t]) * eps_hat) / jnp.sqrt(abar[t])
            x0 = jnp.clip(x0, lo, hi)
            mean = (jnp.sqrt(abar_prev[t]) * betas[t] / (1 - abar[t]) * x0
                    + jnp.sqrt(alphas[t]) * (1 - abar_prev[t]) / (1 - abar[t]) * a)
            var = betas[t] * (1 - abar_prev[t]) / (1 - abar[t])
            noise = jax.random.normal(kn, a.shape)
            a = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
            return (a, key), None

        (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(T - 1, -1, -1))
        return a

    def policy_apply(self):
        scaler, W = self.scaler, self.window_size
        agent = self

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
            a = agent.sample(params, x[None], sub)[0]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
