"""DDPM-ACT / encoder-decoder diffusion over action sequences.

Reference: agents/ddpm_encdec_agent.py:23 (chunked predict with action
buffer, 228-258) / models/diffusion/diffusion_models.py:687
(DiffusionEncDec: transformer over [obs tokens, sigma token, noisy action
tokens], predicting the action chunk's noise). Diffusion math shared with
the DDPM agent (cosine schedule, eps-prediction).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.ddpm import TimeEmbed, cosine_betas
from d3il_tpu.agents.nets.transformer import Block
from d3il_tpu.data.scaler import Scaler


class EncDecDenoiser(nn.Module):
    embed_dim: int = 96
    n_heads: int = 4
    n_layers: int = 4
    chunk: int = 8
    obs_tokens: int = 1
    action_dim: int = 2

    @nn.compact
    def __call__(self, s, a_chunk, t):
        """s [B, Ds], a_chunk [B, C, Da], t [B] -> eps [B, C, Da]."""
        B = s.shape[0]
        s_tok = nn.Dense(self.embed_dim)(s)[:, None]
        t_tok = nn.Dense(self.embed_dim)(
            TimeEmbed(16)(t.astype(jnp.float32)))[:, None]
        a_tok = nn.Dense(self.embed_dim)(a_chunk)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, self.chunk, self.embed_dim))
        toks = jnp.concatenate([s_tok, t_tok, a_tok + pos], axis=1)
        h = toks
        for _ in range(self.n_layers):
            h = Block(self.embed_dim, self.n_heads)(h)
        return nn.Dense(self.action_dim)(h[:, 2:])


@dataclass
class DDPMEncDecAgent:
    model: EncDecDenoiser
    params: Any
    scaler: Scaler
    chunk: int = 8
    n_timesteps: int = 16
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, chunk=8, embed_dim=96,
               n_timesteps=16, **_):
        model = EncDecDenoiser(embed_dim=embed_dim, chunk=chunk,
                               action_dim=action_dim)
        params = model.init(key, jnp.zeros((1, obs_dim)),
                            jnp.zeros((1, chunk, action_dim)), jnp.zeros((1,)))
        return DDPMEncDecAgent(model=model, params=params, scaler=scaler,
                               chunk=chunk, n_timesteps=n_timesteps)

    @property
    def train_window(self):
        return self.chunk

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
            s = scaler.scale_input(obs_w[:, 0])
            a0 = scaler.scale_output(act_w)          # [B, C, Da]
            k1, k2 = jax.random.split(key)
            t = jax.random.randint(k1, (B,), 0, T)
            eps = jax.random.normal(k2, a0.shape)
            ab = abar[t][:, None, None]
            a_t = jnp.sqrt(ab) * a0 + jnp.sqrt(1 - ab) * eps
            eps_hat = model.apply(params, s, a_t, t)
            return jnp.mean((eps_hat - eps) ** 2)

        return loss

    def sample_chunk(self, params, s, key):
        model, T = self.model, self.n_timesteps
        betas, alphas, abar, abar_prev = self._schedule()
        lo = self.scaler.y_bounds[0] * 1.1
        hi = self.scaler.y_bounds[1] * 1.1
        key, k0 = jax.random.split(key)
        a = jax.random.normal(k0, (1, self.chunk, model.action_dim))

        def body(carry, t):
            a, key = carry
            key, kn = jax.random.split(key)
            eps_hat = model.apply(params, s, a, jnp.full((1,), t))
            x0 = (a - jnp.sqrt(1 - abar[t]) * eps_hat) / jnp.sqrt(abar[t])
            x0 = jnp.clip(x0, lo, hi)
            mean = (jnp.sqrt(abar_prev[t]) * betas[t] / (1 - abar[t]) * x0
                    + jnp.sqrt(alphas[t]) * (1 - abar_prev[t]) / (1 - abar[t]) * a)
            var = betas[t] * (1 - abar_prev[t]) / (1 - abar[t])
            a = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) \
                * jax.random.normal(kn, a.shape)
            return (a, key), None

        (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(T - 1, -1, -1))
        return a[0]

    def policy_apply(self):
        scaler, C = self.scaler, self.chunk
        agent = self

        def apply(params, carry, obs):
            buf, k, key = carry
            s = scaler.scale_input(obs)[None]
            key, sub = jax.random.split(key)
            new_chunk = agent.sample_chunk(params, s, sub)
            need_new = k >= C
            buf = jnp.where(need_new, new_chunk, buf)
            k = jnp.where(need_new, 0, k)
            act = scaler.inverse_scale_output(scaler.clip_action(buf[k]))
            return (buf, k + 1, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.chunk, self.model.action_dim), jnp.float32),
                jnp.array(self.chunk, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
