"""ACT agent: action chunking with a transformer CVAE.

Reference: agents/act_agent.py:22 (chunked predict with action buffer: one
model call per action_seq_size env steps, 207-240; KL weight 241-253) +
models/act/act_vae.py:325 (action-sequence encoder -> z; decoder
cross-attends learned query tokens over [state, z]).

Simplified faithful structure: encoder GPT over [state, action chunk] -> z
(mu, logvar); decoder GPT over [state_emb, z_emb, query tokens] -> chunk of
actions. Inference samples z = 0 (the CVAE prior mean, standard ACT).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.transformer import Block
from d3il_tpu.data.scaler import Scaler


class ACTNet(nn.Module):
    embed_dim: int = 64
    n_heads: int = 4
    enc_layers: int = 2
    dec_layers: int = 4
    latent_dim: int = 32
    chunk: int = 8
    action_dim: int = 2

    def setup(self):
        self.state_in = nn.Dense(self.embed_dim)
        self.act_in = nn.Dense(self.embed_dim)
        self.enc_blocks = [Block(self.embed_dim, self.n_heads)
                           for _ in range(self.enc_layers)]
        self.z_head = nn.Dense(2 * self.latent_dim)
        self.z_in = nn.Dense(self.embed_dim)
        self.dec_blocks = [Block(self.embed_dim, self.n_heads)
                           for _ in range(self.dec_layers)]
        self.out = nn.Dense(self.action_dim)
        self.query = self.param("query", nn.initializers.normal(0.02),
                                (1, self.chunk, self.embed_dim))

    def encode(self, s, chunk):
        """s [B, Ds], chunk [B, C, Da] -> (mu, logvar)."""
        toks = jnp.concatenate(
            [self.state_in(s)[:, None], self.act_in(chunk)], axis=1)
        h = toks
        for blk in self.enc_blocks:
            h = blk(h)
        stats = self.z_head(h[:, 0])
        return stats[:, :self.latent_dim], stats[:, self.latent_dim:]

    def decode(self, s, z):
        B = s.shape[0]
        toks = jnp.concatenate(
            [self.state_in(s)[:, None], self.z_in(z)[:, None],
             jnp.tile(self.query, (B, 1, 1))], axis=1)
        h = toks
        for blk in self.dec_blocks:
            h = blk(h)
        return self.out(h[:, 2:])

    def __call__(self, s, chunk, key):
        mu, logvar = self.encode(s, chunk)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return self.decode(s, z), mu, logvar


@dataclass
class ACTAgent:
    model: ACTNet
    params: Any
    scaler: Scaler
    chunk: int = 8
    kl_weight: float = 10.0
    window_size: int = 1  # obs conditioning is the current obs

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, chunk=8, embed_dim=64,
               latent_dim=32, kl_weight=10.0, **_):
        model = ACTNet(embed_dim=embed_dim, latent_dim=latent_dim,
                       chunk=chunk, action_dim=action_dim)
        params = model.init(key, jnp.zeros((1, obs_dim)),
                            jnp.zeros((1, chunk, action_dim)),
                            jax.random.PRNGKey(0))
        return ACTAgent(model=model, params=params, scaler=scaler, chunk=chunk,
                        kl_weight=kl_weight)

    @property
    def train_window(self):
        """Window needed from the dataset sampler: 1 obs + chunk actions."""
        return self.chunk

    def loss_fn(self):
        model, scaler, klw = self.model, self.scaler, self.kl_weight

        def loss(params, obs_w, act_w, key):
            # window = chunk steps; condition on the first obs, reconstruct
            # the whole action chunk (act_agent.py train_step semantics)
            s = scaler.scale_input(obs_w[:, 0])
            chunk = scaler.scale_output(act_w)
            pred, mu, logvar = model.apply(params, s, chunk, key)
            recon = jnp.mean((pred - chunk) ** 2)
            kl = -0.5 * jnp.mean(
                jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))
            return recon + klw * kl

        return loss

    def policy_apply(self):
        """Chunked inference: one decode per `chunk` env steps, buffered
        replay in between (act_agent.py:207-240)."""
        model, scaler, C = self.model, self.scaler, self.chunk

        def apply(params, carry, obs):
            buf, k = carry  # buf [C, Da], k = next index in buffer
            s = scaler.scale_input(obs)[None]
            z = jnp.zeros((1, model.latent_dim), s.dtype)
            new_chunk = model.apply(params, s, z, method=ACTNet.decode)[0]
            need_new = k >= C
            buf = jnp.where(need_new, new_chunk, buf)
            k = jnp.where(need_new, 0, k)
            a = buf[k]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (buf, k + 1), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del key
        return (jnp.zeros((self.chunk, self.model.action_dim), jnp.float32),
                jnp.array(self.chunk, jnp.int32))
