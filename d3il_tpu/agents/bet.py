"""Behavior Transformer (BeT) agents: k-means action bins + focal loss + offsets.

Reference: agents/bet_agent.py:23 (GPT latent generator,
models/bet/latent_generators/mingpt.py:74-140: focal classification loss over
64 k-means bins + masked per-bin offset MSE, offset_loss_scale 1.0, focal
gamma 2.0; discretizer fit over all actions, action_ae/discretizers/
k_means.py:10-37) and agents/bet_mlp_agent.py:153 (same heads on a
ResidualMLP backbone, no history).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP, mish
from d3il_tpu.agents.nets.transformer import GPT
from d3il_tpu.data.scaler import Scaler
import flax.linen as nn


def kmeans_fit(actions: np.ndarray, n_bins: int = 64, iters: int = 50,
               seed: int = 0) -> np.ndarray:
    """K-means over (scaled) actions (reference k_means.py:28-37)."""
    rng = np.random.default_rng(seed)
    centers = actions[rng.choice(len(actions), n_bins, replace=False)].copy()
    for _ in range(iters):
        d = ((actions[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for k in range(n_bins):
            m = assign == k
            if m.any():
                centers[k] = actions[m].mean(0)
    return centers


def focal_loss(logits, targets, gamma: float = 2.0):
    """(mingpt.py:110-117): CE scaled by (1-p)^gamma."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp_t = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(lp_t)
    return -((1 - p_t) ** gamma) * lp_t


class BeTMLPHead(nn.Module):
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    n_bins: int = 64
    action_dim: int = 2

    @nn.compact
    def __call__(self, x):
        h = mish(ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                             self.hidden_dim)(x))
        logits = nn.Dense(self.n_bins)(h)
        offsets = nn.Dense(self.n_bins * self.action_dim)(h).reshape(
            x.shape[:-1] + (self.n_bins, self.action_dim))
        return logits, offsets


class BeTGPTHead(nn.Module):
    n_embd: int = 120
    n_head: int = 4
    n_layer: int = 4
    block_size: int = 10
    n_bins: int = 64
    action_dim: int = 2

    @nn.compact
    def __call__(self, x):
        out = GPT(self.n_embd, self.n_head, self.n_layer, self.block_size,
                  self.n_bins * (1 + self.action_dim))(x)
        logits = out[..., :self.n_bins]
        offsets = out[..., self.n_bins:].reshape(
            x.shape[:-1] + (self.n_bins, self.action_dim))
        return logits, offsets


@dataclass
class BeTAgent:
    model: Any
    params: Any
    scaler: Scaler
    centers: jax.Array          # [n_bins, Da] in scaled action space
    window_size: int = 1
    use_gpt: bool = False
    focal_gamma: float = 2.0
    offset_scale: float = 1.0

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, train_actions_scaled,
               hidden_dim=256, num_hidden_layers=4, n_bins=64,
               window_size=1, use_gpt=False, n_embd=120, n_head=4, n_layer=4,
               **_):
        centers = jnp.asarray(
            kmeans_fit(np.asarray(train_actions_scaled), n_bins), jnp.float32)
        if use_gpt:
            model = BeTGPTHead(n_embd, n_head, n_layer, window_size, n_bins,
                               action_dim)
            params = model.init(key, jnp.zeros((1, window_size, obs_dim)))
        else:
            model = BeTMLPHead(hidden_dim, num_hidden_layers, n_bins, action_dim)
            params = model.init(key, jnp.zeros((1, obs_dim * window_size)))
        return BeTAgent(model=model, params=params, scaler=scaler,
                        centers=centers, window_size=window_size,
                        use_gpt=use_gpt)

    def loss_fn(self):
        model, scaler, centers = self.model, self.scaler, self.centers
        gamma, oscale, use_gpt = self.focal_gamma, self.offset_scale, self.use_gpt

        def loss(params, obs_w, act_w, key):
            if use_gpt:
                x = scaler.scale_input(obs_w)
                y = scaler.scale_output(act_w)            # [B, W, Da]
                logits, offsets = model.apply(params, x)  # [B,W,K], [B,W,K,Da]
            else:
                x = scaler.scale_input(obs_w).reshape(obs_w.shape[0], -1)
                y = scaler.scale_output(act_w[:, -1])
                logits, offsets = model.apply(params, x)
            d = ((y[..., None, :] - centers) ** 2).sum(-1)
            bins = d.argmin(-1)
            cls = focal_loss(logits, bins, gamma).mean()
            off_t = jnp.take_along_axis(
                offsets, bins[..., None, None].repeat(offsets.shape[-1], -1),
                axis=-2)[..., 0, :]
            resid = y - jnp.take(centers, bins, axis=0)
            off = jnp.mean((off_t - resid) ** 2)
            return cls + oscale * off

        return loss

    def policy_apply(self):
        model, scaler, centers, W = (self.model, self.scaler, self.centers,
                                     self.window_size)
        use_gpt = self.use_gpt

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
            w = scaler.scale_input(window)
            if use_gpt:
                logits, offsets = model.apply(params, w[None])
                logits, offsets = logits[0, -1], offsets[0, -1]
            else:
                logits, offsets = model.apply(params, w.reshape(1, -1))
                logits, offsets = logits[0], offsets[0]
            key, k1 = jax.random.split(key)
            bin_idx = jax.random.categorical(k1, logits)
            a = centers[bin_idx] + offsets[bin_idx]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
