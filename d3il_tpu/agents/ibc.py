"""Implicit BC (IBC): energy-based model with InfoNCE + on-device samplers.

Reference: agents/ibc_agent.py:21 (InfoNCE loss over 8 MCMC train negatives,
ibc_agent.py:288-349; cfg ibc_agent.yaml:23-42) / models/ibc/ebms.py:11
(EBM MLP over [s, a]); inference: 64-sample Langevin with polynomial step
decay + a refinement pass (samplers/langevin_mcmc.py:16), or the
derivative-free optimizer (samplers/derivative_free_optimizer.py:12).

Both the Langevin chains and the derivative-free optimizer run as lax loops
inside the jitted policy — the reference's hot loop #2 fully on device.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP
from d3il_tpu.data.scaler import Scaler


class EBM(nn.Module):
    hidden_dim: int = 256
    num_hidden_layers: int = 4

    @nn.compact
    def __call__(self, s, a):
        x = jnp.concatenate([s, a], axis=-1)
        return ResidualMLP(self.hidden_dim, self.num_hidden_layers, 1)(x)[..., 0]


def langevin_sample(model, params, s, key, n_samples, action_dim, bounds,
                    n_iters=20, step_init=0.5, step_decay=0.8,
                    noise_scale=0.5):
    """Batched Langevin MCMC argmin-E (langevin_mcmc.py semantics)."""
    kb, kn = jax.random.split(key)
    lo, hi = bounds
    a = jax.random.uniform(kb, (n_samples, action_dim)) * (hi - lo) + lo
    s_rep = jnp.broadcast_to(s, (n_samples,) + s.shape)

    def energy_sum(a):
        return model.apply(params, s_rep, a).sum()

    def body(carry, k):
        a, step = carry
        g = jax.grad(energy_sum)(a)
        noise = jax.random.normal(k, a.shape)
        a = a - step * g + noise_scale * jnp.sqrt(2 * step) * noise * step
        a = jnp.clip(a, lo, hi)
        return (a, step * step_decay), None

    keys = jax.random.split(kn, n_iters)
    (a, _), _ = jax.lax.scan(body, (a, step_init), keys)
    e = model.apply(params, s_rep, a)
    return a[jnp.argmin(e)]


def dfo_sample(model, params, s, key, n_samples, action_dim, bounds,
               n_iters=3, sigma=0.033, shrink=0.5):
    """Derivative-free optimizer (derivative_free_optimizer.py:12): sample,
    softmax-resample, shrink noise."""
    lo, hi = bounds
    k0, key = jax.random.split(key)
    a = jax.random.uniform(k0, (n_samples, action_dim)) * (hi - lo) + lo
    s_rep = jnp.broadcast_to(s, (n_samples,) + s.shape)

    def body(carry, k):
        a, sig = carry
        e = model.apply(params, s_rep, a)
        k1, k2 = jax.random.split(k)
        probs = jax.nn.softmax(-e)
        idx = jax.random.categorical(k1, jnp.log(probs + 1e-12),
                                     shape=(n_samples,))
        a = a[idx] + sig * jax.random.normal(k2, a.shape)
        a = jnp.clip(a, lo, hi)
        return (a, sig * shrink), None

    (a, _), _ = jax.lax.scan(body, (a, sigma), jax.random.split(key, n_iters))
    e = model.apply(params, s_rep, a)
    return a[jnp.argmin(e)]


@dataclass
class IBCAgent:
    model: EBM
    params: Any
    scaler: Scaler
    n_negatives: int = 8
    n_infer_samples: int = 64
    sampler: str = "dfo"   # "dfo" | "langevin"
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, hidden_dim=256,
               num_hidden_layers=4, window_size=1, sampler="dfo", **_):
        model = EBM(hidden_dim=hidden_dim, num_hidden_layers=num_hidden_layers)
        params = model.init(key, jnp.zeros((1, obs_dim * window_size)),
                            jnp.zeros((1, action_dim)))
        return IBCAgent(model=model, params=params, scaler=scaler,
                        window_size=window_size, sampler=sampler)

    def _bounds(self):
        return (self.scaler.y_bounds[0] * 1.1, self.scaler.y_bounds[1] * 1.1)

    def loss_fn(self):
        model, scaler, K = self.model, self.scaler, self.n_negatives
        bounds = self._bounds()

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            s = scaler.scale_input(obs_w).reshape(B, -1)
            a_pos = scaler.scale_output(act_w[:, -1])
            lo, hi = bounds
            a_neg = jax.random.uniform(key, (B, K, a_pos.shape[-1])) \
                * (hi - lo) + lo
            a_all = jnp.concatenate([a_pos[:, None], a_neg], axis=1)  # [B,K+1,Da]
            s_rep = jnp.broadcast_to(s[:, None], (B, K + 1, s.shape[-1]))
            e = model.apply(params, s_rep, a_all)                     # [B,K+1]
            # InfoNCE: positive should have the LOWEST energy (ebm_losses.py)
            logits = -e
            return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

        return loss

    def policy_apply(self):
        model, scaler, W = self.model, self.scaler, self.window_size
        N, sampler, bounds = self.n_infer_samples, self.sampler, self._bounds()

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
            s = scaler.scale_input(window).reshape(-1)
            key, k1 = jax.random.split(key)
            fn = langevin_sample if sampler == "langevin" else dfo_sample
            a = fn(model, params, s, k1, N, scaler.y_mean.shape[-1], bounds)
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
