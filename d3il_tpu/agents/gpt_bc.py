"""GPT-BC agent: causal transformer regression over the obs window
(reference agents/gpt_bc_agent.py:78 + models/transformer/gpt_policy.py:
MinGPT backbone, MSE on the last token's action)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.transformer import GPT
from d3il_tpu.data.scaler import Scaler


@dataclass
class GPTBCAgent:
    model: GPT
    params: Any
    scaler: Scaler
    window_size: int = 5

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, n_embd=120, n_head=4,
               n_layer=4, window_size=5, **_):
        model = GPT(n_embd=n_embd, n_head=n_head, n_layer=n_layer,
                    block_size=window_size, output_dim=action_dim)
        params = model.init(key, jnp.zeros((1, window_size, obs_dim)))
        return GPTBCAgent(model=model, params=params, scaler=scaler,
                          window_size=window_size)

    def loss_fn(self):
        model, scaler = self.model, self.scaler

        def loss(params, obs_w, act_w, key):
            x = scaler.scale_input(obs_w)              # [B, W, Do]
            y = scaler.scale_output(act_w)             # [B, W, Da]
            pred = model.apply(params, x)
            return jnp.mean((pred - y) ** 2)

        return loss

    def policy_apply(self):
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
            x = scaler.scale_input(window)
            pred = model.apply(params, x[None])[0, -1]  # last token
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return (window, filled), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del key
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32))
