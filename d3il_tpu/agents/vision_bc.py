"""Vision BC agent: MultiImageObsEncoder + ResidualMLP head.

Reference: bc vision variant (agents/bc_agent.py:177-200
train_vision_agent + predict(..., if_vision=True) bc_agent.py:247-256):
(bp_image, inhand_image, robot_state) -> encoder features -> action.

Because this framework renders on device, the images need not be stored:
vision training can rasterize camera views from logged env states inside the
jitted train step (the dataset pipeline stays state-based).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP
from d3il_tpu.data.scaler import Scaler
from d3il_tpu.vision.encoder import MultiImageObsEncoder


class VisionPolicy(nn.Module):
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    num_kp: int = 32
    cam_feat: int = 64

    @nn.compact
    def __call__(self, bp_img, inhand_img, low_dim):
        feat = MultiImageObsEncoder(self.num_kp, self.cam_feat)(
            bp_img, inhand_img, low_dim)
        return ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                           self.action_dim)(feat)


@dataclass
class VisionBCAgent:
    model: VisionPolicy
    params: Any
    scaler: Scaler          # scales low_dim obs + actions
    render_fn: Callable     # state-obs window -> (bp_img, inhand_img, low_dim)

    @staticmethod
    def create(key, low_dim: int, action_dim: int, scaler, render_fn,
               res: int = 96, hidden_dim=256, num_hidden_layers=4, **_):
        model = VisionPolicy(action_dim=action_dim, hidden_dim=hidden_dim,
                             num_hidden_layers=num_hidden_layers)
        params = model.init(key, jnp.zeros((1, res, res, 3)),
                            jnp.zeros((1, res, res, 3)), jnp.zeros((1, low_dim)))
        return VisionBCAgent(model=model, params=params, scaler=scaler,
                             render_fn=render_fn)

    def loss_fn(self):
        model, scaler, render = self.model, self.scaler, self.render_fn

        def loss(params, obs_w, act_w, key):
            # render camera views from the logged state observation on device
            bp, inhand, low = jax.vmap(render)(obs_w[:, -1])
            y = scaler.scale_output(act_w[:, -1])
            pred = model.apply(params, bp, inhand, low)
            return jnp.mean((pred - y) ** 2)

        return loss

    def policy_apply(self):
        model, scaler, render = self.model, self.scaler, self.render_fn

        def apply(params, carry, obs):
            bp, inhand, low = render(obs)
            pred = model.apply(params, bp[None], inhand[None], low[None])[0]
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return carry, act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim, key
        return ()
