"""Vision agents: shared image encoder + per-method heads.

Reference: the 9 *_vision_agent.py variants (agents/bc_agent.py:177-200
train_vision_agent, agents/ddpm_vision_agent.py:424, bet_mlp_vision_agent.py
:523) all route (bp_image, inhand_image, robot_state) through the shared
MultiImageObsEncoder (multi_image_obs_encoder.py:11) and reuse the state
method's loss on the encoded features. Here the same composition is explicit:
every vision agent owns an encoder module and a method head in one Flax
param tree (features train end-to-end, as in the reference), and renders its
images ON DEVICE from the state observation via a task render_fn
(vision/taskviews.py) — training needs no image dataset, and evaluation
renders from live env state inside the jitted rollout (the
stacking_vision_sim.py:128-167 predict(..., if_vision=True) semantics).

All vision agents are single-frame (reference vision configs use
window_size 1 for the MLP-family methods).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.agents.bet import focal_loss, kmeans_fit
from d3il_tpu.agents.ddpm import TimeEmbed, cosine_betas
from d3il_tpu.agents.nets.mlp import ResidualMLP, mish
from d3il_tpu.data.scaler import Scaler
from d3il_tpu.vision.encoder import MultiImageObsEncoder

_EPS = 1e-12


def _scale_low(scaler: Scaler, low):
    """Z-score the low-dim robot-state prefix with the leading slice of the
    full-obs scaler statistics (the prefix IS the first k obs dims)."""
    k = low.shape[-1]
    return (low - scaler.x_mean[:k]) / (scaler.x_std[:k] + _EPS)


class _VisionCore(nn.Module):
    """Encoder shared by all vision heads."""
    num_kp: int = 32
    cam_feat: int = 64

    @nn.compact
    def __call__(self, bp, ih, low):
        return MultiImageObsEncoder(self.num_kp, self.cam_feat)(bp, ih, low)


class VisionBCNet(nn.Module):
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4

    @nn.compact
    def __call__(self, bp, ih, low):
        feat = _VisionCore()(bp, ih, low)
        return ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                           self.action_dim)(feat)


class VisionDDPMNet(nn.Module):
    """Encoder + conditional denoiser; `encode` runs once per env step, the
    T reverse-diffusion steps reuse the features."""
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    t_dim: int = 16

    def setup(self):
        self.core = _VisionCore()
        self.temb = TimeEmbed(self.t_dim)
        self.head = ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                                self.action_dim)

    def encode(self, bp, ih, low):
        return self.core(bp, ih, low)

    def denoise(self, feat, a_t, t):
        e = self.temb(t.astype(jnp.float32))
        return self.head(jnp.concatenate([feat, a_t, e], axis=-1))

    def __call__(self, bp, ih, low, a_t, t):
        return self.denoise(self.encode(bp, ih, low), a_t, t)


class VisionBeTNet(nn.Module):
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    n_bins: int = 64

    @nn.compact
    def __call__(self, bp, ih, low):
        feat = _VisionCore()(bp, ih, low)
        h = mish(ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                             self.hidden_dim)(feat))
        logits = nn.Dense(self.n_bins)(h)
        offsets = nn.Dense(self.n_bins * self.action_dim)(h).reshape(
            h.shape[:-1] + (self.n_bins, self.action_dim))
        return logits, offsets


def _dummy_batch(low_dim, res):
    img = jnp.zeros((1, res, res, 3))
    return img, img, jnp.zeros((1, low_dim))


@dataclass
class VisionBCAgent:
    """bc vision variant (bc_agent.py:177-200)."""
    model: VisionBCNet
    params: Any
    scaler: Scaler
    render_fn: Callable   # obs -> (bp, ih, low)
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4, **_):
        del obs_dim
        model = VisionBCNet(action_dim=action_dim, hidden_dim=hidden_dim,
                            num_hidden_layers=num_hidden_layers)
        params = model.init(key, *_dummy_batch(low_dim, res))
        return VisionBCAgent(model=model, params=params, scaler=scaler,
                             render_fn=render_fn)

    def loss_fn(self):
        model, scaler, render = self.model, self.scaler, self.render_fn

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            y = scaler.scale_output(act_w[:, -1])
            pred = model.apply(params, bp, ih, _scale_low(scaler, low))
            return jnp.mean((pred - y) ** 2)

        return loss

    def policy_apply(self):
        model, scaler, render = self.model, self.scaler, self.render_fn

        def apply(params, carry, obs):
            bp, ih, low = render(obs)
            pred = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None])[0]
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return carry, act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim, key
        return ()


@dataclass
class VisionDDPMAgent:
    """ddpm vision variant (ddpm_vision_agent.py): DDPM loss/sampling on
    encoder features (schedule identical to the state DDPMAgent)."""
    model: VisionDDPMNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    n_timesteps: int = 16
    window_size: int = 1

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4,
               n_timesteps=16, **_):
        del obs_dim
        model = VisionDDPMNet(action_dim=action_dim, hidden_dim=hidden_dim,
                              num_hidden_layers=num_hidden_layers)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, action_dim)), jnp.zeros((1,)))
        return VisionDDPMAgent(model=model, params=params, scaler=scaler,
                               render_fn=render_fn, n_timesteps=n_timesteps)

    def _schedule(self):
        betas = jnp.asarray(cosine_betas(self.n_timesteps), jnp.float32)
        alphas = 1.0 - betas
        abar = jnp.cumprod(alphas)
        abar_prev = jnp.concatenate([jnp.ones(1), abar[:-1]])
        return betas, alphas, abar, abar_prev

    def loss_fn(self):
        model, scaler, render, T = (self.model, self.scaler, self.render_fn,
                                    self.n_timesteps)
        _, _, abar, _ = self._schedule()

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            a0 = scaler.scale_output(act_w[:, -1])
            k1, k2 = jax.random.split(key)
            t = jax.random.randint(k1, (B,), 0, T)
            eps = jax.random.normal(k2, a0.shape)
            ab = abar[t][:, None]
            a_t = jnp.sqrt(ab) * a0 + jnp.sqrt(1 - ab) * eps
            eps_hat = model.apply(params, bp, ih, _scale_low(scaler, low),
                                  a_t, t)
            return jnp.mean((eps_hat - eps) ** 2)

        return loss

    def policy_apply(self):
        agent = self
        model, scaler, render, T = (self.model, self.scaler, self.render_fn,
                                    self.n_timesteps)
        betas, alphas, abar, abar_prev = self._schedule()
        lo = self.scaler.y_bounds[0] * 1.1
        hi = self.scaler.y_bounds[1] * 1.1

        def apply(params, carry, obs):
            key, = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionDDPMNet.encode)
            key, k0 = jax.random.split(key)
            a = jax.random.normal(k0, (1, model.action_dim))

            def body(c, t):
                a, key = c
                key, kn = jax.random.split(key)
                tt = jnp.full((1,), t)
                eps_hat = model.apply(params, feat, a, tt,
                                      method=VisionDDPMNet.denoise)
                x0 = (a - jnp.sqrt(1 - abar[t]) * eps_hat) / jnp.sqrt(abar[t])
                x0 = jnp.clip(x0, lo, hi)
                mean = (jnp.sqrt(abar_prev[t]) * betas[t] / (1 - abar[t]) * x0
                        + jnp.sqrt(alphas[t]) * (1 - abar_prev[t])
                        / (1 - abar[t]) * a)
                var = betas[t] * (1 - abar_prev[t]) / (1 - abar[t])
                noise = jax.random.normal(kn, a.shape)
                a = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
                return (a, key), None

            (a, key), _ = jax.lax.scan(body, (a, key),
                                       jnp.arange(T - 1, -1, -1))
            act = scaler.inverse_scale_output(scaler.clip_action(a[0]))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)


@dataclass
class VisionBeTAgent:
    """bet_mlp vision variant (bet_mlp_vision_agent.py:523): focal bin
    classification + per-bin offsets on encoder features."""
    model: VisionBeTNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    centers: jax.Array
    window_size: int = 1
    focal_gamma: float = 2.0
    offset_scale: float = 1.0

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, train_actions_scaled,
               render_fn=None, low_dim=4, res: int = 96, hidden_dim=256,
               num_hidden_layers=4, n_bins=64, **_):
        del obs_dim
        centers = jnp.asarray(
            kmeans_fit(np.asarray(train_actions_scaled), n_bins), jnp.float32)
        model = VisionBeTNet(action_dim=action_dim, hidden_dim=hidden_dim,
                             num_hidden_layers=num_hidden_layers,
                             n_bins=n_bins)
        params = model.init(key, *_dummy_batch(low_dim, res))
        return VisionBeTAgent(model=model, params=params, scaler=scaler,
                              render_fn=render_fn, centers=centers)

    def loss_fn(self):
        model, scaler, render, centers = (self.model, self.scaler,
                                          self.render_fn, self.centers)
        gamma, oscale = self.focal_gamma, self.offset_scale

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            y = scaler.scale_output(act_w[:, -1])
            logits, offsets = model.apply(params, bp, ih,
                                          _scale_low(scaler, low))
            d = ((y[:, None, :] - centers) ** 2).sum(-1)
            bins = d.argmin(-1)
            cls = focal_loss(logits, bins, gamma).mean()
            off_t = jnp.take_along_axis(
                offsets, bins[:, None, None].repeat(offsets.shape[-1], -1),
                axis=-2)[:, 0, :]
            resid = y - jnp.take(centers, bins, axis=0)
            off = jnp.mean((off_t - resid) ** 2)
            return cls + oscale * off

        return loss

    def policy_apply(self):
        model, scaler, render, centers = (self.model, self.scaler,
                                          self.render_fn, self.centers)

        def apply(params, carry, obs):
            key, = carry
            bp, ih, low = render(obs)
            logits, offsets = model.apply(params, bp[None], ih[None],
                                          _scale_low(scaler, low)[None])
            key, k1 = jax.random.split(key)
            bin_idx = jax.random.categorical(k1, logits[0])
            a = centers[bin_idx] + offsets[0, bin_idx]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)
