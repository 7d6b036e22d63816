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
    eval_chunk_steps: int = 25

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
    eval_chunk_steps: int = 25

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
    eval_chunk_steps: int = 25
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


class VisionGMMNet(nn.Module):
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    n_gaussians: int = 8
    min_std: float = 1e-4

    @nn.compact
    def __call__(self, bp, ih, low):
        feat = _VisionCore()(bp, ih, low)
        h = mish(ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                             self.hidden_dim)(feat))
        K, D = self.n_gaussians, self.action_dim
        means = nn.Dense(K * D)(h).reshape(h.shape[:-1] + (K, D))
        stds = jax.nn.softplus(nn.Dense(K * D)(h)).reshape(
            h.shape[:-1] + (K, D)) + self.min_std
        logits = nn.Dense(K)(h)
        return means, stds, logits


@dataclass
class VisionGMMAgent:
    """bc_gmm vision variant (reference gmm head on encoder features)."""
    model: VisionGMMNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    window_size: int = 1
    eval_chunk_steps: int = 25
    low_noise_eval: bool = True

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4,
               n_gaussians=8, **_):
        del obs_dim
        model = VisionGMMNet(action_dim=action_dim, hidden_dim=hidden_dim,
                             num_hidden_layers=num_hidden_layers,
                             n_gaussians=n_gaussians)
        params = model.init(key, *_dummy_batch(low_dim, res))
        return VisionGMMAgent(model=model, params=params, scaler=scaler,
                              render_fn=render_fn)

    def loss_fn(self):
        from d3il_tpu.agents.gmm import gmm_log_prob
        model, scaler, render = self.model, self.scaler, self.render_fn

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            a = scaler.scale_output(act_w[:, -1])
            means, stds, logits = model.apply(params, bp, ih,
                                              _scale_low(scaler, low))
            return -jnp.mean(gmm_log_prob(means, stds, logits, a))

        return loss

    def policy_apply(self):
        model, scaler, render = self.model, self.scaler, self.render_fn
        low_noise = self.low_noise_eval

        def apply(params, carry, obs):
            key, = carry
            bp, ih, low = render(obs)
            means, stds, logits = model.apply(params, bp[None], ih[None],
                                              _scale_low(scaler, low)[None])
            key, k1, k2 = jax.random.split(key, 3)
            comp = jax.random.categorical(k1, logits[0])
            std = jnp.where(low_noise, 1e-4, 1.0) * stds[0, comp]
            a = means[0, comp] + std * jax.random.normal(k2, std.shape)
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)


class VisionCVAENet(nn.Module):
    action_dim: int = 2
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    latent_dim: int = 8

    def setup(self):
        self.core = _VisionCore()
        self.enc = ResidualMLP(self.hidden_dim, 2, 2 * self.latent_dim)
        self.dec = ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                               self.action_dim)

    def encode_feat(self, bp, ih, low):
        return self.core(bp, ih, low)

    def posterior(self, feat, a):
        mo = self.enc(jnp.concatenate([feat, a], axis=-1))
        return mo[..., :self.latent_dim], mo[..., self.latent_dim:]

    def decode(self, feat, z):
        return self.dec(jnp.concatenate([feat, z], axis=-1))

    def __call__(self, bp, ih, low, a, key):
        feat = self.encode_feat(bp, ih, low)
        mu, logvar = self.posterior(feat, a)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return self.decode(feat, z), mu, logvar


@dataclass
class VisionCVAEAgent:
    """cvae vision variant (cvae_vision_agent.py: VAE over actions with the
    encoder features as condition; KL-regularized reconstruction)."""
    model: VisionCVAENet
    params: Any
    scaler: Scaler
    render_fn: Callable
    kl_weight: float = 1.0
    window_size: int = 1
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4,
               latent_dim=8, kl_weight=1.0, **_):
        del obs_dim
        model = VisionCVAENet(action_dim=action_dim, hidden_dim=hidden_dim,
                              num_hidden_layers=num_hidden_layers,
                              latent_dim=latent_dim)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, action_dim)), jax.random.PRNGKey(0))
        return VisionCVAEAgent(model=model, params=params, scaler=scaler,
                               render_fn=render_fn, kl_weight=kl_weight)

    def loss_fn(self):
        model, scaler, render, beta = (self.model, self.scaler,
                                       self.render_fn, self.kl_weight)

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            a = scaler.scale_output(act_w[:, -1])
            rec, mu, logvar = model.apply(params, bp, ih,
                                          _scale_low(scaler, low), a, key)
            rec_l = jnp.mean((rec - a) ** 2)
            kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
            return rec_l + beta * kl

        return loss

    def policy_apply(self):
        model, scaler, render = self.model, self.scaler, self.render_fn
        zdim = self.model.latent_dim

        def apply(params, carry, obs):
            key, = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionCVAENet.encode_feat)
            key, k1 = jax.random.split(key)
            z = jax.random.normal(k1, (1, zdim))
            a = model.apply(params, feat, z, method=VisionCVAENet.decode)[0]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)


class VisionBesoNet(nn.Module):
    """Encoder + EDM score head (beso_vision_agent.yaml composition)."""
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

    def score(self, feat, a, sigma):
        e = self.temb(jnp.log(sigma) / 4.0)
        return self.head(jnp.concatenate([feat, a, e], axis=-1))

    def __call__(self, bp, ih, low, a, sigma):
        return self.score(self.encode(bp, ih, low), a, sigma)


@dataclass
class VisionBesoAgent:
    """beso vision variant: EDM denoising on encoder features with the
    k-diffusion samplers of the state BesoAgent."""
    model: VisionBesoNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    n_steps: int = 8
    sampler: str = "euler_ancestral"
    schedule: str = "exponential"
    window_size: int = 1
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4,
               n_steps=8, sampler="euler_ancestral", schedule="exponential",
               **_):
        del obs_dim
        model = VisionBesoNet(action_dim=action_dim, hidden_dim=hidden_dim,
                              num_hidden_layers=num_hidden_layers)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, action_dim)), jnp.ones((1,)))
        return VisionBesoAgent(model=model, params=params, scaler=scaler,
                               render_fn=render_fn, n_steps=n_steps,
                               sampler=sampler, schedule=schedule)

    def loss_fn(self):
        from d3il_tpu.agents import beso as beso_mod
        model, scaler, render = self.model, self.scaler, self.render_fn

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            feat_low = _scale_low(scaler, low)
            a0 = scaler.scale_output(act_w[:, -1])
            k1, k2 = jax.random.split(key)
            sigma = beso_mod.rand_log_logistic(k1, (B,))
            noise = jax.random.normal(k2, a0.shape)
            a_noisy = a0 + sigma[:, None] * noise

            def denoiser(s_feat, a, sig):
                sd = beso_mod.SIGMA_DATA
                sigc = sig[..., None]
                c_skip = sd ** 2 / (sigc ** 2 + sd ** 2)
                c_out = sigc * sd / jnp.sqrt(sigc ** 2 + sd ** 2)
                c_in = 1.0 / jnp.sqrt(sigc ** 2 + sd ** 2)
                F = model.apply(params, bp, ih, s_feat, c_in * a, sig)
                return c_skip * a + c_out * F

            den = denoiser(feat_low, a_noisy, sigma)
            sd = beso_mod.SIGMA_DATA
            w = (sigma ** 2 + sd ** 2) / (sigma * sd) ** 2
            return jnp.mean(w[:, None] * (den - a0) ** 2)

        return loss

    def policy_apply(self):
        from d3il_tpu.agents import beso as beso_mod
        model, scaler, render = self.model, self.scaler, self.render_fn
        sigmas = beso_mod.SIGMA_SCHEDULES[self.schedule](self.n_steps)
        sampler_fn = beso_mod.SAMPLERS[self.sampler]
        sd = beso_mod.SIGMA_DATA

        def apply(params, carry, obs):
            key, = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionBesoNet.encode)

            def denoise(a, sigma):
                sig = jnp.broadcast_to(sigma, (1,))[..., None]
                c_skip = sd ** 2 / (sig ** 2 + sd ** 2)
                c_out = sig * sd / jnp.sqrt(sig ** 2 + sd ** 2)
                c_in = 1.0 / jnp.sqrt(sig ** 2 + sd ** 2)
                F = model.apply(params, feat, c_in * a, sig[..., 0],
                                method=VisionBesoNet.score)
                return c_skip * a + c_out * F

            key, k0, k1 = jax.random.split(key, 3)
            a = jax.random.normal(k0, (1, scaler.y_mean.shape[-1])) \
                * beso_mod.SIGMA_MAX
            a = sampler_fn(denoise, a, sigmas, k1)[0]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)


# ------------------------------------------------------------------ ACT

class VisionACTNet(nn.Module):
    """Shared encoder + the state ACT head (agents/act.py ACTNet) with the
    image features standing in for the state vector
    (reference act_vision_agent.py: MultiImageObsEncoder -> ActVAE)."""
    chunk: int = 8
    action_dim: int = 2
    embed_dim: int = 64
    latent_dim: int = 32

    def setup(self):
        from d3il_tpu.agents.act import ACTNet
        self.core = _VisionCore()
        self.act = ACTNet(embed_dim=self.embed_dim,
                          latent_dim=self.latent_dim,
                          chunk=self.chunk, action_dim=self.action_dim)

    def encode_feat(self, bp, ih, low):
        return self.core(bp, ih, low)

    def decode(self, feat, z):
        return self.act.decode(feat, z)

    def __call__(self, bp, ih, low, chunk, key):
        feat = self.core(bp, ih, low)
        return self.act(feat, chunk, key)


@dataclass
class VisionACTAgent:
    """act vision variant (act_vision_agent.py, 358 LoC in the reference)."""
    model: VisionACTNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    chunk: int = 8
    kl_weight: float = 10.0
    window_size: int = 1
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, chunk=8, embed_dim=64, latent_dim=32,
               kl_weight=10.0, **_):
        del obs_dim
        model = VisionACTNet(chunk=chunk, action_dim=action_dim,
                             embed_dim=embed_dim, latent_dim=latent_dim)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, chunk, action_dim)),
                            jax.random.PRNGKey(0))
        return VisionACTAgent(model=model, params=params, scaler=scaler,
                              render_fn=render_fn, chunk=chunk,
                              kl_weight=kl_weight)

    @property
    def train_window(self):
        return self.chunk

    def loss_fn(self):
        model, scaler, render = self.model, self.scaler, self.render_fn
        klw = self.kl_weight

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(render)(obs_w[:, 0])
            chunk = scaler.scale_output(act_w)
            pred, mu, logvar = model.apply(params, bp, ih,
                                           _scale_low(scaler, low), chunk,
                                           key)
            recon = jnp.mean((pred - chunk) ** 2)
            kl = -0.5 * jnp.mean(
                jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))
            return recon + klw * kl

        return loss

    def policy_apply(self):
        model, scaler, render, C = self.model, self.scaler, self.render_fn, \
            self.chunk

        def apply(params, carry, obs):
            buf, k = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionACTNet.encode_feat)
            z = jnp.zeros((1, model.latent_dim), feat.dtype)
            new_chunk = model.apply(params, feat, z,
                                    method=VisionACTNet.decode)[0]
            need_new = k >= C
            buf = jnp.where(need_new, new_chunk, buf)
            k = jnp.where(need_new, 0, k)
            act = scaler.inverse_scale_output(scaler.clip_action(buf[k]))
            return (buf, k + 1), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim, key
        return (jnp.zeros((self.chunk, self.model.action_dim), jnp.float32),
                jnp.array(self.chunk, jnp.int32))


# ------------------------------------------------------------ DDPM-encdec

class VisionEncDecNet(nn.Module):
    """Shared encoder + the chunked enc-dec denoiser
    (ddpm_encdec_vision_agent.py)."""
    chunk: int = 8
    action_dim: int = 2
    embed_dim: int = 96

    def setup(self):
        from d3il_tpu.agents.ddpm_encdec import EncDecDenoiser
        self.core = _VisionCore()
        self.den = EncDecDenoiser(embed_dim=self.embed_dim, chunk=self.chunk,
                                  action_dim=self.action_dim)

    def encode_feat(self, bp, ih, low):
        return self.core(bp, ih, low)

    def denoise(self, feat, a_chunk, t):
        return self.den(feat, a_chunk, t)

    def __call__(self, bp, ih, low, a_chunk, t):
        return self.den(self.core(bp, ih, low), a_chunk, t)


@dataclass
class VisionDDPMEncDecAgent:
    model: VisionEncDecNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    chunk: int = 8
    n_timesteps: int = 16
    window_size: int = 1
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, chunk=8, embed_dim=96, n_timesteps=16, **_):
        del obs_dim
        model = VisionEncDecNet(chunk=chunk, action_dim=action_dim,
                                embed_dim=embed_dim)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, chunk, action_dim)),
                            jnp.zeros((1,)))
        return VisionDDPMEncDecAgent(model=model, params=params,
                                     scaler=scaler, render_fn=render_fn,
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
        model, scaler, render = self.model, self.scaler, self.render_fn
        T = self.n_timesteps
        _, _, abar, _ = self._schedule()

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            bp, ih, low = jax.vmap(render)(obs_w[:, 0])
            a0 = scaler.scale_output(act_w)
            k1, k2 = jax.random.split(key)
            t = jax.random.randint(k1, (B,), 0, T)
            eps = jax.random.normal(k2, a0.shape)
            ab = abar[t][:, None, None]
            a_t = jnp.sqrt(ab) * a0 + jnp.sqrt(1 - ab) * eps
            eps_hat = model.apply(params, bp, ih, _scale_low(scaler, low),
                                  a_t, t)
            return jnp.mean((eps_hat - eps) ** 2)

        return loss

    def policy_apply(self):
        model, scaler, render, C = self.model, self.scaler, self.render_fn, \
            self.chunk
        T = self.n_timesteps
        betas, alphas, abar, abar_prev = self._schedule()
        lo = self.scaler.y_bounds[0] * 1.1
        hi = self.scaler.y_bounds[1] * 1.1

        def apply(params, carry, obs):
            buf, k, key = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionEncDecNet.encode_feat)
            key, k0 = jax.random.split(key)
            a = jax.random.normal(k0, (1, C, model.action_dim))

            def body(carry, t):
                a, key = carry
                key, kn = jax.random.split(key)
                eps_hat = model.apply(params, feat, a, jnp.full((1,), t),
                                      method=VisionEncDecNet.denoise)
                x0 = (a - jnp.sqrt(1 - abar[t]) * eps_hat) / jnp.sqrt(abar[t])
                x0 = jnp.clip(x0, lo, hi)
                mean = (jnp.sqrt(abar_prev[t]) * betas[t] / (1 - abar[t]) * x0
                        + jnp.sqrt(alphas[t]) * (1 - abar_prev[t])
                        / (1 - abar[t]) * a)
                var = betas[t] * (1 - abar_prev[t]) / (1 - abar[t])
                a = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) \
                    * jax.random.normal(kn, a.shape)
                return (a, key), None

            (a, key), _ = jax.lax.scan(body, (a, key),
                                       jnp.arange(T - 1, -1, -1))
            new_chunk = a[0]
            need_new = k >= C
            buf = jnp.where(need_new, new_chunk, buf)
            k = jnp.where(need_new, 0, k)
            act = scaler.inverse_scale_output(scaler.clip_action(buf[k]))
            return (buf, k + 1, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (jnp.zeros((self.chunk, self.model.action_dim), jnp.float32),
                jnp.array(self.chunk, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))


# ------------------------------------------------------------------ IBC

class VisionIBCNet(nn.Module):
    """Shared encoder + EBM head E(feat, a) (ibc_vision_agent.py)."""
    hidden_dim: int = 256
    num_hidden_layers: int = 4

    def setup(self):
        from d3il_tpu.agents.ibc import EBM
        self.core = _VisionCore()
        self.ebm = EBM(hidden_dim=self.hidden_dim,
                       num_hidden_layers=self.num_hidden_layers)

    def encode_feat(self, bp, ih, low):
        return self.core(bp, ih, low)

    def energy(self, feat, a):
        return self.ebm(feat, a)

    def __call__(self, bp, ih, low, a):
        return self.ebm(self.core(bp, ih, low), a)


class _EnergyShim:
    """Adapter so ibc.dfo_sample / langevin_sample (which call
    `model.apply(params, s, a)`) optimize over the ENCODED features."""

    def __init__(self, model):
        self._model = model

    def apply(self, params, feat, a):
        return self._model.apply(params, feat, a,
                                 method=VisionIBCNet.energy)


@dataclass
class VisionIBCAgent:
    model: VisionIBCNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    n_negatives: int = 8
    n_infer_samples: int = 64
    sampler: str = "dfo"
    window_size: int = 1
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, hidden_dim=256, num_hidden_layers=4,
               sampler="dfo", **_):
        del obs_dim
        model = VisionIBCNet(hidden_dim=hidden_dim,
                             num_hidden_layers=num_hidden_layers)
        params = model.init(key, *_dummy_batch(low_dim, res),
                            jnp.zeros((1, action_dim)))
        return VisionIBCAgent(model=model, params=params, scaler=scaler,
                              render_fn=render_fn, sampler=sampler)

    def _bounds(self):
        return (self.scaler.y_bounds[0] * 1.1, self.scaler.y_bounds[1] * 1.1)

    def loss_fn(self):
        model, scaler, render = self.model, self.scaler, self.render_fn
        K = self.n_negatives
        bounds = self._bounds()

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            bp, ih, low = jax.vmap(render)(obs_w[:, -1])
            feat = model.apply(params, bp, ih, _scale_low(scaler, low),
                               method=VisionIBCNet.encode_feat)
            a_pos = scaler.scale_output(act_w[:, -1])
            lo, hi = bounds
            a_neg = jax.random.uniform(key, (B, K, a_pos.shape[-1])) \
                * (hi - lo) + lo
            a_all = jnp.concatenate([a_pos[:, None], a_neg], axis=1)
            f_rep = jnp.broadcast_to(feat[:, None],
                                     (B, K + 1, feat.shape[-1]))
            e = model.apply(params, f_rep, a_all, method=VisionIBCNet.energy)
            return -jnp.mean(jax.nn.log_softmax(-e, axis=1)[:, 0])

        return loss

    def policy_apply(self):
        from d3il_tpu.agents.ibc import dfo_sample, langevin_sample
        model, scaler, render = self.model, self.scaler, self.render_fn
        N, sampler, bounds = self.n_infer_samples, self.sampler, self._bounds()
        shim = _EnergyShim(model)

        def apply(params, carry, obs):
            (key,) = carry
            bp, ih, low = render(obs)
            feat = model.apply(params, bp[None], ih[None],
                               _scale_low(scaler, low)[None],
                               method=VisionIBCNet.encode_feat)[0]
            key, k1 = jax.random.split(key)
            fn = langevin_sample if sampler == "langevin" else dfo_sample
            a = fn(shim, params, feat, k1, N, scaler.y_mean.shape[-1],
                   bounds)
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (key,), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim
        return (key if key is not None else jax.random.PRNGKey(0),)


# ---------------------------------------------------------------- GPT-BC

class VisionGPTBCNet(nn.Module):
    """Shared per-frame encoder + causal GPT over the feature window
    (gpt_bc_vision_agent.py: per-step MultiImageObsEncoder features feed the
    GPT policy)."""
    action_dim: int = 2
    n_embd: int = 120
    n_head: int = 4
    n_layer: int = 4
    window: int = 5

    def setup(self):
        from d3il_tpu.agents.nets.transformer import GPT
        self.core = _VisionCore()
        self.gpt = GPT(n_embd=self.n_embd, n_head=self.n_head,
                       n_layer=self.n_layer, block_size=self.window,
                       output_dim=self.action_dim)

    def encode_frame(self, bp, ih, low):
        return self.core(bp, ih, low)

    def head(self, feats):
        return self.gpt(feats)

    def __call__(self, bp_w, ih_w, low_w):
        """bp_w/ih_w [B, W, H, W, 3], low_w [B, W, L] -> [B, W, Da]."""
        B, W = bp_w.shape[:2]
        flat = lambda x: x.reshape((B * W,) + x.shape[2:])
        feats = self.core(flat(bp_w), flat(ih_w), flat(low_w))
        return self.gpt(feats.reshape(B, W, -1))


@dataclass
class VisionGPTBCAgent:
    model: VisionGPTBCNet
    params: Any
    scaler: Scaler
    render_fn: Callable
    feat_dim: int
    window_size: int = 5
    eval_chunk_steps: int = 25

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, render_fn, low_dim=4,
               res: int = 96, n_embd=120, n_head=4, n_layer=4,
               window_size=5, **_):
        del obs_dim
        model = VisionGPTBCNet(action_dim=action_dim, n_embd=n_embd,
                               n_head=n_head, n_layer=n_layer,
                               window=window_size)
        img = jnp.zeros((1, window_size, res, res, 3))
        params = model.init(key, img, img,
                            jnp.zeros((1, window_size, low_dim)))
        feat = model.apply(params, *_dummy_batch(low_dim, res),
                           method=VisionGPTBCNet.encode_frame)
        return VisionGPTBCAgent(model=model, params=params, scaler=scaler,
                                render_fn=render_fn,
                                feat_dim=int(feat.shape[-1]),
                                window_size=window_size)

    def loss_fn(self):
        model, scaler, render = self.model, self.scaler, self.render_fn

        def loss(params, obs_w, act_w, key):
            bp, ih, low = jax.vmap(jax.vmap(render))(obs_w)  # [B,W,...]
            y = scaler.scale_output(act_w)
            pred = model.apply(params, bp, ih, _scale_low(scaler, low))
            return jnp.mean((pred - y) ** 2)

        return loss

    def policy_apply(self):
        """Carry the ENCODED feature window: one encoder pass per env step
        (re-encoding all W frames per step would cost W passes)."""
        model, scaler, render, W = self.model, self.scaler, self.render_fn, \
            self.window_size

        def apply(params, carry, obs):
            feats, filled = carry
            bp, ih, low = render(obs)
            f = model.apply(params, bp[None], ih[None],
                            _scale_low(scaler, low)[None],
                            method=VisionGPTBCNet.encode_frame)[0]
            shifted = jnp.concatenate([feats[1:], f[None]], axis=0)
            feats = jnp.where(filled == 0,
                              jnp.broadcast_to(f[None], shifted.shape),
                              shifted)
            filled = jnp.minimum(filled + 1, W)
            pred = model.apply(params, feats[None],
                               method=VisionGPTBCNet.head)[0, -1]
            act = scaler.inverse_scale_output(scaler.clip_action(pred))
            return (feats, filled), act

        return apply

    def init_carry(self, obs_dim, key=None):
        del obs_dim, key
        return (jnp.zeros((self.window_size, self.feat_dim), jnp.float32),
                jnp.array(0, jnp.int32))
