"""BESO agent: continuous-time score matching (EDM) with k-diffusion samplers.

Reference: agents/beso_agent.py:24 (sample_loop 443-513, noise schedules
637+) / models/beso/...: `GCDenoiser` EDM preconditioning
(score_wrappers.py:18), DiffusionGPT backbone (score_gpts.py:118), and the
k-diffusion sampler zoo (gc_sampling.py:168-1018). This port implements the
EDM wrapper + the samplers the benchmark configs use (ddim, euler,
euler_ancestral, heun, dpmpp_2s_ancestral) and the karras / exponential
/ linear sigma schedules (gc_sampling.py:26-96); default 1-3 step sampling.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.agents.nets.mlp import ResidualMLP, mish
from d3il_tpu.agents.ddpm import TimeEmbed
from d3il_tpu.data.scaler import Scaler

SIGMA_DATA = 0.5
SIGMA_MIN, SIGMA_MAX = 0.001, 1.0         # training noise-density range
# inference schedule range (beso_agent.yaml:115-116: sigma_min 0.1, max 1.0;
# sampling below sigma ~0.1 chases denoiser noise and wrecked pushing)
SAMPLE_SIGMA_MIN, SAMPLE_SIGMA_MAX = 0.1, 1.0
# training sigma density: truncated log-logistic, median e^-0.6 ~ 0.55
# (beso_agent.yaml:118-121 + utils.rand_log_logistic) — a log-UNIFORM
# density over [1e-3, 1] puts 2/3 of samples below sigma 0.1 where the
# denoising task is trivial, and the model under-trains exactly in the
# range the samplers use
DENSITY_LOC, DENSITY_SCALE = -0.6, 1.6


def rand_log_logistic(key, shape, loc=DENSITY_LOC, scale=DENSITY_SCALE,
                      min_value=SIGMA_MIN, max_value=SIGMA_MAX):
    """Truncated log-logistic sigma sampler (utils.rand_log_logistic port)."""
    min_cdf = jax.nn.sigmoid((np.log(min_value) - loc) / scale)
    max_cdf = jax.nn.sigmoid((np.log(max_value) - loc) / scale)
    u = jax.random.uniform(key, shape, minval=min_cdf, maxval=max_cdf)
    return jnp.exp(jax.scipy.special.logit(u) * scale + loc)


class ScoreMLP(nn.Module):
    hidden_dim: int = 256
    num_hidden_layers: int = 4
    action_dim: int = 2
    t_dim: int = 16

    @nn.compact
    def __call__(self, s, a, sigma):
        temb = TimeEmbed(self.t_dim)(jnp.log(sigma) / 4.0)
        x = jnp.concatenate([s, a, temb], axis=-1)
        return ResidualMLP(self.hidden_dim, self.num_hidden_layers,
                           self.action_dim)(x)


class ScoreGPT(nn.Module):
    """Causal-transformer score backbone (reference DiffusionGPT,
    score_gpts.py:118): token sequence [sigma, s_1, a_1, ..., s_W, a_W]
    with shared per-timestep position embeddings for the (s_t, a_t) pair
    and action-token outputs decoded to denoised actions
    (score_gpts.py:330-358)."""
    n_embd: int = 120
    n_head: int = 4
    n_layer: int = 4
    window: int = 5
    action_dim: int = 2

    @nn.compact
    def __call__(self, s, a, sigma):
        """s [B,W,Ds], a [B,W,Da] (noised), sigma [B] -> denoised [B,W,Da]."""
        from d3il_tpu.agents.nets.transformer import Block
        B, W, _ = s.shape
        temb = nn.Dense(self.n_embd)((jnp.log(sigma) / 4.0)[:, None])
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, self.window, self.n_embd))
        se = nn.Dense(self.n_embd)(s) + pos[:, :W]
        ae = nn.Dense(self.n_embd)(a) + pos[:, :W]
        sa = jnp.stack([se, ae], axis=2).reshape(B, 2 * W, self.n_embd)
        x = jnp.concatenate([temb[:, None], sa], axis=1)
        for _ in range(self.n_layer):
            x = Block(self.n_embd, self.n_head)(x)
        x = nn.LayerNorm()(x)
        act_tok = x[:, 1:].reshape(B, W, 2, self.n_embd)[:, :, 1]
        h = nn.silu(nn.Dense(100)(act_tok))
        return nn.Dense(self.action_dim)(h)


def edm_denoise(model, params, s, a, sigma):
    """EDM preconditioning (score_wrappers.py:18, Karras et al. 2022).
    Broadcasts over trailing action dims ([B,Da] or [B,W,Da])."""
    sig = sigma.reshape(sigma.shape + (1,) * (a.ndim - sigma.ndim))
    c_skip = SIGMA_DATA ** 2 / (sig ** 2 + SIGMA_DATA ** 2)
    c_out = sig * SIGMA_DATA / jnp.sqrt(sig ** 2 + SIGMA_DATA ** 2)
    c_in = 1.0 / jnp.sqrt(sig ** 2 + SIGMA_DATA ** 2)
    F = model.apply(params, s, c_in * a, sigma)
    return c_skip * a + c_out * F


def karras_sigmas(n: int, rho: float = 7.0, smin=SAMPLE_SIGMA_MIN,
                  smax=SAMPLE_SIGMA_MAX):
    ramp = np.linspace(0, 1, n)
    s = (smax ** (1 / rho) + ramp * (smin ** (1 / rho)
                                     - smax ** (1 / rho))) ** rho
    return jnp.asarray(np.append(s, 0.0), jnp.float32)


def exponential_sigmas(n: int, smin=SAMPLE_SIGMA_MIN, smax=SAMPLE_SIGMA_MAX):
    s = np.exp(np.linspace(np.log(smax), np.log(smin), n))
    return jnp.asarray(np.append(s, 0.0), jnp.float32)


def linear_sigmas(n: int, smin=SAMPLE_SIGMA_MIN, smax=SAMPLE_SIGMA_MAX):
    s = np.linspace(smax, smin, n)
    return jnp.asarray(np.append(s, 0.0), jnp.float32)


SIGMA_SCHEDULES = {"karras": karras_sigmas, "exponential": exponential_sigmas,
                   "linear": linear_sigmas}


def _to_d(a, sigma, denoised):
    return (a - denoised) / jnp.maximum(sigma, 1e-12)


def sample_euler(denoise, a, sigmas, key):
    def body(a, i):
        d = _to_d(a, sigmas[i], denoise(a, sigmas[i]))
        return a + d * (sigmas[i + 1] - sigmas[i]), None
    a, _ = jax.lax.scan(body, a, jnp.arange(len(sigmas) - 1))
    return a


def sample_ddim(denoise, a, sigmas, key):
    def body(a, i):
        den = denoise(a, sigmas[i])
        ratio = sigmas[i + 1] / jnp.maximum(sigmas[i], 1e-12)
        return den + ratio * (a - den), None
    a, _ = jax.lax.scan(body, a, jnp.arange(len(sigmas) - 1))
    return a


def sample_euler_ancestral(denoise, a, sigmas, key):
    def body(carry, i):
        a, key = carry
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        var_up = (sn ** 2 * (s ** 2 - sn ** 2) / jnp.maximum(s ** 2, 1e-12))
        sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sn ** 2 - sigma_up ** 2, 0.0))
        d = _to_d(a, s, den)
        a = a + d * (sigma_down - s)
        key, k = jax.random.split(key)
        a = a + jax.random.normal(k, a.shape) * sigma_up
        return (a, key), None
    (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(len(sigmas) - 1))
    return a


def sample_heun(denoise, a, sigmas, key):
    def body(a, i):
        s, sn = sigmas[i], sigmas[i + 1]
        d = _to_d(a, s, denoise(a, s))
        a_e = a + d * (sn - s)
        d2 = _to_d(a_e, jnp.maximum(sn, 1e-12), denoise(a_e, jnp.maximum(sn, SIGMA_MIN)))
        a_h = a + 0.5 * (d + d2) * (sn - s)
        return jnp.where(sn > 0, a_h, a + d * (sn - s)), None
    a, _ = jax.lax.scan(body, a, jnp.arange(len(sigmas) - 1))
    return a


def sample_dpmpp_2s_ancestral(denoise, a, sigmas, key):
    def body(carry, i):
        a, key = carry
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        var_up = sn ** 2 * (s ** 2 - sn ** 2) / jnp.maximum(s ** 2, 1e-12)
        sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sn ** 2 - sigma_up ** 2, 0.0))
        t, tn = -jnp.log(jnp.maximum(s, 1e-12)), -jnp.log(jnp.maximum(sigma_down, 1e-12))
        r = (tn - t) / 2
        s_mid = jnp.exp(-(t + r))
        a_2 = (s_mid / jnp.maximum(s, 1e-12)) * a \
            - jnp.expm1(-r) * den
        den2 = denoise(a_2, s_mid)
        a_new = (sigma_down / jnp.maximum(s, 1e-12)) * a \
            - jnp.expm1(tn - t) * (-den2)
        # fall back to euler-ancestral form when sigma_down == 0
        d = _to_d(a, s, den)
        a_eul = a + d * (sigma_down - s)
        a_new = jnp.where(sigma_down > 1e-10, a_new, a_eul)
        key, k = jax.random.split(key)
        a_new = a_new + jax.random.normal(k, a.shape) * sigma_up
        return (a_new, key), None
    (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(len(sigmas) - 1))
    return a


def _ancestral_sigmas(s, sn):
    var_up = sn ** 2 * (s ** 2 - sn ** 2) / jnp.maximum(s ** 2, 1e-12)
    sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
    sigma_down = jnp.sqrt(jnp.maximum(sn ** 2 - sigma_up ** 2, 0.0))
    return sigma_up, sigma_down


def sample_dpm_2(denoise, a, sigmas, key):
    """DPM-Solver-2: midpoint in log-sigma space (gc_sampling.py sample_dpm_2);
    falls back to euler on the final (sigma_next = 0) step."""
    def body(a, i):
        s, sn = sigmas[i], sigmas[i + 1]
        d = _to_d(a, s, denoise(a, s))
        s_mid = jnp.exp(0.5 * (jnp.log(jnp.maximum(s, 1e-12))
                               + jnp.log(jnp.maximum(sn, 1e-12))))
        a_2 = a + d * (s_mid - s)
        d2 = _to_d(a_2, s_mid, denoise(a_2, s_mid))
        a_mid = a + d2 * (sn - s)
        a_eul = a + d * (sn - s)
        return jnp.where(sn > 1e-10, a_mid, a_eul), None
    a, _ = jax.lax.scan(body, a, jnp.arange(len(sigmas) - 1))
    return a


def sample_dpm_2_ancestral(denoise, a, sigmas, key):
    """Ancestral DPM-Solver-2 (gc_sampling.py sample_dpm_2_ancestral)."""
    def body(carry, i):
        a, key = carry
        s, sn = sigmas[i], sigmas[i + 1]
        sigma_up, sigma_down = _ancestral_sigmas(s, sn)
        d = _to_d(a, s, denoise(a, s))
        s_mid = jnp.exp(0.5 * (jnp.log(jnp.maximum(s, 1e-12))
                               + jnp.log(jnp.maximum(sigma_down, 1e-12))))
        a_2 = a + d * (s_mid - s)
        d2 = _to_d(a_2, s_mid, denoise(a_2, s_mid))
        a_new = a + d2 * (sigma_down - s)
        a_eul = a + d * (sigma_down - s)
        a_new = jnp.where(sigma_down > 1e-10, a_new, a_eul)
        key, k = jax.random.split(key)
        a_new = a_new + jax.random.normal(k, a.shape) * sigma_up
        return (a_new, key), None
    (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(len(sigmas) - 1))
    return a


def sample_dpmpp_2s(denoise, a, sigmas, key):
    """DPM-Solver++(2S), deterministic (gc_sampling.py sample_dpmpp_2s)."""
    def body(a, i):
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        t = -jnp.log(jnp.maximum(s, 1e-12))
        tn = -jnp.log(jnp.maximum(sn, 1e-12))
        h = tn - t
        s_mid = jnp.exp(-(t + 0.5 * h))
        a_2 = (s_mid / jnp.maximum(s, 1e-12)) * a - jnp.expm1(-0.5 * h) * den
        den2 = denoise(a_2, s_mid)
        a_new = (sn / jnp.maximum(s, 1e-12)) * a - jnp.expm1(-h) * den2
        a_eul = a + _to_d(a, s, den) * (sn - s)
        return jnp.where(sn > 1e-10, a_new, a_eul), None
    a, _ = jax.lax.scan(body, a, jnp.arange(len(sigmas) - 1))
    return a


def sample_dpmpp_2m(denoise, a, sigmas, key):
    """DPM-Solver++(2M): linear multistep over the previous denoised estimate
    (gc_sampling.py sample_dpmpp_2m); first step degenerates to DDIM."""
    def body(carry, i):
        a, old_den, h_last = carry
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        t = -jnp.log(jnp.maximum(s, 1e-12))
        tn = -jnp.log(jnp.maximum(sn, 1e-12))
        h = tn - t
        r = h_last / jnp.maximum(h, 1e-12)
        den_p = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_den
        use_ms = (h_last > 0) & (sn > 1e-10)
        den_use = jnp.where(use_ms, den_p, den)
        a_new = (sn / jnp.maximum(s, 1e-12)) * a - jnp.expm1(-h) * den_use
        a_ddim = den + (sn / jnp.maximum(s, 1e-12)) * (a - den)
        a_new = jnp.where(sn > 1e-10, a_new, a_ddim)
        return (a_new, den, h), None
    (a, _, _), _ = jax.lax.scan(
        body, (a, jnp.zeros_like(a), jnp.float32(0.0)),
        jnp.arange(len(sigmas) - 1))
    return a


def _lms_coeffs(sigmas_np, order: int):
    """Adams-Bashforth-style coefficients over the (static) sigma grid
    (gc_sampling.py linear_multistep_coeff, fine-grid quadrature)."""
    n = len(sigmas_np) - 1
    out = []
    for i in range(n):
        cur = min(i + 1, order)
        xs = np.linspace(sigmas_np[i], sigmas_np[i + 1], 513)
        cs = []
        for j in range(cur):
            prod = np.ones_like(xs)
            for k in range(cur):
                if k == j:
                    continue
                prod = prod * (xs - sigmas_np[i - k]) / (
                    sigmas_np[i - j] - sigmas_np[i - k])
            cs.append(np.trapezoid(prod, xs))
        out.append(cs)
    return out


def sample_lms(denoise, a, sigmas, key, order: int = 4):
    """Linear multistep sampler (gc_sampling.py:433-469). The sigma grid is
    static, so the integrated Lagrange coefficients are precomputed on host
    and the step loop unrolls under jit."""
    coeffs = _lms_coeffs(np.asarray(sigmas), order)
    ds = []
    for i in range(len(sigmas) - 1):
        d = _to_d(a, sigmas[i], denoise(a, sigmas[i]))
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        a = a + sum(c * dd for c, dd in zip(coeffs[i], reversed(ds)))
    return a


def sample_dpmpp_sde(denoise, a, sigmas, key, eta: float = 1.0,
                     r: float = 0.5):
    """DPM-Solver++ (stochastic) (gc_sampling.py:740-797). Plain Gaussian
    increments replace the reference's BrownianTree noise sampler (the tree
    only matters for cross-seed reproducibility of the SDE path)."""
    def body(carry, i):
        a, key = carry
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        # euler fallback on the final step
        a_eul = a + _to_d(a, s, den) * (sn - s)
        t = -jnp.log(jnp.maximum(s, 1e-12))
        tn = -jnp.log(jnp.maximum(sn, 1e-12))
        h = tn - t
        sm = t + h * r
        fac = 1.0 / (2.0 * r)
        sig_s = jnp.exp(-sm)
        su1, sd1 = _ancestral_sigmas_eta(s, sig_s, eta)
        s_ = -jnp.log(jnp.maximum(sd1, 1e-12))
        key, k1, k2 = jax.random.split(key, 3)
        a_2 = (jnp.exp(-s_) / jnp.maximum(s, 1e-12)) * a \
            - jnp.expm1(t - s_) * den
        a_2 = a_2 + jax.random.normal(k1, a.shape) * su1
        den2 = denoise(a_2, sig_s)
        su2, sd2 = _ancestral_sigmas_eta(s, sn, eta)
        tn_ = -jnp.log(jnp.maximum(sd2, 1e-12))
        den_d = (1 - fac) * den + fac * den2
        a_new = (jnp.exp(-tn_) / jnp.maximum(s, 1e-12)) * a \
            - jnp.expm1(t - tn_) * den_d
        a_new = a_new + jax.random.normal(k2, a.shape) * su2
        a = jnp.where(sn > 1e-10, a_new, a_eul)
        return (a, key), None
    (a, _), _ = jax.lax.scan(body, (a, key), jnp.arange(len(sigmas) - 1))
    return a


def _ancestral_sigmas_eta(s, sn, eta):
    var_up = sn ** 2 * (s ** 2 - sn ** 2) / jnp.maximum(s ** 2, 1e-12)
    sigma_up = jnp.minimum(jnp.sqrt(jnp.maximum(var_up, 0.0)) * eta, sn)
    sigma_down = jnp.sqrt(jnp.maximum(sn ** 2 - sigma_up ** 2, 0.0))
    return sigma_up, sigma_down


def sample_dpmpp_2m_sde(denoise, a, sigmas, key, eta: float = 1.0):
    """DPM-Solver++(2M) SDE, heun correction (gc_sampling.py:800-853);
    Gaussian increments in place of the BrownianTree sampler."""
    def body(carry, i):
        a, old_den, h_last, key = carry
        s, sn = sigmas[i], sigmas[i + 1]
        den = denoise(a, s)
        t = -jnp.log(jnp.maximum(s, 1e-12))
        tn = -jnp.log(jnp.maximum(sn, 1e-12))
        h = tn - t
        eta_h = eta * h
        a_new = (sn / jnp.maximum(s, 1e-12)) * jnp.exp(-eta_h) * a \
            - jnp.expm1(-h - eta_h) * den
        use_ms = (h_last > 0) & (sn > 1e-10)
        rr = h_last / jnp.maximum(h, 1e-12)
        # (-h-eta_h).expm1().neg()/(-h-eta_h) + 1 (gc_sampling.py:840); the
        # negation matters: the coefficient -> 0 (not 2) in the small-step
        # limit, so the multistep correction vanishes as h -> 0.
        heun = (-jnp.expm1(-h - eta_h) / (-h - eta_h) + 1.0) \
            * (1.0 / jnp.maximum(rr, 1e-12)) * (den - old_den)
        a_new = a_new + jnp.where(use_ms, heun, 0.0)
        key, kn = jax.random.split(key)
        a_new = a_new + jax.random.normal(kn, a.shape) * sn \
            * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0))
        a = jnp.where(sn > 1e-10, a_new, den)
        return (a, den, h, key), None
    (a, _, _, _), _ = jax.lax.scan(
        body, (a, jnp.zeros_like(a), jnp.float32(0.0), key),
        jnp.arange(len(sigmas) - 1))
    return a


def _dpm_eps(denoise, a, t):
    """eps at t = -log sigma (gc_sampling.py DPMSolver.eps)."""
    sigma = jnp.exp(-t)
    return (a - denoise(a, sigma)) / jnp.maximum(sigma, 1e-12)


def _dpm_1_step(denoise, a, t, tn, eps=None):
    h = tn - t
    eps = _dpm_eps(denoise, a, t) if eps is None else eps
    return a - jnp.exp(-tn) * jnp.expm1(h) * eps, eps


def _dpm_2_step(denoise, a, t, tn, r1=0.5, eps=None):
    h = tn - t
    eps = _dpm_eps(denoise, a, t) if eps is None else eps
    s1 = t + r1 * h
    u1 = a - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps_r1 = _dpm_eps(denoise, u1, s1)
    a2 = a - jnp.exp(-tn) * jnp.expm1(h) * eps \
        - jnp.exp(-tn) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps)
    return a2, eps


def _dpm_3_step(denoise, a, t, tn, r1=1 / 3, r2=2 / 3, eps=None):
    h = tn - t
    eps = _dpm_eps(denoise, a, t) if eps is None else eps
    s1, s2 = t + r1 * h, t + r2 * h
    u1 = a - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
    eps_r1 = _dpm_eps(denoise, u1, s1)
    u2 = a - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps \
        - jnp.exp(-s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1.0) \
        * (eps_r1 - eps)
    eps_r2 = _dpm_eps(denoise, u2, s2)
    a3 = a - jnp.exp(-tn) * jnp.expm1(h) * eps \
        - jnp.exp(-tn) / r2 * (jnp.expm1(h) / h - 1.0) * (eps_r2 - eps)
    return a3, eps


def sample_dpm_fast(denoise, a, sigmas, key):
    """DPM-Solver-fast (gc_sampling.py:582-618,676): a fixed mix of
    3rd/2nd/1st-order exponential-integrator steps in t = -log sigma,
    deterministic (the reference's default eta=0). The sigma grid is static,
    so the order schedule resolves on host and the loop unrolls under jit."""
    del key
    sigs = np.asarray(sigmas, np.float64)
    t_start = -np.log(sigs[0])
    t_end = -np.log(sigs[-2])            # last nonzero sigma
    nfe = len(sigs) - 1
    m = nfe // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    orders = [3] * (m - 2) + [2, 1] if nfe % 3 == 0 \
        else [3] * (m - 1) + [nfe % 3]
    steps = {1: _dpm_1_step, 2: _dpm_2_step, 3: _dpm_3_step}
    for i, order in enumerate(orders):
        a, _ = steps[order](denoise, a, jnp.float32(ts[i]),
                            jnp.float32(ts[i + 1]))
    # the reference integrates only to sigma_min; our sampler interface
    # carries the trailing sigma=0, whose exact solution is the denoised
    # estimate (the DDIM ratio -> 0 step every other sampler ends with)
    return denoise(a, sigmas[-2])


def sample_dpm_adaptive(denoise, a, sigmas, key, order: int = 3,
                        rtol: float = 0.05, atol: float = 0.0078,
                        h_init: float = 0.05, accept_safety: float = 0.81,
                        max_steps: int = 64):
    """DPM-Solver-12/23 adaptive (gc_sampling.py:621-674,856): embedded
    lower/higher-order step pair with a step-size controller on the global
    error norm. lax.while_loop replaces the Python while (the step count is
    data-dependent); the controller is the reference's PID with the default
    pcoeff=0, icoeff=1 (pure I-control: h *= error^(-1/order) soft-clipped),
    plus a max_steps fuse jit requires. Deterministic (eta=0)."""
    del key
    sigs = np.asarray(sigmas, np.float64)
    t_start = float(-np.log(sigs[0]))
    t_end = float(-np.log(sigs[-2]))
    eps_coeff = 1.0 / (2 if order == 2 else 3)

    def cond(carry):
        a, a_prev, s, h, i = carry
        return (s < t_end - 1e-5) & (i < max_steps)

    def body(carry):
        a, a_prev, s, h, i = carry
        t = jnp.minimum(jnp.float32(t_end), s + h)
        if order == 2:
            a_low, eps = _dpm_1_step(denoise, a, s, t)
            a_high, _ = _dpm_2_step(denoise, a, s, t, eps=eps)
        else:
            a_low, eps = _dpm_2_step(denoise, a, s, t, r1=1 / 3)
            a_high, _ = _dpm_3_step(denoise, a, s, t, eps=eps)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(a_low),
                                                     jnp.abs(a_prev)))
        err = jnp.linalg.norm((a_low - a_high) / delta) / np.sqrt(a.size)
        accept = err < 1.0 / accept_safety
        # I-controller: propose h' = h * err^(-1/order), soft-limited
        fac = jnp.minimum(jnp.maximum(
            jnp.power(jnp.maximum(err, 1e-8), -eps_coeff), 0.25), 4.0)
        h_new = jnp.minimum(h * fac * accept_safety, jnp.float32(10.0))
        a2 = jnp.where(accept, a_high, a)
        a_prev2 = jnp.where(accept, a_low, a_prev)
        s2 = jnp.where(accept, t, s)
        return (a2, a_prev2, s2, h_new, i + 1)

    carry = (a, a, jnp.float32(t_start), jnp.float32(h_init),
             jnp.int32(0))
    a, _, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return denoise(a, sigmas[-2])   # trailing sigma=0 step (see dpm_fast)


SAMPLERS = {"euler": sample_euler, "ddim": sample_ddim,
            "euler_ancestral": sample_euler_ancestral, "heun": sample_heun,
            "dpmpp_2s_ancestral": sample_dpmpp_2s_ancestral,
            "dpm_2": sample_dpm_2, "dpm_2_ancestral": sample_dpm_2_ancestral,
            "dpmpp_2s": sample_dpmpp_2s, "dpmpp_2m": sample_dpmpp_2m,
            "lms": sample_lms, "dpmpp_sde": sample_dpmpp_sde,
            "dpmpp_2m_sde": sample_dpmpp_2m_sde,
            "dpm_fast": sample_dpm_fast,
            "dpm_adaptive": sample_dpm_adaptive}


@dataclass
class BesoAgent:
    model: Any
    params: Any
    scaler: Scaler
    n_steps: int = 8
    sampler: str = "euler_ancestral"
    schedule: str = "exponential"
    window_size: int = 1
    backbone: str = "mlp"

    @staticmethod
    def create(key, obs_dim, action_dim, scaler, hidden_dim=256,
               num_hidden_layers=4, n_steps=8, sampler="euler_ancestral",
               schedule="exponential", window_size=1, backbone="mlp",
               n_embd=120, n_head=4, n_layer=4, **_):
        # defaults follow configs/agents/beso_agent.yaml:107-116
        # (num_sampling_steps 8, euler_ancestral); backbone="gpt" switches to
        # the reference's DiffusionGPT transformer (score_gpts.py:118)
        if backbone == "gpt":
            model = ScoreGPT(n_embd=n_embd, n_head=n_head, n_layer=n_layer,
                             window=window_size, action_dim=action_dim)
            params = model.init(key, jnp.zeros((1, window_size, obs_dim)),
                                jnp.zeros((1, window_size, action_dim)),
                                jnp.ones((1,)))
        else:
            model = ScoreMLP(hidden_dim=hidden_dim,
                             num_hidden_layers=num_hidden_layers,
                             action_dim=action_dim)
            params = model.init(key, jnp.zeros((1, obs_dim * window_size)),
                                jnp.zeros((1, action_dim)), jnp.ones((1,)))
        return BesoAgent(model=model, params=params, scaler=scaler,
                         n_steps=n_steps, sampler=sampler, schedule=schedule,
                         window_size=window_size, backbone=backbone)

    def loss_fn(self):
        """EDM weighted denoising loss with log-normal sigma density
        (beso_agent.py:597+ sigma distribution, rand_log_logistic-ish).
        The GPT backbone denoises the whole action window (one action token
        per obs token, score_gpts.py:330-358); the MLP denoises the last
        action of the window."""
        model, scaler = self.model, self.scaler
        gpt = self.backbone == "gpt"

        def loss(params, obs_w, act_w, key):
            B = obs_w.shape[0]
            sw = scaler.scale_input(obs_w)
            s = sw if gpt else sw.reshape(B, -1)
            a0 = scaler.scale_output(act_w) if gpt \
                else scaler.scale_output(act_w[:, -1])
            k1, k2 = jax.random.split(key)
            sigma = rand_log_logistic(k1, (B,))
            noise = jax.random.normal(k2, a0.shape)
            sig_b = sigma.reshape((B,) + (1,) * (a0.ndim - 1))
            a_noisy = a0 + sig_b * noise
            den = edm_denoise(model, params, s, a_noisy, sigma)
            w = (sigma ** 2 + SIGMA_DATA ** 2) / (sigma * SIGMA_DATA) ** 2
            return jnp.mean(w.reshape(sig_b.shape) * (den - a0) ** 2)

        return loss

    def policy_apply(self):
        model, scaler, W = self.model, self.scaler, self.window_size
        sigmas = SIGMA_SCHEDULES[self.schedule](self.n_steps)
        sampler_fn = SAMPLERS[self.sampler]
        gpt = self.backbone == "gpt"

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
            sw = scaler.scale_input(window)
            s = sw[None] if gpt else sw.reshape(1, -1)

            def denoise(a, sigma):
                return edm_denoise(model, params, s, a,
                                   jnp.broadcast_to(sigma, (1,)))

            key, k0, k1 = jax.random.split(key, 3)
            adim = scaler.y_mean.shape[-1]
            shape = (1, W, adim) if gpt else (1, adim)
            a = jax.random.normal(k0, shape) * SIGMA_MAX
            a = sampler_fn(denoise, a, sigmas, k1)
            a = a[0, -1] if gpt else a[0]
            act = scaler.inverse_scale_output(scaler.clip_action(a))
            return (window, filled, key), act

        return apply

    def init_carry(self, obs_dim, key=None):
        return (jnp.zeros((self.window_size, obs_dim), jnp.float32),
                jnp.array(0, jnp.int32),
                key if key is not None else jax.random.PRNGKey(0))
