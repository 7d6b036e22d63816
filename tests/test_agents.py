"""Agent zoo smoke tests: every agent trains (loss decreases, finite) and
produces in-bounds actions through its policy_apply interface on a synthetic
bimodal dataset — the shape/semantics contract for the full benchmark runs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.agents import base as agent_base
from d3il_tpu.data import dataset as ds
from d3il_tpu.data.scaler import Scaler

OBS_DIM, ACT_DIM = 4, 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, T = 12, 40
    obs = rng.normal(size=(n, T, OBS_DIM)).astype(np.float32)
    # bimodal actions conditioned on obs sign
    mode = np.sign(obs[..., :1])
    act = (0.01 * mode + 0.002 * rng.normal(size=(n, T, ACT_DIM))).astype(np.float32)
    eps = [(obs[i], act[i]) for i in range(n)]
    d = ds.build(eps, max_len=T, window_size=8)
    x, y = ds.all_valid(d)
    return d, Scaler.fit(x, y)


def _fit(agent, data, window, epochs=3, ema=None):
    d, scaler = data
    d = ds.rewindow(d, window)
    cfg = agent_base.TrainConfig(epochs=epochs, batch_size=64,
                                 window_size=window, eval_every_n_epochs=100,
                                 ema_decay=ema, steps_per_epoch=8)
    best, final, hist = agent_base.fit(agent.loss_fn(), agent.params, d, None,
                                       cfg, jax.random.PRNGKey(0))
    losses = [h["train_loss"] for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # not diverging
    return final


def _policy_roundtrip(agent, params):
    apply = agent.policy_apply()
    carry = agent.init_carry(OBS_DIM, jax.random.PRNGKey(1))
    obs = jnp.ones(OBS_DIM) * 0.3
    for _ in range(3):
        carry, act = jax.jit(apply)(params, carry, obs)
    act = np.asarray(act)
    assert act.shape == (ACT_DIM,)
    assert np.isfinite(act).all()
    lo = np.asarray(agent.scaler.inverse_scale_output(agent.scaler.y_bounds[0] * 1.1))
    hi = np.asarray(agent.scaler.inverse_scale_output(agent.scaler.y_bounds[1] * 1.1))
    assert (act >= lo - 1e-5).all() and (act <= hi + 1e-5).all()


def test_bc(data):
    from d3il_tpu.agents.bc import BCAgent
    ag = BCAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                        hidden_dim=32, num_hidden_layers=2)
    ag.params = _fit(ag, data, 1)
    _policy_roundtrip(ag, ag.params)


def test_cvae(data):
    from d3il_tpu.agents.cvae import CVAEAgent
    ag = CVAEAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                          hidden_dim=32, num_hidden_layers=2, latent_dim=8)
    ag.params = _fit(ag, data, 1)
    _policy_roundtrip(ag, ag.params)


def test_gmm(data):
    from d3il_tpu.agents.gmm import GMMAgent
    ag = GMMAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                         hidden_dim=32, num_hidden_layers=2, n_gaussians=4)
    ag.params = _fit(ag, data, 1)
    _policy_roundtrip(ag, ag.params)


def test_ddpm(data):
    from d3il_tpu.agents.ddpm import DDPMAgent
    ag = DDPMAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                          hidden_dim=32, num_hidden_layers=2, n_timesteps=4)
    ag.params = _fit(ag, data, 1, ema=0.995)
    _policy_roundtrip(ag, ag.params)


def test_gpt_bc(data):
    from d3il_tpu.agents.gpt_bc import GPTBCAgent
    ag = GPTBCAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                           n_embd=32, n_layer=2, window_size=5)
    ag.params = _fit(ag, data, 5)
    _policy_roundtrip(ag, ag.params)


def test_bet_mlp(data):
    from d3il_tpu.agents.bet import BeTAgent
    d, scaler = data
    x, y = ds.all_valid(d)
    acts = np.asarray(scaler.scale_output(jnp.asarray(y)))
    ag = BeTAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, scaler, acts,
                         hidden_dim=32, num_hidden_layers=2, n_bins=8)
    ag.params = _fit(ag, data, 1)
    _policy_roundtrip(ag, ag.params)


def test_bet_gpt(data):
    from d3il_tpu.agents.bet import BeTAgent
    d, scaler = data
    x, y = ds.all_valid(d)
    acts = np.asarray(scaler.scale_output(jnp.asarray(y)))
    ag = BeTAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, scaler, acts,
                         n_bins=8, use_gpt=True, window_size=5, n_embd=32,
                         n_layer=2)
    ag.params = _fit(ag, data, 5)
    _policy_roundtrip(ag, ag.params)


def test_ibc(data):
    from d3il_tpu.agents.ibc import IBCAgent
    ag = IBCAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                         hidden_dim=32, num_hidden_layers=2)
    ag.n_infer_samples = 16
    ag.params = _fit(ag, data, 1)
    _policy_roundtrip(ag, ag.params)


def test_act(data):
    from d3il_tpu.agents.act import ACTAgent
    ag = ACTAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                         chunk=4, embed_dim=32, latent_dim=8)
    ag.params = _fit(ag, data, 4)
    _policy_roundtrip(ag, ag.params)


def test_beso(data):
    from d3il_tpu.agents.beso import BesoAgent
    for sampler in ("ddim", "euler_ancestral", "dpmpp_2s_ancestral"):
        ag = BesoAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM, data[1],
                              hidden_dim=32, num_hidden_layers=2, n_steps=3,
                              sampler=sampler)
        ag.params = _fit(ag, data, 1)
        _policy_roundtrip(ag, ag.params)


def test_ddpm_encdec(data):
    from d3il_tpu.agents.ddpm_encdec import DDPMEncDecAgent
    ag = DDPMEncDecAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM,
                                data[1], chunk=4, embed_dim=32, n_timesteps=4)
    ag.params = _fit(ag, data, 4, ema=0.995)
    _policy_roundtrip(ag, ag.params)


def test_beso_samplers_converge_with_oracle_denoiser():
    """Every k-diffusion sampler, driven by a perfect denoiser (always
    returns the true x0), must land exactly on x0 at sigma=0 — the
    self-consistency property all gc_sampling.py integrators share."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3il_tpu.agents import beso

    x0 = jnp.array([0.3, -0.7])
    denoise = lambda a, sigma: x0
    sigmas = beso.karras_sigmas(8)  # includes the trailing 0
    a_init = jnp.array([5.0, 5.0])
    for name, fn in beso.SAMPLERS.items():
        out = jax.jit(lambda a: fn(denoise, a, sigmas, jax.random.PRNGKey(0)))(a_init)
        assert np.allclose(np.asarray(out), np.asarray(x0), atol=1e-4), \
            f"{name}: {out} != {x0}"


def test_dpmpp_2m_sde_tracks_linear_ode():
    """dpmpp_2m_sde (eta=0, deterministic) must track the analytic solution
    of a linear-denoiser probability-flow ODE. Pins the sign of the heun
    multistep coefficient (-expm1(-h)/(-h)+1 -> 0 as h -> 0; with the
    dropped negation of gc_sampling.py:840 the coefficient tends to 2 and
    the 12-step output lands at the wrong sign entirely)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3il_tpu.agents import beso

    # D(a, sigma) = alpha*a  =>  a(sigma) = a0 * (sigma/sigma0)^(1-alpha)
    alpha = 0.5
    den = lambda a, s: alpha * a
    sigmas = beso.karras_sigmas(12)
    a0 = jnp.array([2.0, -1.0])
    out = beso.sample_dpmpp_2m_sde(den, a0, sigmas, jax.random.PRNGKey(0),
                                   eta=0.0)
    s0, s_last = float(sigmas[0]), float(sigmas[-2])
    # the final step returns denoise(a(s_last)) = alpha * a(s_last)
    analytic = np.asarray(a0) * (s_last / s0) ** (1 - alpha) * alpha
    assert np.allclose(np.asarray(out), analytic, rtol=5e-3), (out, analytic)


def test_dpm_fast_adaptive_track_linear_ode():
    """dpm_fast / dpm_adaptive (gc_sampling.py:582-674) must track the
    analytic solution of a linear-denoiser probability-flow ODE."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3il_tpu.agents import beso

    alpha = 0.5
    den = lambda a, s: alpha * a
    sigmas = beso.karras_sigmas(12)
    a0 = jnp.array([2.0, -1.0])
    s0, s_last = float(sigmas[0]), float(sigmas[-2])
    analytic = np.asarray(a0) * (s_last / s0) ** (1 - alpha) * alpha
    # dpm_fast at 12 NFE carries ~2% discretization error (5 coarse
    # segments over the log-sigma range); dpm_adaptive lands at ~1e-4
    for name, rtol in (("dpm_fast", 3e-2), ("dpm_adaptive", 1e-3)):
        out = beso.SAMPLERS[name](den, a0, sigmas, jax.random.PRNGKey(0))
        assert np.allclose(np.asarray(out), analytic, rtol=rtol), \
            (name, out, analytic)


def test_lstm_gmm(data):
    from d3il_tpu.agents.lstm_gmm import LSTMGMMAgent
    ag = LSTMGMMAgent.create(jax.random.PRNGKey(0), OBS_DIM, ACT_DIM,
                             data[1], hidden_dim=32, num_layers=2,
                             n_gaussians=4, window_size=4)
    ag.params = _fit(ag, data, 4)
    _policy_roundtrip(ag, ag.params)


def test_beso_gpt_backbone():
    """BESO with the transformer score backbone (reference DiffusionGPT,
    score_gpts.py:118): denoises the whole action window, finite loss, and
    the policy emits finite actions through every registered sampler."""
    from d3il_tpu.agents.beso import BesoAgent, SAMPLERS
    from d3il_tpu.data.scaler import Scaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 10)).astype(np.float32)
    y = rng.normal(scale=0.01, size=(64, 2)).astype(np.float32)
    scaler = Scaler.fit(jnp.asarray(x), jnp.asarray(y))
    key = jax.random.PRNGKey(0)
    W = 4
    ag = BesoAgent.create(key, 10, 2, scaler, backbone="gpt", window_size=W,
                          n_embd=32, n_layer=2, n_steps=2)
    ow = jnp.asarray(np.tile(x[:8, None], (1, W, 1)))
    aw = jnp.asarray(np.tile(y[:8, None], (1, W, 1)))
    l = jax.jit(ag.loss_fn())(ag.params, ow, aw, key)
    assert np.isfinite(float(l))
    carry = ag.init_carry(10, key)
    _, a = jax.jit(ag.policy_apply())(ag.params, carry, jnp.asarray(x[0]))
    assert np.isfinite(np.asarray(a)).all()
