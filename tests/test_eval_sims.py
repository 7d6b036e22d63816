"""Metric formula tests (vs straightforward numpy ports of the reference
torch code) + smoke tests of the batched per-task Sim harnesses with a tiny
BC agent on short, kinematic episodes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.data.scaler import Scaler
from d3il_tpu.eval import metrics, sims


# ---------------------------------------------------------------- metrics

def _ref_probs(modes, succ, keys, C, T):
    probs = np.zeros((C, len(keys)))
    for c in range(C):
        for i, k in enumerate(keys):
            probs[c, i] = np.sum((modes[c][succ[c] == 1] == k)) / T
    probs = probs / (probs.sum(1, keepdims=True) + 1e-12)
    return probs


def _ref_entropy_kl(probs, prior, n_modes):
    """sorting_sim.py:199-218 / stacking_sim.py:144-176 semantics."""
    probs = probs[probs.sum(1) > 0]
    h = -(probs * np.log(probs + 1e-12) / np.log(n_modes)).sum(1).mean()
    log_ = (probs * np.log(prior + 1e-12) / np.log(n_modes)).sum(1).mean()
    return h, -h - log_


def test_sorting_score_matches_reference_formula():
    rng = np.random.default_rng(0)
    C, T = 6, 5
    keys = np.array([0b01000000, 0b10000000], np.int32)  # 2-box encodings
    prior = np.array([0.7, 0.3], np.float32)
    modes = rng.choice(keys, size=(C, T)).astype(np.int32)
    modes[2, 0] = 5  # an out-of-key mode: counts toward no bin
    succ = rng.integers(0, 2, size=(C, T)).astype(np.float32)
    succ[3] = 0  # a context with no successes: dropped from H/KL

    got = metrics.sorting_score(jnp.asarray(succ), jnp.asarray(modes),
                                keys, prior)
    probs = _ref_probs(modes, succ, keys, C, T)
    h, kl = _ref_entropy_kl(probs, prior, 2)
    assert np.isclose(float(got["entropy"]), h, atol=1e-5)
    assert np.isclose(float(got["kl"]), kl, atol=1e-5)
    assert np.isclose(float(got["score"]), succ.mean() - kl, atol=1e-5)


def test_stacking_prefix_codes():
    # rg=0 rb=1 gr=2 gb=3 br=4 bg=5 (stacking_sim.py:44)
    order = jnp.asarray([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                         [1, 2, 0], [2, 0, 1], [2, 1, 0], [0, -1, -1]])
    c1, c2 = metrics.stacking_prefix_codes(order)
    assert list(np.asarray(c1)) == [0, 0, 1, 1, 2, 2, 0]
    assert list(np.asarray(c2))[:6] == [0, 1, 2, 3, 4, 5]
    assert int(c2[6]) == -1


def test_stacking_score_shapes():
    rng = np.random.default_rng(1)
    C, T = 4, 3
    order = rng.integers(0, 3, size=(C, T, 3)).astype(np.int32)
    mlen = rng.integers(0, 4, size=(C, T)).astype(np.int32)
    s = (mlen > 2).astype(np.float32)
    s1 = (mlen > 0).astype(np.float32)
    s2 = (mlen > 1).astype(np.float32)
    out = metrics.stacking_score(
        jnp.asarray(order), jnp.asarray(mlen), jnp.asarray(s),
        jnp.asarray(s1), jnp.asarray(s2),
        np.full(3, 1 / 3), np.full(6, 1 / 6), np.full(6, 1 / 6))
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert np.isclose(float(out["score"]),
                      s1.mean() + s2.mean() + s.mean(), atol=1e-6)


def test_aligning_score_entropy_includes_zero_rows():
    succ = np.array([[1, 1], [0, 0]], np.float32)
    modes = np.array([[0, 1], [0, 0]], np.int32)
    out = metrics.aligning_score(jnp.asarray(succ), jnp.asarray(modes))
    # context 0: p=(.5,.5) -> H=1; context 1: all-fail -> H=0; mean = 0.5
    assert np.isclose(float(out["entropy"]), 0.5, atol=1e-5)
    assert np.isclose(float(out["score"]), 0.5 * (0.5 + 0.5), atol=1e-5)


def test_sorting_uniform_prior():
    keys, prior = sims.sorting_uniform_prior(2)
    assert list(keys) == [0b01000000, 0b10000000]
    keys4, prior4 = sims.sorting_uniform_prior(4)
    assert len(keys4) == 6 and np.isclose(prior4.sum(), 1.0)


# ---------------------------------------------------------------- sims smoke

def _tiny_agent(obs_dim, act_dim):
    from d3il_tpu.agents.bc import BCAgent
    x = np.random.default_rng(0).normal(size=(32, obs_dim)).astype(np.float32)
    y = 0.005 * np.random.default_rng(1).normal(size=(32, act_dim)).astype(np.float32)
    scaler = Scaler.fit(x, y)
    return BCAgent.create(jax.random.PRNGKey(0), obs_dim, act_dim, scaler,
                          hidden_dim=16, num_hidden_layers=1)


@pytest.mark.parametrize("case", ["pushing", "aligning", "sorting", "stacking",
                                  "inserting"])
def test_sim_smoke(case):
    if case == "inserting":
        sim = sims.InsertingSim(n_contexts=2, n_trajectories_per_context=2)
        params = sims.inserting_params(kinematic=True)
        params.max_steps = 3
        out = sim.test_agent(_tiny_agent(13, 2), params=params)
        assert set(out) >= {"success_rate", "entropy", "score"}
    elif case == "pushing":
        sim = sims.PushingSim(n_contexts=2, n_trajectories_per_context=2)
        params = sims.pushing_params(kinematic=True)
        params.max_steps = 3
        out = sim.test_agent(_tiny_agent(10, 2), params=params)
        assert set(out) >= {"success_rate", "entropy", "score"}
    elif case == "aligning":
        sim = sims.AligningSim(n_contexts=2, n_trajectories_per_context=2)
        params = sims.aligning_params(kinematic=True)
        params.max_steps = 3
        out = sim.test_agent(_tiny_agent(20, 3), params=params)
        assert set(out) >= {"success_rate", "entropy", "score", "mean_distance"}
    elif case == "sorting":
        sim = sims.SortingSim(num_boxes=2, n_contexts=2,
                              n_trajectories_per_context=2)
        params = sims.sorting_params(2, kinematic=True)
        params.max_steps = 3
        out = sim.test_agent(_tiny_agent(10, 2), params=params)
        assert set(out) >= {"success_rate", "entropy", "kl", "score"}
    else:
        sim = sims.StackingSim(n_contexts=2, n_trajectories_per_context=2)
        params = sims.stacking_params(kinematic=True)
        params.max_steps = 3
        out = sim.test_agent(_tiny_agent(20, 8), params=params)
        assert set(out) >= {"success_rate", "success_rate_1", "score"}
    for k, v in out.items():
        assert np.isfinite(v), (case, k)
