"""Multi-device sharding tests (8 virtual CPU devices from conftest.py).

Asserts that the dp-sharded execution paths — the sharded rollout fan-out
(parallel/mesh.run_sharded, used by every eval Sim) and the dp-sharded
training loop (agents/base.fit) — actually span all devices AND produce the
same numbers as single-device execution. This is the TPU replacement for the
reference's process-per-core eval workers (simulation/pushing_sim.py:105-138)
and DataParallel training (agents/bc_agent.py:92-97).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def tiny_pushing():
    from d3il_tpu.envs import pushing
    return pushing, pushing.PushingParams(n_substeps=2, solver_iters=5)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_env_step_matches_single_device(tiny_pushing):
    pushing, params = tiny_pushing
    n = len(jax.devices())
    B = 2 * n  # 2 envs per device
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def reset_one(k):
        return pushing.reset(params, pushing.sample_context(k))

    def step_one(s, a):
        return pushing.step(params, s, a)

    action = jnp.tile(jnp.array([0.45, -0.1, 0.12, 0.0, 1.0, 0.0, 0.0],
                                jnp.float32), (B, 1))

    # single device (everything on devices[0])
    states_1 = jax.jit(jax.vmap(reset_one), device=jax.devices()[0])(keys)
    out_1, _ = jax.jit(jax.vmap(step_one), device=jax.devices()[0])(
        states_1, action)

    # dp-sharded over the 8-device mesh
    mesh = pmesh.data_mesh()
    states_8 = pmesh.run_sharded(reset_one, keys, mesh=mesh)
    out_8, _ = pmesh.run_sharded(step_one, states_8, action, mesh=mesh)

    assert len(out_8.scene.q.sharding.device_set) == n
    np.testing.assert_allclose(np.asarray(out_8.scene.q),
                               np.asarray(out_1.scene.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_8.scene.free_pos),
                               np.asarray(out_1.scene.free_pos), atol=1e-5)


def test_sharded_grid_padding(tiny_pushing):
    """Non-divisible batch sizes pad up and slice back."""
    pushing, params = tiny_pushing
    B = 11  # not divisible by 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    def reset_one(k):
        return pushing.reset(params, pushing.sample_context(k))

    states = pmesh.run_sharded(reset_one, keys)
    assert states.scene.q.shape[0] == B


def test_sharded_training_matches_single_device():
    from d3il_tpu.agents import base as agent_base
    from d3il_tpu.agents.bc import BCAgent
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler

    OBS, ACT, N, T = 6, 2, 8, 10
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(N, T, OBS)).astype(np.float32)
    act = rng.normal(size=(N, T, ACT)).astype(np.float32)
    slices = np.stack(np.meshgrid(np.arange(N), np.arange(T - 1),
                                  indexing="ij"), -1).reshape(-1, 2)
    data = ds.TrajectoryData(
        observations=jnp.asarray(obs), actions=jnp.asarray(act),
        masks=jnp.ones((N, T), jnp.float32),
        slices=jnp.asarray(slices, jnp.int32))
    scaler = Scaler.fit(obs.reshape(-1, OBS), act.reshape(-1, ACT))
    cfg = agent_base.TrainConfig(epochs=3, batch_size=16, steps_per_epoch=2,
                                 eval_every_n_epochs=10)

    def train(mesh):
        agent = BCAgent.create(jax.random.PRNGKey(0), OBS, ACT, scaler)
        _, final, hist = agent_base.fit(
            agent.loss_fn(), agent.params, data, None, cfg,
            jax.random.PRNGKey(1), mesh=mesh)
        return final, [h["train_loss"] for h in hist]

    mesh = pmesh.data_mesh()
    final_8, losses_8 = train(mesh)
    # single-device baseline: a 1-device mesh
    mesh_1 = pmesh.data_mesh(jax.devices()[:1])
    final_1, losses_1 = train(mesh_1)

    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(final_8),
                    jax.tree_util.tree_leaves(final_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dryrun_multichip_entry():
    """The driver-facing entry runs the real sharded pipeline."""
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))
