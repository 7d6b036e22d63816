"""Whole-substep batch-minor pipeline == vmapped per-env reference.

engine/substep_bm.py re-implements FK, DLS-IK, PD feedforward, dynamics and
integration in [..., B] layout; these tests force the two custom-vmap
branches of envs.common.run_substeps against each other on real rollout
states (pushing: rod + 2 boxes, contacts active).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.envs import common, pushing


def _states(params, batch, n_steps=3):
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.jit(jax.vmap(
        lambda k: pushing.reset(params, pushing.sample_context(k))))(keys)
    step = jax.jit(jax.vmap(lambda s, a: pushing.step(params, s, a)[0]))
    for _ in range(n_steps):
        acts = jnp.concatenate(
            [states.scene.free_pos[:, 0, :2], jnp.full((batch, 1), 0.12),
             jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (batch, 1))], axis=1)
        states = step(states, acts)
    return states


@pytest.mark.parametrize("kinematic", [False, True])
def test_run_substeps_bm_matches_vmap(kinematic):
    params = pushing.PushingParams(max_steps=50, kinematic=kinematic)
    batch = 8
    states = _states(params, batch)
    sc, cs = states.scene, states.ctrl
    des_pos = jnp.concatenate(
        [sc.free_pos[:, 0, :2] + 0.02, jnp.full((batch, 1), 0.12)], axis=1)
    des_quat = jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (batch, 1))

    def run(sc, cs, dp, dq):
        return common.run_substeps(params, sc, cs, dp, dq)

    from d3il_tpu.engine import substep_bm
    try:
        common.set_substep_impl("vmap")
        sc_ref, cs_ref = jax.jit(jax.vmap(run))(sc, cs, des_pos, des_quat)
        common.set_substep_impl("bm")
        # jnp bm stages here (the Pallas dynamics kernels are golden-tested
        # per stage + one integrated substep in tests/test_dyn_kernel.py;
        # 35 interpreted kernel windows would dominate CI wall time)
        substep_bm.set_dyn_kernel(False)
        sc_bm, cs_bm = jax.jit(jax.vmap(run))(sc, cs, des_pos, des_quat)
    finally:
        common.set_substep_impl(None)
        substep_bm.set_dyn_kernel(None)

    for name in ("q", "qd", "free_pos", "free_quat", "free_linvel",
                 "free_angvel", "warm"):
        a = np.asarray(getattr(sc_ref, name))
        b = np.asarray(getattr(sc_bm, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-4,
                                   err_msg=f"scene.{name} (kin={kinematic})")
    np.testing.assert_allclose(np.asarray(cs_bm.q_virt),
                               np.asarray(cs_ref.q_virt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cs_bm.old_des_vel),
                               np.asarray(cs_ref.old_des_vel), atol=2e-3)
