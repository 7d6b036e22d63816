"""Inserting env: mode encoding, context spaces, env step smoke."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.envs import inserting


def test_mode_lut_matches_reference_dict():
    # gate_insertion.py:215: {'rgb':1,'rbg':2,'grb':3,'gbr':4,'brg':5,'bgr':6}
    expected = {(0, 1): 1, (0, 2): 2, (1, 0): 3, (1, 2): 4, (2, 0): 5,
                (2, 1): 6}
    for (f, s), m in expected.items():
        order = jnp.array([f, s, 3 - f - s], jnp.int32)
        got = int(inserting.decode_mode(order, jnp.array(3)))
        assert got == m, (f, s)
    # incomplete -> 0
    assert int(inserting.decode_mode(jnp.array([0, 1, -1]), jnp.array(2))) == 0


def test_update_mode_first_visit_order():
    params = object.__new__(inserting.InsertingParams)
    params.targets = jnp.asarray(inserting.TARGETS, jnp.float32)

    class FakeScene:
        pass

    def state_with(pos):
        sc = FakeScene()
        sc.free_pos = jnp.asarray(pos, jnp.float32)
        return inserting.InsertingState(
            scene=sc, ctrl=None, t=jnp.array(0), terminated=jnp.array(False),
            visited=jnp.zeros(3, bool), order=jnp.full(3, -1, jnp.int32),
            n_visited=jnp.array(0), success=jnp.array(False))

    far = np.array([[0.5, -0.3, 0.006]] * 3)
    # box 2 (blue) on its target first
    pos = far.copy()
    pos[2] = inserting.TARGETS[2]
    st = inserting._update_mode(params, state_with(pos))
    assert int(st.order[0]) == 2 and int(st.n_visited) == 1
    # then box 0 arrives; box 2 stays
    pos[0] = inserting.TARGETS[0]
    st2 = inserting._update_mode(params, st._replace(
        scene=state_with(pos).scene))
    assert list(np.asarray(st2.order[:2])) == [2, 0]
    # all three -> mode 'brg' = 5
    pos[1] = inserting.TARGETS[1]
    st3 = inserting._update_mode(params, st2._replace(
        scene=state_with(pos).scene))
    assert int(st3.n_visited) == 3
    assert int(inserting.decode_mode(st3.order, st3.n_visited)) == 5


def test_sample_context_in_spaces():
    xy, quat = jax.vmap(inserting.sample_context)(
        jax.random.split(jax.random.PRNGKey(0), 16))
    xy = np.asarray(xy)
    lo = inserting.CONTEXT_SPACES[:, :2]
    hi = inserting.CONTEXT_SPACES[:, 2:]
    assert (xy >= lo[None]).all() and (xy <= hi[None]).all()
    assert np.allclose(np.linalg.norm(np.asarray(quat), axis=-1), 1.0,
                       atol=1e-5)


@pytest.mark.parametrize("kinematic", [True, False])
def test_env_step_smoke(kinematic):
    params = inserting.InsertingParams(max_steps=3, kinematic=kinematic,
                                       solver_iters=10)
    state = jax.jit(inserting.reset, static_argnums=0)(
        params, inserting.sample_context(jax.random.PRNGKey(0)))
    obs = inserting.get_observation(params, state)
    assert obs.shape == (11,)
    action = jnp.concatenate([
        jnp.asarray(params.init_ee_pos, jnp.float32),
        jnp.asarray(params.init_ee_quat, jnp.float32)])
    step = jax.jit(inserting.step, static_argnums=0)
    state, res = step(params, state, action)
    state, res = step(params, state, action)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(state.scene.q)).all()
    # boxes settled on the table plane, not exploded
    z = np.asarray(state.scene.free_pos[:, 2])
    assert (np.abs(z - 0.006) < 0.02).all(), z
