"""Pallas contact kernel == per-env jnp reference (engine/contact.py).

Runs the batched kernel in interpret mode on CPU against jax.vmap of the
single-env implementation, on states taken from real rollouts (so the
contact set is representative: resting boxes, rod pushes, nf=0 scenes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.engine import contact, contact_kernel
from d3il_tpu.engine import step as estep
from d3il_tpu.robot import chain as chain_mod


def _phase_inputs(params, states):
    """Assemble the contact-phase inputs for a batch of env scene states."""
    scene = params.scene
    robot = scene.robot

    def one(sc):
        fk_cache = chain_mod.fk(robot, sc.q)
        contacts, _ = estep._contact_rows(scene, sc, fk_cache)
        axes, anchors = chain_mod._dof_frames(robot, *fk_cache)
        dyn = chain_mod.dynamics(robot, sc.q, sc.qd, scene.gravity)
        _, M_arm, bias = dyn
        from d3il_tpu.ops import linalg as linalg_ops
        D = jnp.asarray(robot.joint_damping, sc.q.dtype)
        Minv = linalg_ops.inv_spd(M_arm + scene.dt * jnp.diag(D))
        nf = scene.n_free
        v_free = (jnp.concatenate([sc.free_linvel, sc.free_angvel],
                                  axis=1).reshape(-1) if nf
                  else jnp.zeros(0, sc.q.dtype))
        v_all = jnp.concatenate([sc.qd, v_free])
        g = jnp.asarray(scene.gravity, sc.q.dtype)
        I_f = jnp.asarray(scene.free_inertia, sc.q.dtype)
        gyro = jnp.cross(sc.free_angvel, I_f * sc.free_angvel)
        a_free = (jnp.concatenate([jnp.broadcast_to(g, (nf, 3)), -gyro / I_f],
                                  axis=1).reshape(-1) if nf
                  else jnp.zeros(0, sc.q.dtype))
        a_arm = Minv @ (-bias)
        a_smooth = jnp.concatenate([a_arm, a_free])
        return (contacts.pos, contacts.normal, contacts.depth, axes, anchors,
                Minv, v_all, a_smooth, sc.free_pos, sc.free_quat, sc.warm)

    return jax.vmap(one)(states)


def _rollout_states(env_mod, params, contexts_key, batch, n_steps, action_fn):
    keys = jax.random.split(jax.random.PRNGKey(contexts_key), batch)
    if hasattr(env_mod, "sample_context"):
        states = jax.jit(jax.vmap(
            lambda k: env_mod.reset(params, env_mod.sample_context(k))))(keys)
    else:
        states = jax.jit(jax.vmap(lambda k: env_mod.reset(params)))(keys)
    step = jax.jit(jax.vmap(lambda s, a: env_mod.step(params, s, a)[0]))
    for i in range(n_steps):
        states = step(states, action_fn(states, i))
    return states


@pytest.mark.parametrize("task", ["pushing", "avoiding"])
def test_kernel_matches_reference(task):
    if task == "pushing":
        from d3il_tpu.envs import pushing as env_mod
        params = env_mod.PushingParams(max_steps=50)

        def act(states, i):
            b = states.scene.q.shape[0]
            # drive toward the red box to create rod contacts
            tgt = states.scene.free_pos[:, 0, :2]
            return jnp.concatenate(
                [tgt, jnp.full((b, 1), 0.12),
                 jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (b, 1))], axis=1)
    else:
        from d3il_tpu.envs import avoiding as env_mod
        from d3il_tpu.control import offline_ik
        params = env_mod.AvoidingParams(max_steps=50)

        def act(states, i):
            b = states.scene.q.shape[0]
            # hold at the first obstacle -> rod-obstacle contacts
            xy = jnp.tile(jnp.array([[0.5, -0.1]]), (b, 1))
            return jnp.concatenate(
                [xy, jnp.full((b, 1), 0.12),
                 jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (b, 1))], axis=1)

    batch = 8
    states = _rollout_states(env_mod, params, 0, batch, 6, act)
    if task == "avoiding":
        # beam the rod into the first obstacle (x=0.5, y=-0.1, r=0.03) so the
        # contact set is non-trivial, then step once to settle velocities
        q7 = offline_ik.solve(params.ctrl_chain,
                              jnp.array([0.5, -0.108, 0.12]),
                              jnp.array([0.0, 1, 0, 0]),
                              q0=states.scene.q[0, :7])
        qfull = jnp.concatenate([q7, states.scene.q[0, 7:]])
        sc = states.scene._replace(
            q=jnp.tile(qfull[None], (batch, 1)),
            qd=jnp.zeros_like(states.scene.qd))
        states = states._replace(scene=sc)
    args = _phase_inputs(params, states.scene)
    meta = contact.build_meta(params.scene)

    f_ref, q_ref = jax.vmap(
        lambda *a: contact.phase_single(meta, *a))(*args)
    f_ker, q_ker = contact_kernel.phase_batched(meta, *args, interpret=True)

    f_ref, q_ref = np.asarray(f_ref), np.asarray(q_ref)
    f_ker, q_ker = np.asarray(f_ker), np.asarray(q_ker)
    # some contact force exists in these configurations
    assert np.abs(f_ref).max() > 1e-3
    scale_f = max(np.abs(f_ref).max(), 1.0)
    scale_q = max(np.abs(q_ref).max(), 1.0)
    np.testing.assert_allclose(f_ker / scale_f, f_ref / scale_f, atol=2e-4)
    np.testing.assert_allclose(q_ker / scale_q, q_ref / scale_q, atol=2e-4)


def test_custom_vmap_dispatch_jnp():
    """Under vmap on CPU the phase falls back to the vmapped jnp path and
    matches per-env calls exactly."""
    from d3il_tpu.envs import pushing as env_mod
    params = env_mod.PushingParams(max_steps=50)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    states = jax.jit(jax.vmap(
        lambda k: env_mod.reset(params, env_mod.sample_context(k))))(keys)
    acts = jnp.concatenate(
        [states.scene.free_pos[:, 0, :2], jnp.full((4, 1), 0.12),
         jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (4, 1))], axis=1)
    batched = jax.jit(jax.vmap(
        lambda s, a: env_mod.step(params, s, a)[0]))(states, acts)
    singles = [jax.jit(lambda s, a: env_mod.step(params, s, a)[0])(
        jax.tree_util.tree_map(lambda x: x[i], states), acts[i])
        for i in range(4)]
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(batched.scene.q[i]),
            np.asarray(singles[i].scene.q), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(batched.scene.free_pos[i]),
            np.asarray(singles[i].scene.free_pos), atol=1e-5)


def test_big_scene_has_no_vmem_tile_and_uses_jnp():
    """sorting_6's contact working set exceeds any VMEM-legal (>=128 lane)
    tile, so pick_tile reports 0 and the custom-vmap rule routes the phase
    to the vmapped jnp path (sub-128 tiles still occupy 128 VMEM lanes, so
    shrinking the tile cannot help — measured 30.8 MB scoped VMEM at bt=16)."""
    from d3il_tpu.envs import sorting
    params = sorting.SortingParams(num_boxes=6, max_steps=50)
    meta = contact.build_meta(params.scene)
    assert contact_kernel.pick_tile(meta) == 0
    # and the jnp path matches per-env evaluation on a small batch
    batch = 4
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    states = jax.jit(jax.vmap(
        lambda k: sorting.reset(params, sorting.sample_context(k, 6))))(keys)
    acts = jnp.concatenate(
        [states.scene.free_pos[:, 0, :2], jnp.full((batch, 1), 0.12),
         jnp.tile(jnp.array([[0.0, 1, 0, 0]]), (batch, 1))], axis=1)
    batched = jax.jit(jax.vmap(
        lambda s, a: sorting.step(params, s, a)[0]))(states, acts)
    single = jax.jit(lambda s, a: sorting.step(params, s, a)[0])(
        jax.tree_util.tree_map(lambda x: x[0], states), acts[0])
    np.testing.assert_allclose(np.asarray(batched.scene.free_pos[0]),
                               np.asarray(single.scene.free_pos), atol=1e-5)
