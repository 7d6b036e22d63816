"""Pallas arm-stage / feedforward kernels == the jnp batch-minor pipeline.

Runs the kernels in interpreter mode (CPU CI) against the corresponding
engine/substep_bm.py stages on real rollout states.
"""
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.engine import dyn_kernel, substep_bm
from d3il_tpu.envs import pushing


def _bm_states(params, batch, n_steps=2):
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


def test_arm_stage_matches_jnp_pipeline():
    params = pushing.PushingParams(max_steps=50)
    B = 8
    states = _bm_states(params, B)
    sb = substep_bm.scene_to_bm(states.scene)
    scene = params.scene
    robot = scene.robot
    h = scene.dt
    key = jax.random.PRNGKey(3)
    q_des = sb.q[:7] + 0.01 * jax.random.normal(key, (7, B))
    qd_des = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (7, B))
    tau_model = jax.random.normal(jax.random.PRNGKey(5), (7, B))
    sw = jnp.full((B,), 0.04)
    gf = jnp.zeros((B,))

    # --- reference: the substep_bm stages ---
    fk_ref, M_ref, bias_ref = substep_bm.dynamics_bm(
        robot, sb.q, sb.qd, scene.gravity)
    from d3il_tpu.control.gains import JointPDGains
    gains = JointPDGains()
    pg = jnp.asarray(gains.pgain, jnp.float32)[:, None]
    dg = jnp.asarray(gains.dgain, jnp.float32)[:, None]
    tau_pd = pg * (q_des - sb.q[:7]) + dg * (qd_des - sb.qd[:7])
    fing = substep_bm.finger_forces_bm(sb.q[7:], sb.qd[7:], sw, gf)
    ctrl = jnp.concatenate([tau_pd + tau_model + bias_ref[:7], fing])
    fr = jnp.asarray(scene.forcerange, jnp.float32)
    tau_c = jnp.clip(ctrl, fr[:, :1], fr[:, 1:2])
    f_arm = tau_c - bias_ref
    D = jnp.asarray(robot.joint_damping, jnp.float32)
    Minv_ref = substep_bm.inv_spd_bm(M_ref + h * jnp.diag(D)[..., None])
    a_arm_ref = jnp.einsum("ijn,jn->in", Minv_ref, f_arm)
    rhs = jnp.einsum("ijn,jn->in", M_ref, sb.qd) + h * f_arm
    qd_pre_ref = jnp.einsum("ijn,jn->in", Minv_ref, rhs)
    axes_ref, anch_ref = substep_bm._dof_frames_bm(robot, *fk_ref)

    # --- kernel ---
    xpos, xquat, axes, anch, Minv, qd_pre, a_arm = dyn_kernel.arm_stage_bm(
        scene, gains, sb.q, sb.qd, q_des, qd_des, tau_model, sw, gf,
        interpret=True)

    def check(a, b, name, atol=3e-4):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)

    check(xpos, fk_ref[0], "xpos", 1e-5)
    check(xquat, fk_ref[1], "xquat", 1e-5)
    check(axes, axes_ref, "axes", 1e-5)
    check(anch, anch_ref, "anchors", 1e-5)
    check(Minv, Minv_ref, "Minv")
    check(a_arm, a_arm_ref, "a_arm", 1e-3)
    check(qd_pre, qd_pre_ref, "qd_pre", 1e-3)


def test_physics_substep_kernel_integration():
    """One full physics_substep_bm: kernel path == jnp path (pins the
    integration glue — qd_pre + contact correction — not just the stages)."""
    params = pushing.PushingParams(max_steps=50)
    B = 8
    states = _bm_states(params, B)
    sb = substep_bm.scene_to_bm(states.scene)
    meta = substep_bm._meta_for(params.scene)
    q_des = sb.q[:7]
    qd_des = jnp.zeros((7, B))
    tau_model = jnp.zeros((7, B))
    sw = jnp.full((B,), 0.04)
    gf = jnp.zeros((B,))

    def run(flag):
        substep_bm.set_dyn_kernel(flag)
        try:
            return substep_bm.physics_substep_bm(
                params, meta, sb, q_des, qd_des, tau_model, sw, gf)
        finally:
            substep_bm.set_dyn_kernel(None)

    ref = run(False)
    out = run(True)
    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(out, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-4,
                                   err_msg=name)


def test_ik_window_matches_jnp_scan():
    """ik_window_bm (2-substep window, interpret) == the jnp IK scan +
    folded feedforward of run_substeps_bm."""
    from d3il_tpu.robot import panda
    from d3il_tpu.control.gains import CartPosQuatGains

    chain = panda.build_control_chain()
    gains = CartPosQuatGains()
    dt, n_sub, B = 1e-3, 2, 8
    kq, ko, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    q_virt = jnp.asarray(panda.INIT_QPOS, jnp.float32)[:, None] \
        + 0.2 * jax.random.normal(kq, (7, B))
    old_vel = 0.05 * jax.random.normal(ko, (7, B))
    des_pos = jnp.array([0.5, 0.0, 0.2])[:, None] \
        + 0.05 * jax.random.normal(kp, (3, B))
    des_quat = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0])[:, None], (1, B))

    def ik_body(carry, _):
        qv, ov = carry
        qv, ov, q_des, qd_des, qdd_des = substep_bm.cartesian_step_bm(
            chain, gains, qv, ov, des_pos, des_quat, dt)
        return (qv, ov), (q_des, qd_des, qdd_des)

    (qv_ref, ov_ref), (qd_ref, qdd_ref, qddd_ref) = jax.lax.scan(
        ik_body, (q_virt, old_vel), None, length=n_sub)
    fold = lambda x: jnp.moveaxis(x, 0, 1).reshape(7, n_sub * B)
    tau_ref = jnp.moveaxis(
        substep_bm.model_feedforward_bm(chain, fold(qd_ref), fold(qdd_ref),
                                        fold(qddd_ref))
        .reshape(7, n_sub, B), 1, 0)

    qv, ov, qdes, qddes, tau = dyn_kernel.ik_window_bm(
        chain, gains, n_sub, dt, q_virt, old_vel, des_pos, des_quat,
        interpret=True)

    np.testing.assert_allclose(np.asarray(qv), np.asarray(qv_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(qdes), np.asarray(qd_ref),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(qddes), np.asarray(qdd_ref),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(ov_ref), atol=3e-2)
    scale = max(np.abs(np.asarray(tau_ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(tau) / scale,
                               np.asarray(tau_ref) / scale, atol=2e-3)


def test_feedforward_matches_jnp():
    from d3il_tpu.robot import panda
    ctrl_chain = panda.build_control_chain()
    B = 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.uniform(k1, (7, B), minval=-1.5, maxval=1.5)
    qd = jax.random.normal(k2, (7, B))
    qdd = 3.0 * jax.random.normal(k3, (7, B))
    ref = substep_bm.model_feedforward_bm(ctrl_chain, q, qd, qdd)
    out = dyn_kernel.feedforward_bm(ctrl_chain, q, qd, qdd, interpret=True)
    scale = max(np.abs(np.asarray(ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(ref) / scale, atol=3e-4)
