"""Shared machinery for the vectorized task environments.

An env here is a pair of pure functions over explicit state:

    reset(params, context)          -> state
    step(params, state, action)     -> (state, StepResult)

with every per-step loop expressed as `lax.scan` so `jax.vmap(step)` runs
thousands of envs in lockstep on one chip (replacing the reference's
one-process-per-env evaluation, simulation/pushing_sim.py:105-138).

The substep reproduces the reference control pipeline per 1 ms physics tick
(Scene.next_step -> MjRobot.prepare_step -> mj_step; Scene.py:121-138):
cartesian DLS-IK -> joint PD + URDF-model feedforward -> finger force law ->
gravity compensation from the sim-model bias -> actuator clamp -> physics.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.control import cartesian, gains, gripper, joint_pd, offline_ik
from d3il_tpu.engine import step as estep
from d3il_tpu.engine.model import SceneModel
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot import panda
from d3il_tpu.envs import scenes


class StepResult(NamedTuple):
    obs: jax.Array      # observation (reference semantics: pre-substep state)
    reward: jax.Array
    done: jax.Array
    info: dict


class RodTaskParams:
    """Static task parameters shared by the rod end-effector tasks."""

    def __init__(self, scene: SceneModel, n_substeps: int,
                 max_steps: int, init_ee_pos=None, init_ee_quat=None,
                 kinematic: bool = False):
        self.scene = scene
        self.kinematic = kinematic
        self.ctrl_chain = panda.build_control_chain()
        self.cart_gains = gains.CartPosQuatGains()
        self.pd_gains = gains.JointPDGains()
        self.n_substeps = n_substeps
        self.max_steps = max_steps
        self.dt = scene.dt
        self.tcp_body = scene.robot.body_index("tcp")
        init_ee_pos = scenes.INIT_EE_POS if init_ee_pos is None else init_ee_pos
        init_ee_quat = scenes.INIT_EE_QUAT if init_ee_quat is None else init_ee_quat
        # Episode start configuration: offline IK from the default qpos
        # (reference env start(): gotoCartPosQuatController trajectory[-1] then
        # beam, e.g. pushing.py:283-333), then null-space convergence of the
        # impedance controller's virtual posture. The reference never resets
        # the controller's old_q across episodes (IKControllers.py:152-161 is
        # only called at env.start), so after its first episode the virtual
        # posture has converged to the null-optimal configuration for the
        # start pose; starting every episode there avoids the violent
        # saturated-null-space transient the first reference episode exhibits.
        q_star = offline_ik.solve(
            self.ctrl_chain, init_ee_pos, init_ee_quat, q0=panda.INIT_QPOS)
        self.q_init = np.asarray(
            self._null_converge(q_star, init_ee_pos, init_ee_quat), np.float64)
        self.init_ee_pos = np.asarray(init_ee_pos)
        self.init_ee_quat = np.asarray(init_ee_quat)
        self._engine_step = estep.make_step_fn(scene, kinematic_robot=kinematic)

    def _null_converge(self, q0, ee_pos, ee_quat, iters: int = 4000):
        """Iterate the cartesian controller's virtual-posture update (no
        physics) until the null-space drive is stationary."""
        import jax as _jax
        import jax.numpy as _jnp

        des_p = _jnp.asarray(ee_pos, _jnp.float32)
        des_q = _jnp.asarray(ee_quat, _jnp.float32)

        def body(st, _):
            st, *_rest = cartesian.step(self.ctrl_chain, self.cart_gains, st,
                                        des_p, des_q, self.dt)
            return st, None

        st = cartesian.init_state(_jnp.asarray(q0, _jnp.float32))
        st, _ = _jax.lax.scan(body, st, None, length=iters)
        return np.asarray(_jax.device_get(st.q_virt), np.float64)

    def tcp_pose(self, sc: estep.SceneState):
        xpos, xquat = chain_mod.fk(self.scene.robot, sc.q)
        return xpos[self.tcp_body], xquat[self.tcp_body]


def physics_substep(params: RodTaskParams, sc, q_des, qd_des, tau_model,
                    set_width=0.04, grasp_flag=False):
    """One 1 ms physics tick given the controller's joint setpoint and the
    precomputed model feedforward torque (the q_des-only part). One
    chain.dynamics evaluation is shared between gravity compensation
    (preprocessCommand, Robots.py:552-559 — sim-model bias at the pre-step
    state) and the engine's smooth dynamics."""
    if params.kinematic:
        # neglect_dynamics mode (reference IKControllers.py:317-319): the arm
        # is beamed along the IK's virtual trajectory; fingers rate-track the
        # commanded width; free objects still simulate against the rod.
        w = jnp.clip(jnp.full((2,), set_width, sc.q.dtype),
                     sc.q[7:] - 0.2 * params.dt, sc.q[7:] + 0.2 * params.dt)
        q_new = jnp.concatenate([q_des, w])
        qd_new = (q_new - sc.q) / params.dt
        return params._engine_step(sc, jnp.concatenate([q_new, qd_new]))
    dyn = chain_mod.dynamics(params.scene.robot, sc.q, sc.qd,
                             params.scene.gravity)
    tau = joint_pd.pd_accel(params.pd_gains, q_des, qd_des,
                            sc.q[:7], sc.qd[:7]) + tau_model
    fing = gripper.finger_forces(sc.q[7:], sc.qd[7:], set_width, grasp_flag)
    # fingers get the raw command (MjRobot.prepare_step:129-130)
    ctrl = jnp.concatenate([tau + dyn[2][:7], fing])
    return params._engine_step(sc, ctrl, dyn)


def ik_trajectory(params: RodTaskParams, cs, des_pos, des_quat):
    """Run the cartesian DLS-IK controller for a whole substep window.

    The impedance controller's virtual joint trajectory evolves independently
    of the plant (joint_filter_coefficient == 1.0: measured joints only seed
    it, IKControllers.py:168-169), so the n_substeps controller updates are
    hoisted out of the physics loop into their own scan. Returns
    (cs, (q_des, qd_des, qdd_des)) with trajectory arrays [n_substeps, 7]."""
    def body(cs, _):
        cs, q_des, qd_des, qdd_des = cartesian.step(
            params.ctrl_chain, params.cart_gains, cs, des_pos, des_quat,
            params.dt)
        return cs, (q_des, qd_des, qdd_des)

    return jax.lax.scan(body, cs, None, length=params.n_substeps)


def control_substep(params: RodTaskParams, carry, _,
                    set_width=0.04, grasp_flag=False):
    """One 1 ms tick: controller + physics (interleaved form, kept for
    API parity/tests; run_substeps uses the hoisted-IK fast path)."""
    sc, cs, des_pos, des_quat = carry
    cs, q_des, qd_des, qdd_des = cartesian.step(
        params.ctrl_chain, params.cart_gains, cs, des_pos, des_quat, params.dt)
    tau_model = joint_pd.model_feedforward(params.ctrl_chain, q_des, qd_des,
                                           qdd_des)
    sc = physics_substep(params, sc, q_des, qd_des, tau_model,
                         set_width, grasp_flag)
    return (sc, cs, des_pos, des_quat), None


def hold_substep(params: RodTaskParams, carry, _):
    """Joint-PD hold at a fixed setpoint (reset settling: the reference beams
    then runs scene.next_step under the joint tracking controller). With
    qd_des = qdd_des = 0 the model feedforward M qdd + C(q, 0) is identically
    zero, leaving the PD term only."""
    sc, q_hold = carry
    if params.kinematic:
        q_new = jnp.concatenate([q_hold, sc.q[7:]])
        sc = params._engine_step(sc, jnp.concatenate(
            [q_new, jnp.zeros_like(q_new)]))
        return (sc, q_hold), None
    sc = physics_substep(params, sc, q_hold, jnp.zeros(7, sc.q.dtype),
                         jnp.zeros(7, sc.q.dtype))
    return (sc, q_hold), None


def _run_substeps_single(params: RodTaskParams, sc, cs, des_pos, des_quat,
                         set_width, grasp_flag):
    """Per-env substep window: IK trajectory first (its own scan), model
    feedforward batched over the window (one vmapped dynamics call instead
    of n_substeps sequential ones), then the physics scan."""
    cs, (q_des, qd_des, qdd_des) = ik_trajectory(params, cs, des_pos, des_quat)
    if params.kinematic:
        def kin_body(sc, q_d):
            sc = physics_substep(params, sc, q_d, None, None,
                                 set_width, grasp_flag)
            return sc, None
        sc, _ = jax.lax.scan(kin_body, sc, q_des)
        return sc, cs
    tau_model = jax.vmap(
        lambda a, b, c: joint_pd.model_feedforward(params.ctrl_chain, a, b, c)
    )(q_des, qd_des, qdd_des)

    def body(sc, inp):
        q_d, qd_d, tau_m = inp
        sc = physics_substep(params, sc, q_d, qd_d, tau_m,
                             set_width, grasp_flag)
        return sc, None

    sc, _ = jax.lax.scan(body, sc, (q_des, qd_des, tau_model))
    return sc, cs


# --- batched execution: custom_vmap routes jax.vmap(step) through the
# whole-substep batch-minor pipeline (engine/substep_bm, docs/PERF.md
# lever 2) on TPU; everywhere else it vmaps the per-env form above.
# None: auto. "bm"/"vmap": force (tests).
_FORCE_SUBSTEP_IMPL = None
_RS_WRAPPED: dict = {}


def set_substep_impl(impl):
    global _FORCE_SUBSTEP_IMPL
    assert impl in (None, "bm", "vmap")
    _FORCE_SUBSTEP_IMPL = impl


def _wrapped_for(params: RodTaskParams):
    key = id(params)
    if key in _RS_WRAPPED:
        return _RS_WRAPPED[key]
    single = functools.partial(_run_substeps_single, params)
    wrapped = jax.custom_batching.custom_vmap(single)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        from d3il_tpu.engine import substep_bm
        flat, treedef = jax.tree_util.tree_flatten(tuple(args))
        flat_b = jax.tree_util.tree_leaves(in_batched)
        flat = [a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(flat, flat_b)]
        sc, cs, des_pos, des_quat, sw, gf = \
            jax.tree_util.tree_unflatten(treedef, flat)
        impl = _FORCE_SUBSTEP_IMPL
        if impl is None:
            impl = "bm" if (jax.default_backend() == "tpu"
                            and axis_size >= 64
                            and substep_bm.supported(params)) else "vmap"
        if impl == "bm":
            out = substep_bm.run_substeps_bm(params, sc, cs, des_pos,
                                             des_quat, sw, gf)
        else:
            out = jax.vmap(single)(sc, cs, des_pos, des_quat, sw, gf)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    _RS_WRAPPED[key] = wrapped
    return wrapped


def run_substeps(params: RodTaskParams, sc, cs, des_pos, des_quat,
                 set_width=0.04, grasp_flag=False):
    """n_substeps of controller + physics (see _run_substeps_single); under
    jax.vmap the TPU executes the batch-minor pipeline."""
    sw = jnp.asarray(set_width, sc.q.dtype)
    gf = jnp.asarray(grasp_flag)
    return _wrapped_for(params)(sc, cs, des_pos, des_quat, sw, gf)


def init_scene_state(params: RodTaskParams, dtype=jnp.float32,
                     free_pos=None, free_quat=None) -> estep.SceneState:
    q = jnp.concatenate([jnp.asarray(params.q_init, dtype), jnp.zeros(2, dtype)])
    return estep.init_state(params.scene, q=q, free_pos=free_pos,
                            free_quat=free_quat, dtype=dtype)


def settle(params: RodTaskParams, sc, n: int = 2):
    """Run n joint-hold physics steps after a beam/reset (reference:
    beam_to_joint_pos executes one step, then scene.next_step once more)."""
    q_hold = sc.q[:7]
    (sc, _), _ = jax.lax.scan(functools.partial(hold_substep, params),
                              (sc, q_hold), None, length=n)
    return sc


def yaw_tan(q: jax.Array) -> jax.Array:
    """tan(yaw) observation encoding (reference pushing.py:258-266:
    np.tan(quat2euler(quat)[-1:]))."""
    return jnp.tan(quat_ops.to_euler(q)[..., 2:3])
