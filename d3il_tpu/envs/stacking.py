"""Stacking task: pick-and-place three cubes onto a target, 6 order modes.

Functional port of the reference `CubeStacking_Env`
(envs/gym_stacking_env/gym_stacking/envs/stacking.py:135-470): the gripper
Panda (panda_invisible.xml) under the joint tracking controller; actions are
absolute joint setpoints (7) + gripper width (1) where width > 0.075 opens
the fingers and otherwise grasps (stacking.py:330-353 + Robots.py
open/close_fingers). Success: all three boxes within 0.06 m (xy) of the
target with min pairwise z-separation > 0.03 (stacking.py:425-446); the mode
is the order in which boxes arrive (stacking.py:394-418).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.control import gains, gripper, joint_pd
from d3il_tpu.engine import model as emodel
from d3il_tpu.engine import step as estep
from d3il_tpu.envs import common, scenes
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot import panda

INIT_EE_POS = np.array([0.525, 0.0, 0.3])  # stacking_objects.py:11
POS_MIN_DIST = 0.06                        # stacking.py:208
Z_SEP = 0.03                               # stacking.py:441

# context spaces (stacking.py:52-67)
SPACES = np.array([
    [0.35, -0.25, 0.45, -0.15],   # red
    [0.35, -0.10, 0.45, 0.00],    # green
    [0.55, -0.20, 0.60, 0.00],    # blue
    [0.40, 0.15, 0.60, 0.25],     # target
])
BOX_SIZES = ((0.03, 0.03, 0.03), (0.03, 0.03, 0.03), (0.03, 0.05, 0.03))


def gripper_finger_geoms(chain):
    """Finger collision geoms for grasping.

    The MJCF finger tip pads (panda.xml finger_joint*_tip_collision: 8x4x8 mm
    boxes, friction 2, solref 0.01 0.5, condim 4) plus a box approximation of
    each finger's mesh pad (fingerv.stl, gripper default class: condim 4,
    friction 1, solimp 0.998 0.999 0.001, solref 0.02 1).
    """
    out = []
    for fname, tip, sgn in (("panda_leftfinger", "finger_joint1_tip", 1.0),
                            ("panda_rightfinger", "finger_joint2_tip", -1.0)):
        fb = chain.body_index(fname)
        tb = chain.body_index(tip)
        out.append(emodel.Geom(
            gtype=emodel.BOX, size=(0.008, 0.004, 0.008), body=tb,
            pos=(0.0, -0.005 * sgn, -0.012),
            friction=(2.0, 0.05, 0.0001), solref=(0.01, 0.5),
            name=f"{tip}_collision"))
        out.append(emodel.Geom(
            gtype=emodel.BOX, size=(0.009, 0.008, 0.024), body=fb,
            pos=(0.0, 0.0105 * sgn, 0.028),
            friction=(1.0, 0.005, 0.0001),
            solimp=(0.998, 0.999, 0.001, 0.5, 2.0), solref=(0.02, 1.0),
            name=f"{fname}_pad"))
    return out


def build_stacking_scene(solver_iters: int = 40):
    robot = panda.build_sim_chain("gripper")
    boxes = [dict(name=n, mass=0.05, size=s) for n, s in
             zip(("red_box", "green_box", "blue_box"), BOX_SIZES)]
    return emodel.build_scene(robot, gripper_finger_geoms(robot), boxes,
                              [scenes.table_geom()],
                              collide_robot_static=True,
                              solver_iters=solver_iters)


class StackingParams(common.RodTaskParams):
    def __init__(self, n_substeps: int = 30, max_steps: int = 1000,
                 solver_iters: int = 40, kinematic: bool = False):
        super().__init__(build_stacking_scene(solver_iters), n_substeps,
                         max_steps, init_ee_pos=INIT_EE_POS,
                         kinematic=kinematic)


class StackingState(NamedTuple):
    scene: estep.SceneState
    ctrl_q: jax.Array        # joint setpoint held between steps
    grasp: jax.Array         # int32: consecutive close-command steps
    t: jax.Array
    terminated: jax.Array
    target_xy: jax.Array
    mode: jax.Array          # [3] arrival order, -1/-0-2
    mode_len: jax.Array
    placed: jax.Array        # [3] bool
    success: jax.Array


def sample_context(key):
    ks = jax.random.split(key, 2)
    lo = jnp.asarray(SPACES[:, :2], jnp.float32)
    hi = jnp.asarray(SPACES[:, 2:], jnp.float32)
    xy = jax.random.uniform(ks[0], (4, 2)) * (hi - lo) + lo
    deg = jax.random.uniform(ks[1], (4,), minval=-90.0, maxval=90.0)
    quat = jax.vmap(lambda y: quat_ops.from_euler(
        jnp.array([0.0, 0, 1]) * y * jnp.pi / 180))(deg)
    return xy, quat


def _joint_substep(params, carry, _):
    """Joint-PD tracking substep (stacking uses robot.jointTrackingController,
    stacking.py:156)."""
    sc, q_des, set_width, grasp = carry
    if params.kinematic:
        w = jnp.clip(jnp.full((2,), set_width, sc.q.dtype),
                     sc.q[7:] - 0.1 * params.dt, sc.q[7:] + 0.1 * params.dt)
        # rate-limit the beamed arm (3 rad/s per joint): an unlimited
        # q_new = q_des teleports the hand on large setpoint jumps, so the
        # finite-difference qd below reaches ~100 rad/s and contacting boxes
        # get kicked at unbounded velocity (the round-3 grasp failure mode)
        qa = sc.q[:7] + jnp.clip(q_des - sc.q[:7], -3.0 * params.dt,
                                 3.0 * params.dt)
        q_new = jnp.concatenate([qa, w])
        qd_new = (q_new - sc.q) / params.dt
        sc = params._engine_step(sc, jnp.concatenate([q_new, qd_new]))
        return (sc, q_des, set_width, grasp), None
    # fixed setpoint: the model feedforward M qdd + C(q_des, 0) is zero, so
    # the torque is PD only; one dynamics call is shared between gravity
    # compensation and the engine (preprocessCommand, Robots.py:552-559)
    z7 = jnp.zeros(7, sc.q.dtype)
    dyn = chain_mod.dynamics(params.scene.robot, sc.q, sc.qd,
                             params.scene.gravity)
    tau = joint_pd.pd_accel(params.pd_gains, q_des, z7, sc.q[:7], sc.qd[:7])
    fing = gripper.finger_forces(sc.q[7:], sc.qd[7:], set_width, grasp)
    ctrl = jnp.concatenate([tau + dyn[2][:7], fing])
    sc = params._engine_step(sc, ctrl, dyn)
    return (sc, q_des, set_width, grasp), None


def reset(params: StackingParams, context) -> StackingState:
    xy, quat = context
    dtype = jnp.float32
    free_pos = jnp.concatenate([xy[:3].astype(dtype),
                                jnp.zeros((3, 1), dtype)], axis=1)
    sc = common.init_scene_state(params, dtype, free_pos, quat[:3].astype(dtype))
    # fingers start open (reference env start: open_fingers before episodes)
    sc = sc._replace(q=sc.q.at[7:9].set(0.04))
    (sc, *_), _ = jax.lax.scan(
        functools.partial(_joint_substep, params),
        (sc, sc.q[:7], jnp.asarray(0.04, dtype), jnp.array(False)), None, length=5)
    return StackingState(
        scene=sc, ctrl_q=sc.q[:7], grasp=jnp.array(0, jnp.int32),
        t=jnp.array(0, jnp.int32), terminated=jnp.array(False),
        target_xy=xy[3].astype(dtype),
        mode=jnp.full(3, -1, jnp.int32), mode_len=jnp.array(0, jnp.int32),
        placed=jnp.zeros(3, jnp.bool_), success=jnp.array(False))


def get_observation(params: StackingParams, state: StackingState) -> jax.Array:
    """[per box: pos(3) + tan yaw] (stacking.py:259-276)."""
    parts = []
    for i in range(3):
        parts.append(state.scene.free_pos[i])
        parts.append(common.yaw_tan(state.scene.free_quat[i]))
    return jnp.concatenate(parts)


def robot_state(params, state):
    """(j_pos(7) + gripper_width(1)) prefix used by the rollout harness
    (stacking.py:213-225 + stacking_sim.py:92-100)."""
    width = state.scene.q[7] + state.scene.q[8]
    return jnp.concatenate([state.scene.q[:7], width[None]])


def _success_now(state):
    xy = state.scene.free_pos[:, :2]
    z = state.scene.free_pos[:, 2]
    d = jnp.linalg.norm(xy - state.target_xy[None], axis=-1)
    diff_z = jnp.min(jnp.array([
        jnp.abs(z[0] - z[1]), jnp.abs(z[0] - z[2]), jnp.abs(z[1] - z[2])]))
    return (d <= POS_MIN_DIST).all() & (diff_z > Z_SEP)


def _update_mode(state: StackingState) -> StackingState:
    xy = state.scene.free_pos[:, :2]
    d = jnp.linalg.norm(xy - state.target_xy[None], axis=-1)
    d = jnp.where(state.placed, 1e5, d)
    mi = jnp.argmin(d)
    arrive = (d[mi] <= POS_MIN_DIST) & (state.mode_len < 3)
    mode = jnp.where(arrive, state.mode.at[state.mode_len].set(mi.astype(jnp.int32)),
                     state.mode)
    placed = jnp.where(arrive, state.placed.at[mi].set(True), state.placed)
    return state._replace(mode=mode, placed=placed,
                          mode_len=state.mode_len + arrive.astype(jnp.int32))


def step(params: StackingParams, state: StackingState, action: jax.Array):
    """action: [q_des(7), gripper_width(1)] absolute (harness adds deltas,
    stacking_sim.py:104-105)."""
    obs = get_observation(params, state)
    early = _success_now(state)
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early

    q_des = action[:7]
    open_cmd = action[7] > 0.075   # stacking.py:334-353
    # closing target: the reference commands width 0 and relies on the
    # clamped -20 N grasp force (Robots.py:466-469); a position-prescribed
    # (kinematic) gripper instead needs a geometric target — 2 mm of
    # commanded indent per finger into the 3 cm-half boxes
    close_w = jnp.float32(0.028) if params.kinematic else jnp.float32(0.0)
    set_width = jnp.where(open_cmd, 0.04, close_w)
    # close_fingers semantics (Robots.py:430-435): the first 0.5 s of a close
    # command run the gentle -0.2 m/s velocity servo (grasp_flag False); the
    # -20 N grasp force engages only once the fingers are seated on the box
    close_t = jnp.where(open_cmd, 0, state.grasp + 1)
    grasp_on = close_t > int(round(0.5 / (params.n_substeps * params.dt)))

    (sc, *_), _ = jax.lax.scan(
        functools.partial(_joint_substep, params),
        (state.scene, q_des, set_width, grasp_on), None,
        length=params.n_substeps)
    state = state._replace(scene=sc, ctrl_q=q_des, grasp=close_t,
                           t=state.t + 1, terminated=terminated)
    succ = _success_now(state)
    state = state._replace(success=succ, terminated=state.terminated | succ)
    state = _update_mode(state)
    info = {"mode": state.mode, "mode_len": state.mode_len,
            "success": state.success,
            "success_1": state.mode_len > 0, "success_2": state.mode_len > 1}
    return state, common.StepResult(obs=obs, reward=jnp.zeros(()), done=done,
                                    info=info)
