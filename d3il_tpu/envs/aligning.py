"""Aligning task: push/rotate an open tray onto a target pose, 2 modes.

Functional port of the reference `Robot_Push_Env`
(envs/gym_aligning_env/gym_aligning/envs/aligning.py:129-420): an open-top
tray (robot_push_box.xml: 1 kg base plate 0.05x0.05x0.01 with friction 0.3 /
priority 1 plus four 1 g walls up to z~0.0935) must match a sampled target
pose within pos 0.018 m and rot 0.048*pi (aligning.py:198-199, 334-351).
Action: absolute Cartesian xyz setpoint (3-dof deltas composed by the
harness, simulation/aligning_sim.py:105-116). Mode: push from inside (rod
within 0.051 m of the tray center in xy) vs outside (aligning.py:295-317).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.control import cartesian
from d3il_tpu.engine import model as emodel
from d3il_tpu.engine import step as estep
from d3il_tpu.envs import common, scenes
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import panda

INIT_EE_POS = np.array([0.525, -0.35, 0.25])  # aligning_objects.py:13

POS_MIN_DIST = 0.018   # aligning.py:198
ROT_MIN_DIST = 0.048   # aligning.py:199 (fraction of pi)
ROBOT_BOX_DIST = 0.051  # aligning.py:201

# context spaces (aligning.py:62-67)
BOX_SPACE = np.array([[0.4, -0.25], [0.6, -0.1]])
TARGET_SPACE = np.array([[0.4, 0.2], [0.6, 0.35]])


def _tray_body():
    """Compound free body matching robot_push_box.xml."""
    wall = dict(gtype=emodel.BOX, mass_unused=0.001)
    geoms = [
        dict(gtype=emodel.BOX, size=(0.05, 0.05, 0.01), pos=(0, 0, 0),
             friction=(0.3, 0.001, 0.0001), priority=1),
        dict(gtype=emodel.BOX, size=(0.005, 0.05, 0.045), pos=(0.05, 0, 0.0485)),
        dict(gtype=emodel.BOX, size=(0.05, 0.005, 0.045), pos=(0, 0.05, 0.0485)),
        dict(gtype=emodel.BOX, size=(0.005, 0.05, 0.045), pos=(-0.05, 0, 0.0485)),
        dict(gtype=emodel.BOX, size=(0.05, 0.005, 0.045), pos=(0, -0.05, 0.0485)),
    ]
    # inertia ~ the 1 kg base plate (walls are 1 g each)
    inertia = emodel.box_inertia(1.0, (0.05, 0.05, 0.01))
    return dict(name="aligning_box", mass=1.004, geoms=geoms, inertia=inertia)


def build_aligning_scene(solver_iters: int = 30):
    robot = panda.build_sim_chain("rod")
    return emodel.build_scene(robot, scenes.rod_robot_geoms(robot),
                              [_tray_body()], [scenes.table_geom()],
                              collide_robot_static=True,
                              solver_iters=solver_iters)


class AligningParams(common.RodTaskParams):
    def __init__(self, n_substeps: int = 35, max_steps: int = 400,
                 solver_iters: int = 30, kinematic: bool = False):
        super().__init__(build_aligning_scene(solver_iters), n_substeps,
                         max_steps, init_ee_pos=INIT_EE_POS,
                         kinematic=kinematic)


class AligningState(NamedTuple):
    scene: estep.SceneState
    ctrl: cartesian.CartImpedanceState
    t: jax.Array
    terminated: jax.Array
    target_pos: jax.Array   # [3]
    target_quat: jax.Array  # [4]
    mode: jax.Array
    success: jax.Array


def sample_context(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lo_b, hi_b = (jnp.asarray(x, jnp.float32) for x in BOX_SPACE)
    lo_t, hi_t = (jnp.asarray(x, jnp.float32) for x in TARGET_SPACE)
    box_xy = jax.random.uniform(k1, (2,)) * (hi_b - lo_b) + lo_b
    tgt_xy = jax.random.uniform(k2, (2,)) * (hi_t - lo_t) + lo_t
    deg = jax.random.uniform(k3, (2,), minval=-90.0, maxval=90.0)
    qb = quat_ops.from_euler(jnp.array([0.0, 0, 1]) * deg[0] * jnp.pi / 180)
    qt = quat_ops.from_euler(jnp.array([0.0, 0, 1]) * deg[1] * jnp.pi / 180)
    return box_xy, qb, tgt_xy, qt


def rotation_distance(p, q):
    """Angle between two quaternions (aligning.py:22-36)."""
    d = jnp.abs(jnp.sum(p * q, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


def reset(params: AligningParams, context) -> AligningState:
    box_xy, box_quat, tgt_xy, tgt_quat = context
    dtype = jnp.float32
    free_pos = jnp.concatenate([box_xy.astype(dtype), jnp.zeros(1, dtype)])[None]
    sc = common.init_scene_state(params, dtype, free_pos,
                                 box_quat.astype(dtype)[None])
    sc = common.settle(params, sc, n=5)
    cs = cartesian.init_state(sc.q[:7])
    return AligningState(
        scene=sc, ctrl=cs, t=jnp.array(0, jnp.int32),
        terminated=jnp.array(False),
        target_pos=jnp.concatenate([tgt_xy.astype(dtype), jnp.zeros(1, dtype)]),
        target_quat=tgt_quat.astype(dtype),
        mode=jnp.array(-1, jnp.int32), success=jnp.array(False))


def get_observation(params: AligningParams, state: AligningState) -> jax.Array:
    """[tcp_pos(3), box pos(3), box quat(4), target pos(3), target quat(4)]
    (aligning.py:205-235)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    return jnp.concatenate([
        tcp_pos, state.scene.free_pos[0], state.scene.free_quat[0],
        state.target_pos, state.target_quat])


def _dists(state):
    pos_d = jnp.linalg.norm(state.scene.free_pos[0] - state.target_pos)
    rot_d = rotation_distance(state.scene.free_quat[0], state.target_quat) / jnp.pi
    return pos_d, rot_d


def _success_now(state):
    pos_d, rot_d = _dists(state)
    return (pos_d <= POS_MIN_DIST) & (rot_d <= ROT_MIN_DIST)


def step(params: AligningParams, state: AligningState, action: jax.Array):
    obs = get_observation(params, state)
    early = _success_now(state)
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early

    des_pos = action[:3]
    des_quat = quat_ops.normalize(action[3:7])
    sc, cs = common.run_substeps(params, state.scene, state.ctrl, des_pos, des_quat)
    state = state._replace(scene=sc, ctrl=cs, t=state.t + 1,
                           terminated=terminated)
    succ = _success_now(state)
    # mode per step: rod inside (0) vs outside (1) the tray (aligning.py:306-315)
    tcp_pos, _ = params.tcp_pose(state.scene)
    d = jnp.linalg.norm(state.scene.free_pos[0, :2] - tcp_pos[:2])
    mode = jnp.where(d < ROBOT_BOX_DIST, 0, 1).astype(jnp.int32)
    pos_d, rot_d = _dists(state)
    state = state._replace(success=succ, terminated=state.terminated | succ,
                           mode=mode)
    info = {"mode": mode, "success": succ,
            "mean_distance": 0.5 * (pos_d + rot_d)}
    return state, common.StepResult(obs=obs, reward=jnp.zeros(()), done=done,
                                    info=info)
