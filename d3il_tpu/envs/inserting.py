"""Inserting task: push three boxes through gate channels onto their targets.

Vectorized functional port of the reference `Gate_Insertion_Env`
(envs/gym_inserting_env/gym_inserting/envs/gate_insertion.py:154-520): three
0.05 kg boxes (2.5 cm half-extents) must each be pushed through a maze of 17
static walls (gate_insertion_objects.py:106-283; maze_1/maze_2 are commented
out of the scene, gate_insertion.py:233-255) to within 0.01 m (3-D) of its
fixed target pose. The behavior mode is the order in which the red/green/blue
boxes first reach their targets — 6 permutations
(gate_insertion.py:215: mode_dict {'rgb':1,...,'bgr':6}).
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

TARGET_MIN_DIST = 0.01  # gate_insertion.py:304
N_MODES = 6

# fixed target poses (gate_insertion_objects.py:17-24); z = 0
TARGETS = np.array([
    [0.3575, 0.276, 0.0],
    [0.525, 0.4535, 0.0],
    [0.6925, 0.276, 0.0],
])

# context spaces (gate_insertion.py:54-64): [x_lo, y_lo, x_hi, y_hi] per box
CONTEXT_SPACES = np.array([
    [0.35, -0.2, 0.5, -0.15],
    [0.55, -0.1, 0.7, -0.05],
    [0.35, 0.0, 0.5, 0.05],
])

# static maze walls actually added to the scene (gate_insertion.py:233-255
# adds maze_3..maze_19): (pos, yaw_deg, half_size). The reference's diagonal
# walls use quat [0, 0.5, ±1, 0] (gate_insertion_objects.py:108-127,231-250)
# — a 180° flip about an in-plane axis, equivalent for a symmetric box to an
# in-plane rotation by 2*atan2(∓0.5, 1) ≈ ∓53.13°.
_DIAG = float(np.degrees(2 * np.arctan2(0.5, 1.0)))
MAZE_WALLS = [
    ((0.4, 0.17, 0.0), -_DIAG, (0.03, 0.01, 0.03)),      # maze_3
    ((0.65, 0.17, 0.0), _DIAG, (0.03, 0.01, 0.03)),      # maze_4
    ((0.383, 0.2185, 0.0), 0.0, (0.01, 0.03, 0.03)),     # maze_5
    ((0.667, 0.2185, 0.0), 0.0, (0.01, 0.03, 0.03)),     # maze_6
    ((0.3525, 0.2385, 0.0), 0.0, (0.04, 0.01, 0.03)),    # maze_7
    ((0.6975, 0.2385, 0.0), 0.0, (0.04, 0.01, 0.03)),    # maze_8
    ((0.32, 0.276, 0.0), 0.0, (0.01, 0.0475, 0.03)),     # maze_9
    ((0.73, 0.276, 0.0), 0.0, (0.01, 0.0475, 0.03)),     # maze_10
    ((0.3525, 0.3135, 0.0), 0.0, (0.04, 0.01, 0.03)),    # maze_11
    ((0.6975, 0.3135, 0.0), 0.0, (0.04, 0.01, 0.03)),    # maze_12
    ((0.383, 0.3335, 0.0), 0.0, (0.01, 0.03, 0.03)),     # maze_13
    ((0.667, 0.3335, 0.0), 0.0, (0.01, 0.03, 0.03)),     # maze_14
    ((0.435, 0.3975, 0.0), -_DIAG, (0.01, 0.07, 0.03)),  # maze_15
    ((0.615, 0.3975, 0.0), _DIAG, (0.01, 0.07, 0.03)),   # maze_16
    ((0.4875, 0.4585, 0.0), 0.0, (0.01, 0.04, 0.03)),    # maze_17
    ((0.5625, 0.4585, 0.0), 0.0, (0.01, 0.04, 0.03)),    # maze_18
    ((0.525, 0.491, 0.0), 0.0, (0.0475, 0.01, 0.03)),    # maze_19
]

# permutation of first-visits (box indices 0=r,1=g,2=b) -> reference mode id
# (gate_insertion.py:215); indexed by [first, second]
_MODE_LUT = np.full((3, 3), 0, np.int32)
_MODE_LUT[0, 1] = 1  # rgb
_MODE_LUT[0, 2] = 2  # rbg
_MODE_LUT[1, 0] = 3  # grb
_MODE_LUT[1, 2] = 4  # gbr
_MODE_LUT[2, 0] = 5  # brg
_MODE_LUT[2, 1] = 6  # bgr


def build_inserting_scene(solver_iters: int = 25) -> emodel.SceneModel:
    robot = panda.build_sim_chain("rod")
    boxes = [dict(name=f"push_box{i+1}", mass=0.05, size=(0.025, 0.025, 0.025))
             for i in range(3)]
    statics = [scenes.table_geom()]
    for i, (pos, yaw_deg, half) in enumerate(MAZE_WALLS):
        yaw = np.radians(yaw_deg)
        quat = (np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2))
        statics.append(emodel.Geom(
            gtype=emodel.BOX, size=tuple(half), pos=tuple(pos),
            quat=tuple(quat), name=f"maze_{i+3}"))
    return emodel.build_scene(robot, scenes.rod_robot_geoms(robot), boxes,
                              statics, collide_robot_static=True,
                              solver_iters=solver_iters)


class InsertingParams(common.RodTaskParams):
    def __init__(self, n_substeps: int = 35, max_steps: int = 2000,
                 solver_iters: int = 25, kinematic: bool = False):
        super().__init__(build_inserting_scene(solver_iters), n_substeps,
                         max_steps, kinematic=kinematic)
        self.targets = jnp.asarray(TARGETS, jnp.float32)


class InsertingState(NamedTuple):
    scene: estep.SceneState
    ctrl: cartesian.CartImpedanceState
    t: jax.Array
    terminated: jax.Array
    visited: jax.Array     # [3] bool: box i has reached its target
    order: jax.Array       # [3] int box index, -1 until filled
    n_visited: jax.Array
    success: jax.Array


def sample_context(key):
    """(box_xy [3,2], box_quat [3,4]) from the per-box context spaces with
    yaw in ±90° (gate_insertion.py:84-96)."""
    k1, k2 = jax.random.split(key)
    lo = jnp.asarray(CONTEXT_SPACES[:, :2], jnp.float32)
    hi = jnp.asarray(CONTEXT_SPACES[:, 2:], jnp.float32)
    xy = jax.random.uniform(k1, (3, 2)) * (hi - lo) + lo
    deg = jax.random.uniform(k2, (3,), minval=-90.0, maxval=90.0)
    yaw = deg * jnp.pi / 180.0
    quat = jax.vmap(lambda y: quat_ops.from_euler(jnp.array([0.0, 0.0, 1.0]) * y))(yaw)
    return xy, quat


def reset(params: InsertingParams, context) -> InsertingState:
    xy, quat = context
    dtype = jnp.float32
    # set_context places boxes at z = 0 (gate_insertion.py:100-118) and lets
    # MuJoCo's solver pop them out; we spawn directly at the settled rest
    # height (table top -0.019 + half extent 0.025) for the same steady state
    rest_z = scenes.TABLE_Z + 0.025
    free_pos = jnp.concatenate([xy.astype(dtype),
                                jnp.full((3, 1), rest_z, dtype)], axis=1)
    sc = common.init_scene_state(params, dtype, free_pos, quat.astype(dtype))
    sc = common.settle(params, sc, n=2)
    cs = cartesian.init_state(sc.q[:7])
    return InsertingState(
        scene=sc, ctrl=cs, t=jnp.array(0, jnp.int32),
        terminated=jnp.array(False), visited=jnp.zeros(3, jnp.bool_),
        order=jnp.full(3, -1, jnp.int32), n_visited=jnp.array(0, jnp.int32),
        success=jnp.array(False))


def get_observation(params: InsertingParams, state: InsertingState) -> jax.Array:
    """(gate_insertion.py:278-317): [robot_xy, 3 x (box_xy, tan yaw)] — 11
    dims (the reference's declared Box(shape=(14,)) is stale; its
    get_observation returns 11)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    parts = [tcp_pos[:2]]
    for i in range(3):
        parts.append(state.scene.free_pos[i, :2])
        parts.append(common.yaw_tan(state.scene.free_quat[i]))
    return jnp.concatenate(parts)


def _target_dists(params, state):
    """3-D box-center to target distances (obj_distance uses full positions,
    gate_insertion.py:394-404)."""
    return jnp.linalg.norm(state.scene.free_pos - params.targets, axis=-1)


def _success_now(params, state):
    return (_target_dists(params, state) <= TARGET_MIN_DIST).all()


def _update_mode(params, state: InsertingState) -> InsertingState:
    """First-visit order tracking (check_mode, gate_insertion.py:390-412):
    each box is appended to the order list the first step it is within the
    target threshold (reference appends in fixed r,g,b scan order when
    several cross in one step; replicated by the fori loop below)."""
    near = _target_dists(params, state) <= TARGET_MIN_DIST

    def body(i, st):
        visited, order, n = st
        new = near[i] & ~visited[i]
        order = jnp.where(new, order.at[n].set(i), order)
        n = jnp.where(new, n + 1, n)
        visited = visited.at[i].set(visited[i] | near[i])
        return visited, order, n

    visited, order, n = jax.lax.fori_loop(
        0, 3, body, (state.visited, state.order, state.n_visited))
    return state._replace(visited=visited, order=order, n_visited=n)


def decode_mode(state_order: jax.Array, n_visited: jax.Array) -> jax.Array:
    """Reference mode id 1..6, or 0 while fewer than 3 boxes are placed
    (gate_insertion.py:210-216,236-241)."""
    lut = jnp.asarray(_MODE_LUT)
    first = jnp.clip(state_order[0], 0, 2)
    second = jnp.clip(state_order[1], 0, 2)
    return jnp.where(n_visited == 3, lut[first, second], 0)


def get_reward(params, state) -> jax.Array:
    """Dense reward (gate_insertion.py:440-470):
    -(min robot-box distance + sum of box-target distances)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    d_rb = jnp.linalg.norm(state.scene.free_pos[:, :2] - tcp_pos[None, :2],
                           axis=-1).min()
    return -(d_rb + _target_dists(params, state).sum())


def step(params: InsertingParams, state: InsertingState, action: jax.Array):
    """action: [x, y, z, qw, qx, qy, qz] absolute Cartesian setpoint (the
    rollout harness composes delta + fixed z + [0,1,0,0] as in the other
    rod tasks)."""
    obs = get_observation(params, state)
    reward = get_reward(params, state)
    early = _success_now(params, state)
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early

    des_pos = action[:3]
    des_quat = quat_ops.normalize(action[3:7])
    sc, cs = common.run_substeps(params, state.scene, state.ctrl, des_pos,
                                 des_quat)
    state = state._replace(scene=sc, ctrl=cs, t=state.t + 1,
                           terminated=terminated)
    succ = _success_now(params, state)
    state = state._replace(success=succ, terminated=state.terminated | succ)
    state = _update_mode(params, state)
    dists = _target_dists(params, state)
    info = {"mode": decode_mode(state.order, state.n_visited),
            "success": state.success,
            "mean_distance": dists.mean(),
            "one_box_success": state.n_visited >= 1,
            "two_box_success": state.n_visited >= 2,
            "three_box_success": state.n_visited >= 3}
    return state, common.StepResult(obs=obs, reward=reward, done=done,
                                    info=info)
