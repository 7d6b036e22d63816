"""Sorting task (2/4/6 boxes): push red boxes to the red zone, blue to blue.

Functional port of the reference `Sorting_Env`
(envs/gym_sorting_env/gym_sorting/envs/sorting.py:193-560): boxes slide on a
raised platform (static box, top z=0.1, friction 0.3 with geom priority;
platform.xml + sorting_objects.py:14-16 pos override to [0.5,-0.1,0]) and are
pushed off its +y edge into rectangular target zones on the table
(red x in (0.3,0.5), blue x in (0.525,0.725), y in (0.22,0.41),
sorting.py:489-503). The behavior mode is the color order in which boxes
reach their zones, bit-packed (sorting.py:460-507).
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

# init EE pose (sorting_objects.py:11)
INIT_EE_POS = np.array([0.525, -0.3, 0.25])

RED_TARGET = np.array([0.4, 0.32])
BLUE_TARGET = np.array([0.625, 0.32])
RED_ZONE = np.array([[0.3, 0.22], [0.5, 0.41]])      # [[xmin,ymin],[xmax,ymax]]
BLUE_ZONE = np.array([[0.525, 0.22], [0.725, 0.41]])

# context spaces (sorting.py:52-75): rows of [x_lo, y_lo, x_hi, y_hi]
CONTEXT_SPACES = np.array([
    [0.4, -0.15, 0.5, -0.1],
    [0.4, -0.05, 0.5, 0.0],
    [0.4, 0.05, 0.5, 0.1],
    [0.55, -0.15, 0.65, -0.1],
    [0.55, -0.05, 0.65, 0.0],
    [0.55, 0.05, 0.65, 0.1],
])


def build_sorting_scene(num_boxes: int, solver_iters: int = 25):
    robot = panda.build_sim_chain("rod")
    half = num_boxes // 2
    boxes = ([dict(name=f"red_{i+1}", mass=0.05, size=(0.03, 0.03, 0.03))
              for i in range(half)]
             + [dict(name=f"blue_{i+1}", mass=0.05, size=(0.03, 0.03, 0.03))
                for i in range(half)])
    platform = emodel.Geom(
        gtype=emodel.BOX, size=(0.3, 0.3, 0.1), pos=(0.5, -0.1, 0.0),
        friction=(0.3, 0.001, 0.0001), priority=1, name="platform")
    static = [scenes.table_geom(), platform]
    return emodel.build_scene(robot, scenes.rod_robot_geoms(robot), boxes,
                              static, collide_robot_static=True,
                              solver_iters=solver_iters)


class SortingParams(common.RodTaskParams):
    def __init__(self, num_boxes: int = 2, n_substeps: int = 35,
                 max_steps: int = 700, solver_iters: int = 25,
                 kinematic: bool = False):
        assert num_boxes in (2, 4, 6)
        super().__init__(build_sorting_scene(num_boxes, solver_iters),
                         n_substeps, max_steps, init_ee_pos=INIT_EE_POS,
                         kinematic=kinematic)
        self.num_boxes = num_boxes


class SortingState(NamedTuple):
    scene: estep.SceneState
    ctrl: cartesian.CartImpedanceState
    t: jax.Array
    terminated: jax.Array
    mode: jax.Array        # [6] int, -1 until filled
    mode_step: jax.Array
    finished_box: jax.Array  # [6] bool: box already credited
    success: jax.Array


def sample_context(key, num_boxes: int):
    """Shuffled assignment of boxes to the 6 spawn regions
    (sorting.py:88-120: sample all six, shuffle, take first num_boxes)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lo = jnp.asarray(CONTEXT_SPACES[:, :2], jnp.float32)
    hi = jnp.asarray(CONTEXT_SPACES[:, 2:], jnp.float32)
    xy = jax.random.uniform(k1, (6, 2)) * (hi - lo) + lo
    deg = jax.random.uniform(k2, (6,), minval=-90.0, maxval=90.0)
    perm = jax.random.permutation(k3, 6)
    xy = xy[perm][:num_boxes]
    yaw = deg[perm][:num_boxes] * jnp.pi / 180.0
    quat = jax.vmap(lambda y: quat_ops.from_euler(jnp.array([0.0, 0.0, 1.0]) * y))(yaw)
    return xy, quat


def reset(params: SortingParams, context) -> SortingState:
    xy, quat = context
    dtype = jnp.float32
    n = params.num_boxes
    # context z = 0.05 (sorting.py:125-186); boxes settle onto the platform
    free_pos = jnp.concatenate([xy.astype(dtype),
                                jnp.full((n, 1), 0.05, dtype)], axis=1)
    sc = common.init_scene_state(params, dtype, free_pos, quat.astype(dtype))
    sc = common.settle(params, sc, n=60)  # boxes pop out of the platform
    cs = cartesian.init_state(sc.q[:7])
    return SortingState(
        scene=sc, ctrl=cs, t=jnp.array(0, jnp.int32),
        terminated=jnp.array(False),
        mode=jnp.full(6, -1, jnp.int32), mode_step=jnp.array(0, jnp.int32),
        finished_box=jnp.zeros(6, jnp.bool_), success=jnp.array(False))


def get_observation(params: SortingParams, state: SortingState) -> jax.Array:
    tcp_pos, _ = params.tcp_pose(state.scene)
    parts = [tcp_pos[:2]]
    for i in range(params.num_boxes):
        parts.append(state.scene.free_pos[i, :2])
        parts.append(common.yaw_tan(state.scene.free_quat[i]))
    return jnp.concatenate(parts)


def _in_zone(xy, zone):
    return ((xy[..., 0] > zone[0, 0]) & (xy[..., 0] < zone[1, 0])
            & (xy[..., 1] > zone[0, 1]) & (xy[..., 1] < zone[1, 1]))


def _success_now(params, state):
    half = params.num_boxes // 2
    xy = state.scene.free_pos[:, :2]
    red_ok = _in_zone(xy[:half], jnp.asarray(RED_ZONE, xy.dtype)).all()
    blue_ok = _in_zone(xy[half:], jnp.asarray(BLUE_ZONE, xy.dtype)).all()
    return red_ok & blue_ok


def _update_mode(params, state: SortingState) -> SortingState:
    """One box may 'finish' per step: the unfinished box closest to its color
    target, if inside its zone (sorting.py:464-507)."""
    half = params.num_boxes // 2
    n = params.num_boxes
    xy = state.scene.free_pos[:, :2]
    is_red = jnp.arange(n) < half
    tgt = jnp.where(is_red[:, None], jnp.asarray(RED_TARGET, xy.dtype),
                    jnp.asarray(BLUE_TARGET, xy.dtype))
    dists = jnp.linalg.norm(xy - tgt, axis=-1)
    dists = jnp.where(state.finished_box[:n], 1e5, dists)
    mi = jnp.argmin(dists)
    fin = _in_zone(xy[mi], jnp.where(
        is_red[mi], jnp.asarray(RED_ZONE, xy.dtype), jnp.asarray(BLUE_ZONE, xy.dtype)))
    can = (state.mode_step <= 5) & fin
    color_bit = jnp.where(is_red[mi], 0, 1)
    mode = jnp.where(can, state.mode.at[state.mode_step].set(color_bit), state.mode)
    finished = jnp.where(can, state.finished_box.at[mi].set(True),
                         state.finished_box)
    step = jnp.where(can, state.mode_step + 1, state.mode_step)
    return state._replace(mode=mode, mode_step=step, finished_box=finished)


def decode_mode(mode: jax.Array, num_boxes: int) -> jax.Array:
    """np.packbits of the first num_boxes entries (sorting.py:460-462):
    any nonzero entry (including unfilled -1) contributes a 1 bit."""
    bits = (mode[:num_boxes] != 0).astype(jnp.int32)
    weights = 2 ** (7 - jnp.arange(num_boxes))
    return (bits * weights).sum()


def step(params: SortingParams, state: SortingState, action: jax.Array):
    obs = get_observation(params, state)
    early = _success_now(params, state)
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early

    des_pos = action[:3]
    des_quat = quat_ops.normalize(action[3:7])
    sc, cs = common.run_substeps(params, state.scene, state.ctrl, des_pos, des_quat)
    state = state._replace(scene=sc, ctrl=cs, t=state.t + 1,
                           terminated=terminated)
    succ = _success_now(params, state)
    state = state._replace(success=succ, terminated=state.terminated | succ)
    state = _update_mode(params, state)
    info = {"mode": decode_mode(state.mode, params.num_boxes),
            "success": state.success}
    return state, common.StepResult(obs=obs, reward=jnp.zeros(()), done=done,
                                    info=info)
