"""Pushing task: two blocks to two targets, 4 solution modes.

Vectorized functional port of the reference `Block_Push_Env`
(envs/gym_pushing_env/gym_pushing/envs/pushing.py:171-497): same
observation layout, action semantics, success predicate (both boxes within
0.05 m of either color assignment, pushing.py:440-459), first/second-visit
mode tracking (pushing.py:341-377), and context distribution
(BlockContextManager, pushing.py:47-168).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.envs import common, scenes
from d3il_tpu.engine import step as estep
from d3il_tpu.control import cartesian
from d3il_tpu.ops import quat as quat_ops

TARGET_MIN_DIST = 0.05  # pushing.py:252
N_MODES = 4


class PushingParams(common.RodTaskParams):
    def __init__(self, n_substeps: int = 35, max_steps: int = 400,
                 solver_iters: int = 25, kinematic: bool = False):
        super().__init__(scenes.build_pushing_scene(solver_iters),
                         n_substeps, max_steps, kinematic=kinematic)
        self.target1 = jnp.asarray(scenes.PUSHING_TARGET_1, jnp.float32)
        self.target2 = jnp.asarray(scenes.PUSHING_TARGET_2, jnp.float32)


class PushingState(NamedTuple):
    scene: estep.SceneState
    ctrl: cartesian.CartImpedanceState
    t: jax.Array
    terminated: jax.Array
    first_visit: jax.Array  # -1 until a box first reaches a target
    mode: jax.Array         # -1 until the second target is reached
    success: jax.Array


def sample_context(key) -> tuple:
    """Sample a context = (red_pos3[x,y,deg], red_quat, green_pos3, green_quat)
    from the reference context spaces (pushing.py:54-59)."""
    k1, k2 = jax.random.split(key)
    lo_r = jnp.array([0.4, -0.15, -90.0])
    hi_r = jnp.array([0.5, 0.0, 90.0])
    lo_g = jnp.array([0.55, -0.15, -90.0])
    hi_g = jnp.array([0.65, 0.0, 90.0])
    red = jax.random.uniform(k1, (3,)) * (hi_r - lo_r) + lo_r
    green = jax.random.uniform(k2, (3,)) * (hi_g - lo_g) + lo_g
    qr = quat_ops.from_euler(jnp.array([0.0, 0.0, 1.0]) * red[2] * jnp.pi / 180.0)
    qg = quat_ops.from_euler(jnp.array([0.0, 0.0, 1.0]) * green[2] * jnp.pi / 180.0)
    return red[:2], qr, green[:2], qg


def reset(params: PushingParams, context) -> PushingState:
    """context = (red_xy, red_quat, green_xy, green_quat)."""
    red_xy, red_quat, green_xy, green_quat = context
    dtype = jnp.float32
    free_pos = jnp.stack([
        jnp.concatenate([red_xy.astype(dtype), jnp.zeros(1, dtype)]),
        jnp.concatenate([green_xy.astype(dtype), jnp.zeros(1, dtype)]),
    ])
    free_quat = jnp.stack([red_quat.astype(dtype), green_quat.astype(dtype)])
    sc = common.init_scene_state(params, dtype, free_pos, free_quat)
    sc = common.settle(params, sc, n=2)
    cs = cartesian.init_state(sc.q[:7])
    zi = jnp.array(0, jnp.int32)
    return PushingState(scene=sc, ctrl=cs, t=zi,
                        terminated=jnp.array(False),
                        first_visit=jnp.array(-1, jnp.int32),
                        mode=jnp.array(-1, jnp.int32),
                        success=jnp.array(False))


def get_observation(params: PushingParams, state: PushingState) -> jax.Array:
    """(pushing.py:255-280): [robot_xy, box1_xy, tan(yaw1), box2_xy, tan(yaw2)]."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    b1, b2 = state.scene.free_pos[0], state.scene.free_pos[1]
    y1 = common.yaw_tan(state.scene.free_quat[0])
    y2 = common.yaw_tan(state.scene.free_quat[1])
    return jnp.concatenate([tcp_pos[:2], b1[:2], y1, b2[:2], y2])


def _distances(params, state):
    b1, b2 = state.scene.free_pos[0], state.scene.free_pos[1]
    g1, g2 = params.target1, params.target2
    return (jnp.linalg.norm(b1 - g1), jnp.linalg.norm(b1 - g2),
            jnp.linalg.norm(b2 - g1), jnp.linalg.norm(b2 - g2))


def _success_now(params, state):
    rr, rg, gr, gg = _distances(params, state)
    d = TARGET_MIN_DIST
    return ((rr <= d) & (gg <= d)) | ((rg <= d) & (gr <= d))


def _update_mode(params, state: PushingState) -> PushingState:
    """first/second-visit tracking (pushing.py:341-377)."""
    rr, rg, gr, gg = _distances(params, state)
    d = TARGET_MIN_DIST
    fv = state.first_visit
    visit = jnp.where(
        (rr <= d) & (fv != 0), 0,
        jnp.where((rg <= d) & (fv != 1), 1,
                  jnp.where((gr <= d) & (fv != 2), 2,
                            jnp.where((gg <= d) & (fv != 3), 3, -1))))
    new_fv = jnp.where(fv == -1, visit, fv)
    pair_mode = jnp.where((fv == 0) & (visit == 3), 0,
                jnp.where((fv == 3) & (visit == 0), 1,
                jnp.where((fv == 1) & (visit == 2), 2,
                jnp.where((fv == 2) & (visit == 1), 3, -1))))
    new_mode = jnp.where(fv == -1, jnp.array(-1, jnp.int32), pair_mode)
    return state._replace(first_visit=new_fv, mode=new_mode)


def get_reward(params, state) -> jax.Array:
    """Dense reward (pushing.py:398-410 active branch):
    -(|robot-box1| + |box1-target1|)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    b1 = state.scene.free_pos[0]
    rr, _, _, _ = _distances(params, state)
    d_rb = jnp.linalg.norm(tcp_pos[:2] - b1[:2])
    return -(d_rb + rr)




def step(params: PushingParams, state: PushingState, action: jax.Array):
    """action: [x, y, z, qw, qx, qy, qz] absolute Cartesian setpoint (the
    rollout harness composes delta + fixed z + [0,1,0,0],
    simulation/pushing_sim.py:72-80)."""
    # pre-substep outputs (GymEnvWrapper.step:88-93 computes obs/reward/done
    # before running the substeps)
    obs = get_observation(params, state)
    reward = get_reward(params, state)
    early = _success_now(params, state)
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early

    des_pos = action[:3]
    des_quat = quat_ops.normalize(action[3:7])
    sc, cs = common.run_substeps(params, state.scene, state.ctrl, des_pos, des_quat)

    state = state._replace(scene=sc, ctrl=cs, t=state.t + 1,
                           terminated=terminated)
    # post-substep success / mode (pushing.py:335-339)
    succ = _success_now(params, state)
    state = state._replace(success=succ,
                           terminated=state.terminated | succ)
    state = _update_mode(params, state)
    rr, rg, gr, gg = _distances(params, state)
    mean_distance = 0.5 * (jnp.minimum(rr, rg) + jnp.minimum(gr, gg))
    info = {"mode": state.mode, "success": state.success,
            "mean_distance": mean_distance}
    return state, common.StepResult(obs=obs, reward=reward, done=done, info=info)
