"""Obstacle-avoiding task: reach the goal line through 24 valid gate paths.

Functional port of the reference `ObstacleAvoidanceEnv`
(envs/gym_avoiding_env/gym_avoiding/envs/avoiding.py:52-270): observation is
the robot tcp xy, failure is any rod/obstacle collision (avoiding.py:204-217),
success is crossing the goal line y (avoiding.py:219-223), and the behavior
mode is a 9-bit gate-passage encoding (avoiding.py:172-201).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.control import cartesian
from d3il_tpu.engine import collision as ecol
from d3il_tpu.engine import step as estep
from d3il_tpu.envs import common, scenes
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod


class AvoidingParams(common.RodTaskParams):
    def __init__(self, n_substeps: int = 35, max_steps: int = 250,
                 solver_iters: int = 15, kinematic: bool = False):
        super().__init__(scenes.build_avoiding_scene(solver_iters),
                         n_substeps, max_steps, kinematic=kinematic)
        # rod-vs-obstacle capsule parameters for the failure predicate
        hand = self.scene.robot.body_index("panda_hand")
        self.hand_body = hand
        self.obstacles = np.array([
            [scenes.AVOIDING_L1_X, scenes.AVOIDING_L1_Y, 0.03, 0.07],
            [scenes.AVOIDING_L2_TOP_X, scenes.AVOIDING_L2_Y, 0.025, 0.1],
            [scenes.AVOIDING_L2_BOT_X, scenes.AVOIDING_L2_Y, 0.025, 0.1],
            [scenes.AVOIDING_L3_TOP_X, scenes.AVOIDING_L3_Y, 0.025, 0.1],
            [scenes.AVOIDING_L3_MID_X, scenes.AVOIDING_L3_Y, 0.025, 0.1],
            [scenes.AVOIDING_L3_BOT_X, scenes.AVOIDING_L3_Y, 0.025, 0.1],
        ])


class AvoidingState(NamedTuple):
    scene: estep.SceneState
    ctrl: cartesian.CartImpedanceState
    t: jax.Array
    terminated: jax.Array
    mode_encoding: jax.Array   # [9] float 0/1
    passed: jax.Array          # [3] level-passed flags
    success: jax.Array
    failure: jax.Array


def reset(params: AvoidingParams, context=None) -> AvoidingState:
    sc = common.init_scene_state(params)
    sc = common.settle(params, sc, n=2)
    cs = cartesian.init_state(sc.q[:7])
    return AvoidingState(
        scene=sc, ctrl=cs, t=jnp.array(0, jnp.int32),
        terminated=jnp.array(False),
        mode_encoding=jnp.zeros(9, jnp.float32),
        passed=jnp.zeros(3, jnp.bool_),
        success=jnp.array(False), failure=jnp.array(False))


def get_observation(params: AvoidingParams, state: AvoidingState) -> jax.Array:
    """robot tcp xy (avoiding.py:117-119)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    return tcp_pos[:2]


def _rod_collision(params: AvoidingParams, sc: estep.SceneState) -> jax.Array:
    """True if the rod capsule touches any obstacle (avoiding.py:204-217)."""
    xpos, xquat = chain_mod.fk(params.scene.robot, sc.q)
    hand_p, hand_q = xpos[params.hand_body], xquat[params.hand_body]
    rod_pos = hand_p + quat_ops.rotate(hand_q, jnp.array([0.0, 0.0, 0.075], sc.q.dtype))
    hits = []
    for (x, y, r, hl) in params.obstacles:
        obs_pos = jnp.array([x, y, 0.0], sc.q.dtype)
        c = ecol.capsule_capsule(rod_pos, hand_q, 0.01, 0.14,
                                 obs_pos, jnp.array([1.0, 0, 0, 0], sc.q.dtype),
                                 float(r), float(hl))
        hits.append(c.depth[0] > 0)
    return jnp.any(jnp.stack(hits))


def _check_mode(params, state: AvoidingState) -> AvoidingState:
    """9-bit gate encoding (avoiding.py:172-201)."""
    tcp_pos, _ = params.tcp_pose(state.scene)
    x, y = tcp_pos[0], tcp_pos[1]
    enc = state.mode_encoding
    passed = state.passed

    l1_hit = (jnp.abs(y - scenes.AVOIDING_L1_Y) <= 0.03) & ~passed[0]
    enc = enc.at[0].add(jnp.where(l1_hit & (x < scenes.AVOIDING_L1_X), 1.0, 0.0))
    enc = enc.at[1].add(jnp.where(l1_hit & (x > scenes.AVOIDING_L1_X), 1.0, 0.0))
    passed = passed.at[0].set(passed[0] | l1_hit)

    l2_hit = (jnp.abs(y - scenes.AVOIDING_L2_Y) <= 0.03) & ~passed[1]
    enc = enc.at[2].add(jnp.where(l2_hit & (x < scenes.AVOIDING_L2_TOP_X), 1.0, 0.0))
    enc = enc.at[3].add(jnp.where(
        l2_hit & (x > scenes.AVOIDING_L2_TOP_X) & (x < scenes.AVOIDING_L2_BOT_X), 1.0, 0.0))
    enc = enc.at[4].add(jnp.where(l2_hit & (x > scenes.AVOIDING_L2_BOT_X), 1.0, 0.0))
    passed = passed.at[1].set(passed[1] | l2_hit)

    l3_hit = (y >= scenes.AVOIDING_L3_Y) & ~passed[2]
    # reference branch structure (avoiding.py:191-199): note the last branch
    # uses l3_top_xpos, reproducing its quirk exactly
    b5 = x < scenes.AVOIDING_L3_TOP_X
    b6 = (x > scenes.AVOIDING_L3_TOP_X) & (x < scenes.AVOIDING_L3_MID_X)
    b7 = (x > scenes.AVOIDING_L3_MID_X) & (x < scenes.AVOIDING_L3_BOT_X) & ~b6
    b8 = (x > scenes.AVOIDING_L3_TOP_X) & ~b6 & ~b7
    enc = enc.at[5].add(jnp.where(l3_hit & b5, 1.0, 0.0))
    enc = enc.at[6].add(jnp.where(l3_hit & b6, 1.0, 0.0))
    enc = enc.at[7].add(jnp.where(l3_hit & b7, 1.0, 0.0))
    enc = enc.at[8].add(jnp.where(l3_hit & b8, 1.0, 0.0))
    passed = passed.at[2].set(passed[2] | l3_hit)

    enc = jnp.clip(enc, 0.0, 1.0)
    return state._replace(mode_encoding=enc, passed=passed)


def step(params: AvoidingParams, state: AvoidingState, action: jax.Array):
    obs = get_observation(params, state)
    tcp_pos, _ = params.tcp_pose(state.scene)
    success_now = tcp_pos[1] > scenes.AVOIDING_GOAL_Y
    failure_now = _rod_collision(params, state.scene)
    early = success_now | failure_now
    done = state.terminated | early | (state.t >= params.max_steps - 1)
    terminated = state.terminated | early
    success = state.success | success_now
    failure = state.failure | (failure_now & ~state.success)

    des_pos = action[:3]
    des_quat = quat_ops.normalize(action[3:7])
    sc, cs = common.run_substeps(params, state.scene, state.ctrl, des_pos, des_quat)
    state = state._replace(scene=sc, ctrl=cs, t=state.t + 1,
                           terminated=terminated, success=success,
                           failure=failure)
    state = _check_mode(params, state)
    info = {"mode_encoding": state.mode_encoding, "success": state.success}
    return state, common.StepResult(obs=obs, reward=jnp.zeros(()), done=done,
                                    info=info)
