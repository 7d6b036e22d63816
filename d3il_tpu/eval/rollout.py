"""Batched on-device rollouts.

Replaces the reference's per-process evaluation workers
(simulation/pushing_sim.py:93-138: spawn + CPU pinning + shared-memory
tensors) with a single jitted, vmapped rollout: the env batch dimension holds
(contexts x trajectories) episodes stepped in lockstep; finished episodes are
frozen via masking (the functional analogue of the reference's `while not
done` early break, pushing_sim.py:72-85).

The rollout protocol matches simulation/*_sim.py:55-85 exactly, including the
reference's one-step observation lag: GymEnvWrapper.step computes the
returned observation BEFORE running the physics substeps
(gym_env_wrapper.py:88-93), so the policy at iteration k sees the env state
as of the entry of step k-1.

  obs_policy_k = concat(prev_abs_action_xy, obs_returned_by_step_{k-1})
  delta        = policy(obs_policy_k)
  abs_xy       = delta + prev_abs_action_xy
  env action   = [abs_xy, fixed_z, 0, 1, 0, 0]

with prev_abs_action initialized to the tcp position after reset
(pushing_sim.py:66-80).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _freeze(mask, new, old):
    """Where mask (scalar bool), keep old pytree; else take new."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(jnp.reshape(mask, (1,) * n.ndim), o, n), new, old)


def make_rod_stepper(params, reset_fn, step_fn, observe_fn, policy_apply,
                     pos_dim: int = 2):
    """(init, body) pair for the Cartesian-delta tasks — the building blocks
    of both the one-dispatch rollout below and the chunked driver in
    eval/sims.py (tunneled-TPU dispatches must stay under the RPC limit).

    init(policy_params, policy_carry0, context) -> carry
    body(policy_params, carry) -> carry   (one env step; frozen when done)
    """
    def init(policy_params, policy_carry0, context):
        state = reset_fn(params, context)
        tcp_pos, _ = params.tcp_pose(state.scene)
        obs0 = observe_fn(params, state)
        return (state, policy_carry0, tcp_pos[:pos_dim], obs0,
                jnp.array(False), tcp_pos[2:3])

    def body(policy_params, carry):
        state, pc, prev_pos, prev_obs, finished, fixed_z = carry
        obs_policy = jnp.concatenate([prev_pos, prev_obs])
        pc2, delta = policy_apply(policy_params, pc, obs_policy)
        # the reference envs bound the per-step delta (action_space
        # Box(+-0.01), pushing.py:203-205)
        abs_pos = jnp.clip(delta[:pos_dim], -0.01, 0.01) + prev_pos
        if pos_dim == 2:
            pos3 = jnp.concatenate([abs_pos, fixed_z])
        else:
            pos3 = abs_pos
        action = jnp.concatenate(
            [pos3, jnp.array([0.0, 1.0, 0.0, 0.0], abs_pos.dtype)])
        new_state, res = step_fn(params, state, action)
        state2 = _freeze(finished, new_state, state)
        pc2 = _freeze(finished, pc2, pc)
        new_pos = jnp.where(finished, prev_pos, abs_pos)
        new_obs = jnp.where(finished, prev_obs, res.obs)
        now_finished = finished | res.done
        return (state2, pc2, new_pos, new_obs, now_finished, fixed_z)

    return init, body


def make_rod_rollout(params, reset_fn, step_fn, observe_fn, policy_apply,
                     max_steps: int | None = None, pos_dim: int = 2):
    """Single-dispatch episode rollout (see make_rod_stepper).

    Returns rollout(policy_params, policy_carry0, context)
      -> (final env state, dones [T]).
    """
    T = max_steps if max_steps is not None else params.max_steps
    init, body = make_rod_stepper(params, reset_fn, step_fn, observe_fn,
                                  policy_apply, pos_dim)

    def rollout(policy_params, policy_carry0, context):
        def scan_body(carry, _):
            carry = body(policy_params, carry)
            return carry, carry[4]
        carry0 = init(policy_params, policy_carry0, context)
        carry, dones = jax.lax.scan(scan_body, carry0, None, length=T)
        return carry[0], dones

    return rollout


def make_joint_stepper(params, reset_fn, step_fn, observe_fn, robot_state_fn,
                       policy_apply):
    """(init, body) pair for the joint-space Stacking rollout
    (stacking_sim.py:92-141):

      obs_policy = concat(prev_action8, env_obs)       # 8 + 12 = 20 dims
      pred = policy(obs_policy); q_des = pred[:7] + prev_action8[:7]
      env action = [q_des, pred[7]] (gripper width passed through raw)

    prev_action8 initialized from robot_state() after reset (j_pos + width).
    """
    def init(policy_params, policy_carry0, context):
        state = reset_fn(params, context)
        prev_a = robot_state_fn(params, state)
        obs0 = observe_fn(params, state)
        return (state, policy_carry0, prev_a, obs0, jnp.array(False))

    def body(policy_params, carry):
        state, pc, prev_a, prev_obs, finished = carry
        obs_policy = jnp.concatenate([prev_a, prev_obs])
        pc2, pred = policy_apply(policy_params, pc, obs_policy)
        action = jnp.concatenate([pred[:7] + prev_a[:7], pred[7:8]])
        new_state, res = step_fn(params, state, action)
        state2 = _freeze(finished, new_state, state)
        pc2 = _freeze(finished, pc2, pc)
        new_a = jnp.where(finished, prev_a, action)
        new_obs = jnp.where(finished, prev_obs, res.obs)
        now_finished = finished | res.done
        return (state2, pc2, new_a, new_obs, now_finished)

    return init, body


def make_joint_rollout(params, reset_fn, step_fn, observe_fn, robot_state_fn,
                       policy_apply, max_steps: int | None = None):
    """Single-dispatch joint-space rollout (see make_joint_stepper)."""
    T = max_steps if max_steps is not None else params.max_steps
    init, body = make_joint_stepper(params, reset_fn, step_fn, observe_fn,
                                    robot_state_fn, policy_apply)

    def rollout(policy_params, policy_carry0, context):
        def scan_body(carry, _):
            carry = body(policy_params, carry)
            return carry, carry[4]
        carry, dones = jax.lax.scan(
            scan_body, init(policy_params, policy_carry0, context), None,
            length=T)
        return carry[0], dones

    return rollout
