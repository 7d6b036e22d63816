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


def make_rod_rollout(params, reset_fn, step_fn, observe_fn, policy_apply,
                     max_steps: int | None = None):
    """Build a jittable single-episode rollout for the delta-xy action tasks
    (Avoiding, Pushing, Sorting; Aligning uses delta-xyz via its own variant).

    policy_apply(policy_params, carry, obs) -> (carry, delta_action)
    Returns rollout(policy_params, policy_carry0, context)
      -> (final env state, dones [T]).
    """
    T = max_steps if max_steps is not None else params.max_steps

    def rollout(policy_params, policy_carry0, context):
        state = reset_fn(params, context)
        tcp_pos, _ = params.tcp_pose(state.scene)
        fixed_z = tcp_pos[2:3]
        obs0 = observe_fn(params, state)

        def body(carry, _):
            state, pc, prev_xy, prev_obs, finished = carry
            obs_policy = jnp.concatenate([prev_xy, prev_obs])
            pc2, delta = policy_apply(policy_params, pc, obs_policy)
            abs_xy = delta[:2] + prev_xy
            action = jnp.concatenate(
                [abs_xy, fixed_z, jnp.array([0.0, 1.0, 0.0, 0.0], abs_xy.dtype)])
            new_state, res = step_fn(params, state, action)
            state2 = _freeze(finished, new_state, state)
            pc2 = _freeze(finished, pc2, pc)
            new_xy = jnp.where(finished, prev_xy, abs_xy)
            new_obs = jnp.where(finished, prev_obs, res.obs)
            now_finished = finished | res.done
            return (state2, pc2, new_xy, new_obs, now_finished), res.done

        init = (state, policy_carry0, tcp_pos[:2], obs0, jnp.array(False))
        (state, _, _, _, _), dones = jax.lax.scan(body, init, None, length=T)
        return state, dones

    return rollout
