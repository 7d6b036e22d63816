"""Per-task evaluation harnesses ("sims"), batched on device.

Functional replacement for the reference simulation/*_sim.py classes: instead
of spawning one OS process per CPU core with shared-memory result tensors
(pushing_sim.py:93-138), every (context x trajectory) episode is one lane of
a vmapped, jitted rollout running in lockstep on the accelerator.

Each Sim exposes `test_agent(agent) -> dict` returning the reference's
metrics (success rate, behavioral entropy, KL, composite score) with the
same formulas (see eval/metrics.py for per-task citations). Fixed test
contexts are derived from PRNGKey(2), mirroring the reference's seed-2
context files (environments/dataset/data/pushing/get_contexts.py:14-25).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.eval import contexts as ref_contexts
from d3il_tpu.eval import metrics, rollout
from d3il_tpu.parallel import mesh as pmesh

CONTEXT_SEED = 2


def _context_keys(n: int, seed: int = CONTEXT_SEED):
    return jax.random.split(jax.random.PRNGKey(seed), n)


def _fixed_or_sampled(loader, sample_fn, n: int, use_fixed: bool):
    """Evaluation context set: the reference's shipped fixed contexts when
    available (VERDICT: agent-parity claims need the exact contexts the
    reference evaluates on), else freshly sampled from PRNGKey(2) — the same
    seed the reference's get_contexts.py used."""
    if use_fixed:
        fixed = loader()
        if fixed is not None:
            m = fixed[0].shape[0]
            reps = -(-n // m)  # ceil: tile if more contexts requested
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.concatenate([x] * reps)[:n]), fixed)
    return jax.vmap(sample_fn)(_context_keys(n))


def _grid(n_contexts: int, n_trajs: int, seed: int):
    """Flattened (context index, agent key) grid [C*T]."""
    cidx = np.repeat(np.arange(n_contexts), n_trajs)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_contexts * n_trajs)
    return jnp.asarray(cidx), keys


# One device dispatch per CHUNK env steps: a single dispatch spanning the
# whole episode horizon (e.g. 1000 stacking steps ~ 2.5 min) trips the
# tunneled TPU's RPC window and hard-faults the device (the expert demo
# runners chunk for the same reason, data/experts_jax.py CHUNK).
EVAL_CHUNK_STEPS = 200


def _run_episodes(stepper, agent, ctx_of, grid_args, T: int, obs_dim: int,
                  chunk: int | None = None):
    """Advance every episode T env steps in host-dispatched chunks.

    stepper: (init, body) from rollout.make_rod_stepper /
    make_joint_stepper; ctx_of(*grid_args_without_key) -> context pytree;
    grid_args: batched arrays, the LAST one is the per-episode PRNG key.
    Returns the final env state batch [B, ...]. Agents whose per-step cost
    is far above the state policies' (vision agents render two cameras per
    step) declare a smaller `eval_chunk_steps` so each dispatch stays under
    the tunneled TPU's RPC window."""
    if chunk is None:
        chunk = getattr(agent, "eval_chunk_steps", EVAL_CHUNK_STEPS)
    init, body = stepper

    def init_one(*args):
        *rest, key = args
        ctx = ctx_of(*rest)
        return init(agent.params, agent.init_carry(obs_dim, key), ctx)

    carry = pmesh.run_sharded(init_one, *grid_args)
    body_v = jax.vmap(lambda c: body(agent.params, c))
    compiled = {}

    def run_chunk(carry, k):
        if k not in compiled:
            def f(c):
                return jax.lax.scan(lambda cc, _: (body_v(cc), None), c,
                                    None, length=k)[0]
            compiled[k] = jax.jit(f)
        return compiled[k](carry)

    n = 0
    while n < T:
        k = min(chunk, T - n)
        carry = run_chunk(carry, k)
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        n += k
    return carry[0]


@dataclass
class AvoidingSim:
    """avoiding_sim.py: no contexts; N trajectories, entropy base 24.
    Default workload = the reference benchmark's 480 trajectories
    (scripts/avoiding/*_benchmark.sh)."""
    seed: int = 0
    n_trajectories: int = 480

    def test_agent(self, agent, params=None):
        from d3il_tpu.envs import avoiding as env
        params = params or avoiding_params()
        stepper = rollout.make_rod_stepper(
            params, lambda p, c: env.reset(p), env.step, env.get_observation,
            agent.policy_apply())
        obs_dim = 4  # des xy + cur xy (avoiding_sim.py:60-66)
        keys = jax.random.split(jax.random.PRNGKey(self.seed + 1),
                                self.n_trajectories)
        state = _run_episodes(stepper, agent, lambda: None, (keys,),
                              params.max_steps, obs_dim)
        return {k: float(v) for k, v in metrics.avoiding_score(
            jnp.asarray(state.success, jnp.float32),
            jnp.asarray(state.mode_encoding)).items()}


@dataclass
class PushingSim:
    """Default workload = the reference benchmark's 30 contexts x 16 trajs
    (scripts/pushing/ddpm_benchmark.sh:7-9), on the reference's shipped
    fixed test contexts (data/pushing/test_contexts.pkl)."""
    seed: int = 0
    n_contexts: int = 30
    n_trajectories_per_context: int = 16
    use_reference_contexts: bool = True

    def test_agent(self, agent, params=None):
        from d3il_tpu.envs import pushing as env
        params = params or pushing_params()
        stepper = rollout.make_rod_stepper(
            params, env.reset, env.step, env.get_observation,
            agent.policy_apply())
        ctxs = _fixed_or_sampled(ref_contexts.pushing_contexts,
                                 env.sample_context, self.n_contexts,
                                 self.use_reference_contexts)
        cidx, keys = _grid(self.n_contexts, self.n_trajectories_per_context,
                           self.seed)
        ctx_of = lambda ci: jax.tree_util.tree_map(lambda x: x[ci], ctxs)
        state = _run_episodes(stepper, agent, ctx_of, (cidx, keys),
                              params.max_steps, 10)
        C, T = self.n_contexts, self.n_trajectories_per_context
        return {k: float(v) for k, v in metrics.pushing_score(
            jnp.asarray(state.success, jnp.float32).reshape(C, T),
            jnp.asarray(state.mode).reshape(C, T)).items()}


@dataclass
class AligningSim:
    """Default workload = 60 contexts x 8 trajs (scripts/aligning/*.sh) on
    the reference's shipped fixed contexts."""
    seed: int = 0
    n_contexts: int = 60
    n_trajectories_per_context: int = 8
    use_reference_contexts: bool = True

    def test_agent(self, agent, params=None):
        from d3il_tpu.envs import aligning as env
        params = params or aligning_params()
        stepper = rollout.make_rod_stepper(
            params, env.reset, env.step, env.get_observation,
            agent.policy_apply(), pos_dim=3)
        ctxs = _fixed_or_sampled(ref_contexts.aligning_contexts,
                                 env.sample_context, self.n_contexts,
                                 self.use_reference_contexts)
        cidx, keys = _grid(self.n_contexts, self.n_trajectories_per_context,
                           self.seed)
        ctx_of = lambda ci: jax.tree_util.tree_map(lambda x: x[ci], ctxs)
        state = _run_episodes(stepper, agent, ctx_of, (cidx, keys),
                              params.max_steps, 20)
        pos_d = jnp.linalg.norm(state.scene.free_pos[:, 0] - state.target_pos,
                                axis=-1)
        rot_d = jax.vmap(env.rotation_distance)(
            state.scene.free_quat[:, 0], state.target_quat) / jnp.pi
        C, T = self.n_contexts, self.n_trajectories_per_context
        return {k: float(v) for k, v in metrics.aligning_score(
            jnp.asarray(state.success, jnp.float32).reshape(C, T),
            jnp.asarray(state.mode).reshape(C, T),
            (0.5 * (pos_d + rot_d)).reshape(C, T)).items()}


@dataclass
class InsertingSim:
    """Batched eval for the Inserting task (the reference declares the env,
    gate_insertion.py:154, but ships no simulation harness; metrics follow
    the pushing convention over the 6 insertion orders)."""
    seed: int = 0
    n_contexts: int = 30
    n_trajectories_per_context: int = 8
    max_steps: int = 400

    def test_agent(self, agent, params=None):
        from d3il_tpu.envs import inserting as env
        params = params or inserting_params(max_steps=self.max_steps)
        stepper = rollout.make_rod_stepper(
            params, env.reset, env.step, env.get_observation,
            agent.policy_apply())
        ctxs = jax.vmap(env.sample_context)(_context_keys(self.n_contexts))
        cidx, keys = _grid(self.n_contexts, self.n_trajectories_per_context,
                           self.seed)
        ctx_of = lambda ci: jax.tree_util.tree_map(lambda x: x[ci], ctxs)
        # obs: des xy + robot xy + 3 x (box xy, tan yaw) = 13
        state = _run_episodes(stepper, agent, ctx_of, (cidx, keys),
                              params.max_steps, 13)
        modes = jax.vmap(env.decode_mode)(state.order, state.n_visited)
        C, T = self.n_contexts, self.n_trajectories_per_context
        return {k: float(v) for k, v in metrics.inserting_score(
            jnp.asarray(state.success, jnp.float32).reshape(C, T),
            jnp.asarray(modes).reshape(C, T)).items()}


@dataclass
class SortingSim:
    """sorting_sim.py: mode = bit-packed color order; score SR - KL vs the
    demo mode prior (passed in as (mode_keys, prior), computed from the demo
    data like the reference's mode_prob pickles)."""
    seed: int = 0
    num_boxes: int = 2
    n_contexts: int = 60
    n_trajectories_per_context: int = 8
    max_steps: int = 700

    def test_agent(self, agent, params=None, mode_keys=None, prior=None):
        from d3il_tpu.envs import sorting as env
        params = params or sorting_params(self.num_boxes,
                                          max_steps=self.max_steps)
        stepper = rollout.make_rod_stepper(
            params, env.reset, env.step, env.get_observation,
            agent.policy_apply())
        sample = lambda k: env.sample_context(k, self.num_boxes)
        # no shipped context file for sorting; seed-2 sampling (60 x 8,
        # scripts/sorting/*.sh)
        ctxs = jax.vmap(sample)(_context_keys(self.n_contexts))
        cidx, keys = _grid(self.n_contexts, self.n_trajectories_per_context,
                           self.seed)
        ctx_of = lambda ci: jax.tree_util.tree_map(lambda x: x[ci], ctxs)
        state = _run_episodes(stepper, agent, ctx_of, (cidx, keys),
                              params.max_steps, 4 + 3 * self.num_boxes)
        succ = state.success
        modes = jax.vmap(lambda m: env.decode_mode(m, params.num_boxes))(
            state.mode)
        C, T = self.n_contexts, self.n_trajectories_per_context
        if mode_keys is None:
            # demo-derived mode prior when a generated dataset exists
            # (the reference scores KL against its demos' mode distribution)
            import os
            task_dir = os.path.join(os.path.dirname(ref_contexts.REF_DIR),
                                    f"sorting_{self.num_boxes}")
            demo = ref_contexts.mode_prior_from_demos(task_dir) \
                if os.path.isdir(task_dir) else None
            if demo is not None:
                mode_keys, prior = demo
            else:  # uniform prior over the valid balanced color orders
                mode_keys, prior = sorting_uniform_prior(self.num_boxes)
        return {k: float(v) for k, v in metrics.sorting_score(
            jnp.asarray(succ, jnp.float32).reshape(C, T),
            jnp.asarray(modes).reshape(C, T), mode_keys, prior).items()}


@dataclass
class StackingSim:
    """Default workload = 60 contexts x 18 trajs (scripts/stacking/*.sh) on
    the reference's shipped fixed contexts; KL priors default to the
    reference's demo-derived mode_prob.pkl (stacking_sim.py:47-63)."""
    seed: int = 0
    n_contexts: int = 60
    n_trajectories_per_context: int = 18
    max_steps: int = 400
    use_reference_contexts: bool = True

    def test_agent(self, agent, params=None, priors=None):
        from d3il_tpu.envs import stacking as env
        params = params or stacking_params(max_steps=self.max_steps)
        stepper = rollout.make_joint_stepper(
            params, env.reset, env.step, env.get_observation,
            env.robot_state, agent.policy_apply())
        ctxs = _fixed_or_sampled(ref_contexts.stacking_contexts,
                                 env.sample_context, self.n_contexts,
                                 self.use_reference_contexts)
        cidx, keys = _grid(self.n_contexts, self.n_trajectories_per_context,
                           self.seed)
        ctx_of = lambda ci: jax.tree_util.tree_map(lambda x: x[ci], ctxs)
        state = _run_episodes(stepper, agent, ctx_of, (cidx, keys),
                              params.max_steps, 20)
        succ, order, mlen = state.success, state.mode, state.mode_len
        s1, s2 = mlen > 0, mlen > 1
        C, T = self.n_contexts, self.n_trajectories_per_context
        if priors is None:
            priors = ref_contexts.stacking_mode_priors()
        if priors is None:  # no shipped prior file: uniform fallback
            p1 = np.full(3, 1 / 3)
            p2 = p3 = np.full(6, 1 / 6)
        else:
            p1, p2, p3 = priors
        return {k: float(v) for k, v in metrics.stacking_score(
            jnp.asarray(order).reshape(C, T, 3),
            jnp.asarray(mlen).reshape(C, T),
            jnp.asarray(succ, jnp.float32).reshape(C, T),
            jnp.asarray(s1, jnp.float32).reshape(C, T),
            jnp.asarray(s2, jnp.float32).reshape(C, T),
            p1, p2, p3).items()}


def sorting_uniform_prior(num_boxes: int):
    """All bit-packed encodings of balanced red/blue orders, uniform prior."""
    import itertools
    half = num_boxes // 2
    keys = sorted({
        sum(b << (7 - i) for i, b in enumerate(bits))
        for bits in itertools.permutations([0] * half + [1] * half)})
    keys = np.asarray(keys, np.int32)
    return keys, np.full(len(keys), 1.0 / len(keys), np.float32)


# --- cached default task params (scene assembly is host-side work) ---

_PARAMS_CACHE: dict = {}


def _cached(name, factory):
    if name not in _PARAMS_CACHE:
        _PARAMS_CACHE[name] = factory()
    return _PARAMS_CACHE[name]


def avoiding_params(**kw):
    from d3il_tpu.envs import avoiding
    key = ("avoiding", tuple(sorted(kw.items())))
    return _cached(key, lambda: avoiding.AvoidingParams(**kw))


def pushing_params(**kw):
    from d3il_tpu.envs import pushing
    key = ("pushing", tuple(sorted(kw.items())))
    return _cached(key, lambda: pushing.PushingParams(**kw))


def aligning_params(**kw):
    from d3il_tpu.envs import aligning
    key = ("aligning", tuple(sorted(kw.items())))
    return _cached(key, lambda: aligning.AligningParams(**kw))


def sorting_params(num_boxes: int, **kw):
    from d3il_tpu.envs import sorting
    key = ("sorting", num_boxes, tuple(sorted(kw.items())))
    return _cached(key, lambda: sorting.SortingParams(num_boxes, **kw))


def inserting_params(**kw):
    from d3il_tpu.envs import inserting
    key = ("inserting", tuple(sorted(kw.items())))
    return _cached(key, lambda: inserting.InsertingParams(**kw))


def stacking_params(**kw):
    from d3il_tpu.envs import stacking
    key = ("stacking", tuple(sorted(kw.items())))
    return _cached(key, lambda: stacking.StackingParams(**kw))
