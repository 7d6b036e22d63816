"""Benchmark: batched Pushing rollout throughput (env-steps/s per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 100,000 aggregate env-steps/s on one host
(BASELINE.md); the reference itself runs ~28.6 policy-Hz per CPU process.

Each env step = 35 physics substeps with the full control pipeline
(DLS-IK impedance + PD feedforward + gripper + gravity comp + contacts).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu.envs import pushing  # noqa: E402

BASELINE_ENV_STEPS_PER_S = 100_000.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))

    params = pushing.PushingParams()
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    @jax.jit
    def reset_batch(keys):
        return jax.vmap(lambda k: pushing.reset(params, pushing.sample_context(k)))(keys)

    @jax.jit
    def run(states, actions):
        def one(state, action):
            return pushing.step(params, state, action)

        def body(states, _):
            states, res = jax.vmap(one)(states, actions)
            return states, res.done

        states, dones = jax.lax.scan(body, states, None, length=n_steps)
        return states, dones

    states = reset_batch(keys)
    jax.block_until_ready(states.scene.q)

    # fixed hold actions (throughput measurement; physics+controller dominate)
    tcp = jax.vmap(lambda s: params.tcp_pose(s)[0])(states.scene)
    actions = jnp.concatenate(
        [tcp[:, :2], jnp.full((batch, 1), 0.12),
         jnp.tile(jnp.array([[0.0, 1.0, 0.0, 0.0]]), (batch, 1))], axis=1)

    # warmup/compile
    out, _ = run(states, actions)
    jax.block_until_ready(out.scene.q)

    t0 = time.perf_counter()
    out, _ = run(states, actions)
    jax.block_until_ready(out.scene.q)
    dt = time.perf_counter() - t0

    env_steps_per_s = batch * n_steps / dt
    print(json.dumps({
        "metric": "pushing_env_steps_per_s",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / BASELINE_ENV_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
