"""Per-stage timing of the Pushing hot path on the current JAX backend.

Times (batched, jitted, steady-state) each stage of one 1 ms substep plus the
full env step, to attribute the env-steps/s number in bench.py. Run on TPU:

    python tools/profile_step.py [BATCH]

Stages:
  fk            chain FK of the 13-body scene robot
  massbias      mass matrix + bias forces (scene robot)
  cart_ik       one cartesian controller step (3 DLS-IK iterations)
  pd_ff         joint PD + model feedforward torque
  engine        one full physics substep (contacts + solver + integrate)
  substep       one control substep (cart_ik + pd_ff + gravity comp + engine)
  env_step      full pushing env step (35 substeps + predicates)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu.envs import pushing, common
from d3il_tpu.control import cartesian, joint_pd, gripper
from d3il_tpu.robot import chain as chain_mod


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:12s} {dt * 1e3:10.3f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"backend={jax.default_backend()} batch={batch}")
    params = pushing.PushingParams()
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.jit(jax.vmap(
        lambda k: pushing.reset(params, pushing.sample_context(k))))(keys)
    jax.block_until_ready(states.scene.q)
    sc, cs = states.scene, states.ctrl

    robot = params.scene.robot
    des_pos = jnp.tile(jnp.array([0.4, 0.0, 0.12], jnp.float32), (batch, 1))
    des_quat = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32), (batch, 1))

    fk_fn = jax.jit(jax.vmap(lambda q: chain_mod.fk(robot, q)))
    timeit("fk", fk_fn, sc.q)

    mb_fn = jax.jit(jax.vmap(lambda q, qd: (
        chain_mod.mass_matrix(robot, q),
        chain_mod.bias_forces(robot, q, qd, params.scene.gravity))))
    timeit("massbias", mb_fn, sc.q, sc.qd)

    cart_fn = jax.jit(jax.vmap(lambda c, p, q: cartesian.step(
        params.ctrl_chain, params.cart_gains, c, p, q, params.dt)))
    timeit("cart_ik", cart_fn, cs, des_pos, des_quat)

    z7 = jnp.zeros((batch, 7), jnp.float32)
    pd_fn = jax.jit(jax.vmap(lambda qd_, q, qdot: joint_pd.feedforward_torque(
        params.ctrl_chain, params.pd_gains, qd_, z7[0], z7[0], q, qdot)))
    timeit("pd_ff", pd_fn, sc.q[:, :7], sc.q[:, :7], sc.qd[:, :7])

    ctrl = jnp.zeros((batch, 9), jnp.float32)
    eng_fn = jax.jit(jax.vmap(params._engine_step))
    timeit("engine", eng_fn, sc, ctrl)

    sub_fn = jax.jit(jax.vmap(lambda s, c, p, q: common.control_substep(
        params, (s, c, p, q), None)[0]))
    timeit("substep", sub_fn, sc, cs, des_pos, des_quat)

    actions = jnp.concatenate([des_pos, des_quat], axis=1)
    step_fn = jax.jit(jax.vmap(lambda s, a: pushing.step(params, s, a)[0]))
    t = timeit("env_step", step_fn, states, actions)
    print(f"env-steps/s at batch {batch}: {batch / t:.0f}")


if __name__ == "__main__":
    main()
