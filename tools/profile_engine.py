"""Bisect the engine substep cost on the live backend.

Times, at a given batch size, jitted+vmapped variants of the pushing engine
step with stages progressively enabled, so each stage's marginal cost is the
difference between consecutive rows. Run: python tools/profile_engine.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu.envs import pushing
from d3il_tpu.engine import step as step_mod
from d3il_tpu.engine import collision, solver as solver_mod
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.ops import quat as quat_ops
import numpy as np


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:10.3f} ms")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"backend={jax.default_backend()} batch={batch}")
    params = pushing.PushingParams()
    scene = params.scene
    robot = scene.robot
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.jit(jax.vmap(
        lambda k: pushing.reset(params, pushing.sample_context(k))))(keys)
    sc = states.scene
    jax.block_until_ready(sc.q)
    ncon = sc.warm.shape[1]
    nv = robot.nv + 6 * scene.n_free
    print(f"ncon={ncon} nv={nv} pairs={len(scene.pairs)}")
    ctrl = jnp.zeros((batch, robot.nv), jnp.float32)

    # stage 1: dynamics only
    dyn_fn = jax.jit(jax.vmap(
        lambda q, qd: chain_mod.dynamics(robot, q, qd, scene.gravity)))
    t_dyn = timeit("dynamics(M,bias,fk)", dyn_fn, sc.q, sc.qd)

    # stage 2: + collision narrow phase
    def coll(q, st):
        fk_cache = chain_mod.fk(robot, q)
        contacts, _ = step_mod._contact_rows(scene, st, fk_cache)
        return contacts.depth, contacts.pos, contacts.normal
    coll_fn = jax.jit(jax.vmap(lambda q, st: coll(q, st)))
    t_coll = timeit("fk+narrowphase", coll_fn, sc.q, sc)

    # stage 3: full step with solver_iters swept
    import dataclasses
    for iters in (0, 5, 15, scene.solver_iters):
        sc2 = dataclasses.replace(scene, solver_iters=iters) \
            if dataclasses.is_dataclass(scene) else scene._replace(solver_iters=iters)
        fn = jax.jit(jax.vmap(step_mod.make_step_fn(sc2)))
        timeit(f"full step iters={iters}", fn, sc, ctrl)


if __name__ == "__main__":
    main()
