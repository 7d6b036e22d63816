"""Scan-amortized per-stage timing of the Pushing hot path.

Per-call dispatch over the axon TPU tunnel costs ~9 ms, swamping any
single-op timing (tools/profile_step.py measures a flat ~9 ms for every
stage). Here each stage runs K times inside ONE jitted lax.scan, so the
measured time is K * stage + dispatch and the per-iteration cost is
(t_K - t_0) / K, independent of the tunnel latency.

    python tools/profile_scan.py [BATCH] [K]
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
from d3il_tpu.control import cartesian, joint_pd
from d3il_tpu.engine import step as estep
from d3il_tpu.robot import chain as chain_mod


def scan_time(name, body, carry, k, reps=3):
    """body: carry -> carry. Returns per-iteration ms via lax.scan length k."""
    def run(c, length):
        return jax.lax.scan(lambda cc, _: (body(cc), None), c, None,
                            length=length)[0]

    f = jax.jit(run, static_argnums=1)
    out = f(carry, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(carry, k)
    jax.block_until_ready(out)
    t_k = (time.perf_counter() - t0) / reps
    per = t_k / k
    print(f"{name:16s} {per * 1e3:9.3f} ms/iter   ({t_k * 1e3:8.1f} ms for {k})")
    return per


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(f"backend={jax.default_backend()} batch={batch} k={k}")
    params = pushing.PushingParams()
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.jit(jax.vmap(
        lambda kk: pushing.reset(params, pushing.sample_context(kk))))(keys)
    jax.block_until_ready(states.scene.q)
    sc, cs = states.scene, states.ctrl

    robot = params.scene.robot
    scene = params.scene
    des_pos = jnp.tile(jnp.array([0.4, 0.0, 0.12], jnp.float32), (batch, 1))
    des_quat = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32), (batch, 1))

    # fk: q -> q (fold output back into carry to serialize iterations)
    def fk_body(q):
        xpos, xquat = jax.vmap(lambda qq: chain_mod.fk(robot, qq))(q)
        return q + 1e-20 * xpos[:, -1, :1] * 0  # keep dependency without drift
    scan_time("fk", lambda q: q + 0 * jax.vmap(
        lambda qq: chain_mod.fk(robot, qq))(q)[0][:, -1, :9 if robot.nv == 9 else 1].sum(-1, keepdims=True),
        sc.q, k)

    def dyn_body(q):
        fkc, M, bias = jax.vmap(
            lambda qq: chain_mod.dynamics(robot, qq, qq * 0, scene.gravity))(q)
        return q + 0 * bias[:, :q.shape[1]]
    scan_time("dynamics", dyn_body, sc.q, k)

    def ik_body(carry):
        c = carry
        c, q_des, qd_des, qdd_des = jax.vmap(
            lambda ci: cartesian.step(params.ctrl_chain, params.cart_gains,
                                      ci, des_pos[0], des_quat[0], params.dt))(c)
        return c
    scan_time("cart_ik", ik_body, cs, k)

    def ff_body(q):
        tau = jax.vmap(lambda a: joint_pd.model_feedforward(
            params.ctrl_chain, a[:7], a[:7] * 0, a[:7] * 0))(q)
        return q + 0 * jnp.pad(tau, ((0, 0), (0, q.shape[1] - 7)))
    scan_time("pd_ff", ff_body, sc.q, k)

    # narrow phase + contact rows (needs fk cache; reuse fixed one)
    fk_cache = jax.jit(jax.vmap(lambda q: chain_mod.fk(robot, q)))(sc.q)

    def np_body(s):
        con = jax.vmap(lambda si, xp, xq: estep._contact_rows(
            scene, si, (xp, xq))[0])(s, fk_cache[0], fk_cache[1])
        return s._replace(q=s.q + 0 * con.depth[:, :1])
    scan_time("narrowphase", np_body, sc, k)

    # full engine substep at configured solver iters, and at 1 iter
    ctrl = jnp.zeros((batch, 9), jnp.float32)

    def eng_body(s):
        return jax.vmap(lambda si: params._engine_step(si, ctrl[0]))(s)
    scan_time(f"engine(it={scene.solver_iters})", eng_body, sc, k)

    import dataclasses
    try:
        scene1 = dataclasses.replace(scene, solver_iters=1)
    except TypeError:
        scene1 = scene._replace(solver_iters=1)
    step1 = estep.make_step_fn(scene1)

    def eng1_body(s):
        return jax.vmap(lambda si: step1(si, ctrl[0]))(s)
    scan_time("engine(it=1)", eng1_body, sc, k)

    # full control substep
    def sub_body(carry):
        s, c = carry
        (s, c, _, _), _ = jax.vmap(lambda si, ci: common.control_substep(
            params, (si, ci, des_pos[0], des_quat[0]), None))(s, c)
        return (s, c)
    scan_time("ctl_substep", sub_body, (sc, cs), k)

    # full env step (scan over k env steps)
    actions = jnp.concatenate([des_pos, des_quat], axis=1)

    def env_body(s):
        s, _ = jax.vmap(lambda si, a: pushing.step(params, si, a))(s, actions)
        return s
    per = scan_time("env_step", env_body, states, max(k // 8, 4))
    print(f"env-steps/s at batch {batch}: {batch / per:.0f}")


if __name__ == "__main__":
    main()
