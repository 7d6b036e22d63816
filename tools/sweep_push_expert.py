"""Sweep dynamic pushing-expert pacing params (depth, leads) on device.

  python tools/sweep_push_expert.py --n 8
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")

from d3il_tpu.envs import pushing, scenes            # noqa: E402
from d3il_tpu.data import experts_jax as ex          # noqa: E402


def run_cfg(params, n, seed, depth, pstep, plead, astep, alead, **strike_kw):
    t1 = scenes.PUSHING_TARGET_1[:2]
    t2 = scenes.PUSHING_TARGET_2[:2]
    seq_box_tab = np.array([[0, 1], [1, 0], [0, 1], [1, 0]], np.int32)
    seq_tgt_tab = np.array([[t1, t2], [t2, t1], [t2, t1], [t1, t2]],
                           np.float32)
    modes = np.arange(n) % 4
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    ctxs = jax.vmap(pushing.sample_context)(keys)

    def init(ctx, key):
        state = pushing.reset(params, ctx)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = ex.init_push_expert_state()
        return ex.EpCarry(state, es0, tcp0[:2], jnp.array(False), key), \
            tcp0[2:3]

    def step_once(cw):
        carry, (seq_box, seq_tgt, fixed_z) = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        boxes = state.scene.free_pos[:, :2]
        es2, delta = ex.pushing_expert_step(
            es, des, tcp[:2], boxes, seq_box, seq_tgt, push_depth=depth,
            push_step=pstep, lead=plead, app_step=astep, app_lead=alead,
            **strike_kw)
        noise = jax.random.normal(kn, des.shape) * ex.DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (jnp.concatenate([des2, fixed_z]), tcp)
        action = jnp.concatenate([des2, fixed_z,
                                  jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = pushing.step(params, state, action)
        state2 = ex._freeze_env(done, ns, state)
        es2 = ex._freeze_env(done, es2, es)
        return (ex.EpCarry(state2, es2, des2, done | res.done, key),
                (seq_box, seq_tgt, fixed_z)), log, res.done

    init_v = jax.jit(jax.vmap(init))
    chunk_v = jax.jit(jax.vmap(ex._chunk_fn(step_once, ex.CHUNK)))
    ikeys = jax.random.split(jax.random.PRNGKey(seed + 1000), n)
    carry0, fixed_z = init_v(ctxs, ikeys)
    cw = (carry0, (seq_box_tab[modes], seq_tgt_tab[modes], fixed_z))
    cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
    state = cw[0].env
    es = cw[0].es
    b = np.asarray(state.scene.free_pos[..., :2])
    t1 = np.asarray(scenes.PUSHING_TARGET_1[:2])
    t2 = np.asarray(scenes.PUSHING_TARGET_2[:2])
    d1 = np.linalg.norm(b[:, 0] - t1, axis=-1)
    d2 = np.linalg.norm(b[:, 1] - t2, axis=-1)
    d1x = np.linalg.norm(b[:, 0] - t2, axis=-1)
    d2x = np.linalg.norm(b[:, 1] - t1, axis=-1)
    print("  stage:", np.asarray(es.stage), "phase:", np.asarray(es.phase))
    print("  d(b0,t1):", d1.round(2), " d(b1,t2):", d2.round(2))
    print("  d(b0,t2):", d1x.round(2), " d(b1,t1):", d2x.round(2))
    succ = np.asarray(state.success)
    dn = np.asarray(dones)
    done_t = np.where(dn.any(1), dn.argmax(1), params.max_steps) \
        if dn.ndim == 2 else np.where(dn.any(0), dn.argmax(0), params.max_steps)
    return succ, done_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", type=int, default=0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    params = pushing.PushingParams(kinematic=False)
    cfgs = [
        (0.020, 0.011, 0.05, 0.011, 0.11,
         dict(strike_depth=-0.06, strike_lead=0.09, strike_radius=0.058,
              near_r=0.045, block_r=0.095, detour_r=0.13)),
        (0.020, 0.011, 0.05, 0.011, 0.11,
         dict(strike_depth=-0.06, strike_lead=0.12, strike_radius=0.058,
              near_r=0.045, block_r=0.095, detour_r=0.13)),
        (0.020, 0.011, 0.05, 0.011, 0.11,
         dict(strike_depth=-0.06, strike_lead=0.15, strike_radius=0.058,
              near_r=0.045, block_r=0.095, detour_r=0.13)),
    ]
    for depth, pstep, plead, astep, alead, skw in cfgs:
        succ, done_t = run_cfg(params, args.n, args.seed, depth, pstep,
                               plead, astep, alead, **skw)
        print(f"depth {depth:.3f} plead {plead} strike {skw}: "
              f"success {succ.mean():.2f} done_t {np.sort(done_t)}")


if __name__ == "__main__":
    main()
