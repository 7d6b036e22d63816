"""Dump expert rollout trajectories for debugging scripted experts.

  python tools/debug_expert.py --task pushing --n 2 --cpu 1 --out /tmp/dbg.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="pushing")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", type=int, default=1)
    ap.add_argument("--kinematic", type=int, default=1)
    ap.add_argument("--out", default="/tmp/dbg.npz")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")
    from d3il_tpu.data import experts_jax as ex

    n = args.n
    if args.task == "pushing":
        from d3il_tpu.envs import pushing, scenes
        params = pushing.PushingParams(kinematic=bool(args.kinematic))
        t1 = scenes.PUSHING_TARGET_1[:2]
        t2 = scenes.PUSHING_TARGET_2[:2]
        seq_box_tab = np.array([[0, 1], [1, 0], [0, 1], [1, 0]], np.int32)
        seq_tgt_tab = np.array([[t1, t2], [t2, t1], [t2, t1], [t1, t2]],
                               np.float32)
        modes = np.arange(n) % 4
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        ctxs = jax.vmap(pushing.sample_context)(keys)
        init, chunk = ex.make_pushing_runner(params)
        init_v = jax.jit(jax.vmap(init))
        chunk_v = jax.jit(jax.vmap(chunk))
        ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), n)
        carry0, fixed_z = init_v(ctxs, ikeys)
        cw = (carry0, (seq_box_tab[modes], seq_tgt_tab[modes], fixed_z))
        cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
        state = cw[0].env
        es = cw[0].es
        des, tcp, fpos, fquat = logs
        np.savez(args.out, des=des, tcp=tcp, fpos=fpos, fquat=fquat,
                 dones=dones, success=np.asarray(state.success),
                 mode=np.asarray(state.mode),
                 first_visit=np.asarray(state.first_visit),
                 stage=np.asarray(es.stage), phase=np.asarray(es.phase),
                 t1=t1, t2=t2, modes=modes)
    elif args.task == "inserting":
        import itertools
        from d3il_tpu.envs import inserting
        params = inserting.InsertingParams(kinematic=bool(args.kinematic),
                                           max_steps=1000)
        perms = np.array(list(itertools.permutations(range(3))), np.int32)
        orders = perms[np.arange(n) % 6]
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        ctxs = jax.vmap(inserting.sample_context)(keys)
        init, chunk = ex.make_inserting_runner(params)
        init_v = jax.jit(jax.vmap(init))
        chunk_v = jax.jit(jax.vmap(chunk))
        ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), n)
        carry0, fixed_z = init_v(ctxs, ikeys)
        cw = (carry0, (orders, fixed_z))
        cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
        state = cw[0].env
        es = cw[0].es
        des, tcp, fpos, fquat = logs
        np.savez(args.out, des=des, tcp=tcp, fpos=fpos, fquat=fquat,
                 dones=dones, success=np.asarray(state.success),
                 visited=np.asarray(state.visited),
                 order=np.asarray(state.order),
                 stage=np.asarray(es.stage), phase=np.asarray(es.phase),
                 wp=np.asarray(es.wp), orders=orders)
    elif args.task == "aligning":
        from d3il_tpu.envs import aligning
        params = aligning.AligningParams(kinematic=bool(args.kinematic))
        modes = (np.arange(n) % 2).astype(np.int32)
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        ctxs = jax.vmap(aligning.sample_context)(keys)
        init, chunk = ex.make_aligning_runner(params)
        init_v = jax.jit(jax.vmap(init))
        chunk_v = jax.jit(jax.vmap(chunk))
        ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), n)
        cw = (init_v(ctxs, ikeys), modes)
        cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
        state = cw[0].env
        es = cw[0].es
        des, tcp, fpos, fquat = logs
        np.savez(args.out, des=des, tcp=tcp, fpos=fpos, fquat=fquat,
                 dones=dones, success=np.asarray(state.success),
                 tgt_pos=np.asarray(state.target_pos),
                 tgt_quat=np.asarray(state.target_quat),
                 phase=np.asarray(es.phase), modes=modes)
    elif args.task.startswith("sorting"):
        nb = int(args.task.split("_")[1])
        from d3il_tpu.envs import sorting
        params = sorting.SortingParams(nb, kinematic=bool(args.kinematic))
        rng = np.random.default_rng(args.seed)
        orders = np.stack([rng.permutation(nb) for _ in range(n)]).astype(np.int32)
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        ctxs = jax.vmap(lambda k: sorting.sample_context(k, nb))(keys)
        init, chunk = ex.make_sorting_runner(params)
        init_v = jax.jit(jax.vmap(init))
        chunk_v = jax.jit(jax.vmap(chunk))
        ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), n)
        carry0, fixed_z = init_v(ctxs, ikeys)
        cw = (carry0, (orders, fixed_z))
        cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
        state = cw[0].env
        es = cw[0].es
        des, tcp, fpos, fquat = logs
        np.savez(args.out, des=des, tcp=tcp, fpos=fpos, fquat=fquat,
                 dones=dones, success=np.asarray(state.success),
                 stage=np.asarray(es.stage), phase=np.asarray(es.phase),
                 orders=orders)
    elif args.task == "stacking":
        import itertools
        from d3il_tpu.envs import stacking
        params = stacking.StackingParams(kinematic=True)
        perms = np.array(list(itertools.permutations(range(3))), np.int32)
        orders = perms[np.arange(n) % 6]
        keys = jax.random.split(jax.random.PRNGKey(args.seed), n)
        ctxs = jax.vmap(stacking.sample_context)(keys)
        init, chunk = ex.make_stacking_runner(params)
        init_v = jax.jit(jax.vmap(init))
        chunk_v = jax.jit(jax.vmap(chunk))
        ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), n)
        cw = (init_v(ctxs, ikeys), orders)
        cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
        state = cw[0].env
        es = cw[0].es
        des_q, width, fpos, fquat = logs
        np.savez(args.out, des_q=des_q, width=width, fpos=fpos, fquat=fquat,
                 dones=dones, success=np.asarray(state.success),
                 mode=np.asarray(state.mode),
                 mode_len=np.asarray(state.mode_len),
                 stage=np.asarray(es.stage), phase=np.asarray(es.phase),
                 orders=orders)
    print("saved", args.out)


if __name__ == "__main__":
    main()
