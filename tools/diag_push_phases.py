"""Phase/speed accounting for the dynamic pushing expert.

Rolls N dynamic pushing episodes and prints, per episode: steps spent in
approach (phase 0) vs push (phase 1), stall-reset count, mean box speed
while pushing, and final distances — answers whether the 400-step horizon
is lost to slow pushing or to approach/stall thrash.

  python tools/diag_push_phases.py --n 8
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    params = pushing.PushingParams(kinematic=False)
    t1 = scenes.PUSHING_TARGET_1[:2]
    t2 = scenes.PUSHING_TARGET_2[:2]
    seq_box_tab = np.array([[0, 1], [1, 0], [0, 1], [1, 0]], np.int32)
    seq_tgt_tab = np.array([[t1, t2], [t2, t1], [t2, t1], [t1, t2]],
                           np.float32)
    modes = np.arange(args.n) % 4
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.n)
    ctxs = jax.vmap(pushing.sample_context)(keys)

    init, chunk = ex.make_pushing_runner(params)
    init_v = jax.jit(jax.vmap(init))
    chunk_v = jax.jit(jax.vmap(chunk))
    ikeys = jax.random.split(jax.random.PRNGKey(args.seed + 1000), args.n)
    carry0, fixed_z = init_v(ctxs, ikeys)
    cw = (carry0, (seq_box_tab[modes], seq_tgt_tab[modes], fixed_z))

    # manual chunk loop that snapshots expert state every chunk
    n_chunks = -(-params.max_steps // ex.CHUNK)
    phases, stages, boxes_t = [], [], []
    logs = None
    for c in range(n_chunks):
        cw, log, dones = chunk_v(cw)
        es = cw[0].es
        phases.append(np.asarray(es.phase))
        stages.append(np.asarray(es.stage))
        boxes_t.append(np.asarray(cw[0].env.scene.free_pos[..., :2]))
    phases = np.stack(phases)          # [n_chunks, n]
    stages = np.stack(stages)
    boxes_t = np.stack(boxes_t)        # [n_chunks, n, 2, 2]
    state = cw[0].env
    succ = np.asarray(state.success)
    b = np.asarray(state.scene.free_pos[..., :2])
    for i in range(args.n):
        m = modes[i]
        sb, st_ = seq_box_tab[m], seq_tgt_tab[m]
        d0 = np.linalg.norm(b[i, sb[0]] - st_[0])
        d1 = np.linalg.norm(b[i, sb[1]] - st_[1])
        # box displacement between chunk snapshots (cm per chunk of
        # ex.CHUNK steps)
        disp = np.linalg.norm(np.diff(boxes_t[:, i], axis=0), axis=-1).sum(-1)
        print(f"ep {i} mode {m}: success {bool(succ[i])} "
              f"stage/chunk {stages[:, i].tolist()} "
              f"phase/chunk {phases[:, i].tolist()} "
              f"d_first {d0:.3f} d_second {d1:.3f} "
              f"box_disp_per_chunk_cm {(100 * disp).round(1).tolist()}")


if __name__ == "__main__":
    main()
