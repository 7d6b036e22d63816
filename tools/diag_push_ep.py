"""Per-step trace of one dynamic pushing episode: reconstructs the expert's
approach/push geometry (along, perp, approach-distance) offline from the
logged tcp/box trajectories to find where the approach/push cycle sticks.

  python tools/diag_push_ep.py --ep 2 --n 8
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")

from d3il_tpu.envs import pushing, scenes            # noqa: E402
from d3il_tpu.data import experts_jax as ex          # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--ep", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--every", type=int, default=10)
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
    cw, logs, dones = ex.run_chunked(chunk_v, cw, params.max_steps)
    des, tcp, fpos, fquat = (np.asarray(x) for x in logs)

    i = args.ep
    m = modes[i]
    sb, st_ = seq_box_tab[m], seq_tgt_tab[m]
    print(f"episode {i} mode {m} seq_box {sb.tolist()}")
    # assume stage 0 throughout (the stuck case)
    b0 = sb[0]
    tgt = st_[0]
    T = des.shape[1]
    for t in range(0, T, args.every):
        bp = fpos[i, t, b0, :2]
        u = (tgt - bp) / (np.linalg.norm(tgt - bp) + 1e-9)
        ap_ = bp - u * ex.PUSH_APPROACH
        rel = tcp[i, t, :2] - bp
        along = float(rel @ u)
        perp = float(np.linalg.norm(rel - along * u))
        print(f"t={t:3d} tcp {tcp[i, t, :2].round(3)} des {des[i, t, :2].round(3)} "
              f"box {bp.round(3)} d_tgt {np.linalg.norm(tgt - bp):.3f} "
              f"d_app {np.linalg.norm(ap_ - tcp[i, t, :2]):.3f} "
              f"along {along:+.3f} perp {perp:.3f}")


if __name__ == "__main__":
    main()
