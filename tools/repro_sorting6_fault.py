"""Reproduce the sorting_6 eval TPU fault and bisect kernel on/off.

  python tools/repro_sorting6_fault.py --kernel 1   # default round-5 path
  python tools/repro_sorting6_fault.py --kernel 0   # jnp fallback stages
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")

from d3il_tpu.envs import sorting                    # noqa: E402
from d3il_tpu.engine import substep_bm               # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", type=int, default=1)
    ap.add_argument("--bm", type=int, default=1,
                    help="0: disable the whole batch-minor pipeline "
                    "(pure vmap fallback)")
    ap.add_argument("--batch", type=int, default=480)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk-steps", type=int, default=200)
    args = ap.parse_args()

    substep_bm.set_dyn_kernel(bool(args.kernel) or None
                              if args.kernel else False)
    if not args.bm:
        substep_bm.supported = lambda p: False
    params = sorting.SortingParams(6, kinematic=True)
    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    ctxs = jax.vmap(lambda k: sorting.sample_context(k, 6))(keys)
    states = jax.jit(jax.vmap(lambda c: sorting.reset(params, c)))(ctxs)
    jax.block_until_ready(states.scene.q)
    print("reset ok")

    action = jnp.tile(jnp.array([0.5, 0.1, 0.25, 0, 1, 0, 0], jnp.float32),
                      (args.batch, 1))

    @jax.jit
    def run_chunk(states):
        def body(s, _):
            s, res = jax.vmap(lambda st, a: sorting.step(params, st, a))(
                s, action)
            return s, res.done
        return jax.lax.scan(body, states, None, length=args.chunk_steps)

    for c in range(args.chunks):
        t0 = time.time()
        states, dones = run_chunk(states)
        jax.block_until_ready(states.scene.q)
        print(f"chunk {c}: {time.time()-t0:.1f}s  "
              f"q finite {bool(jnp.isfinite(states.scene.q).all())}")
    print("OK kernel=%d" % args.kernel)


if __name__ == "__main__":
    main()
