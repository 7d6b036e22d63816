"""Evaluate a trained checkpoint without retraining (reference run_sim.py).

  python run_eval.py --ckpt ckpts/pushing_bc --n-contexts 30 --n-trajs 16

Loads the orbax checkpoint written by run_train.py --ckpt (params + scaler
statistics + agent hyperparameters + BeT k-means centers), rebuilds the
agent, and runs the batched on-device evaluation sim
(reference run_sim.py:22-47: instantiate agent -> load weights ->
env_sim.test_agent).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("D3IL_RUN_CPU", "1") == "1" and "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu import registry  # noqa: E402
from d3il_tpu.agents import base as agent_base  # noqa: E402
from d3il_tpu.data.scaler import Scaler  # noqa: E402
import run_train  # noqa: E402


def load_agent(ckpt_path: str):
    """Rebuild the trained agent from a run_train.py checkpoint."""
    ck = agent_base.load_checkpoint(ckpt_path)
    meta = ck["meta"]
    sc = {k: jnp.asarray(v) for k, v in ck["scaler"].items()}
    scaler = Scaler(scale_data=bool(meta["scale_data"]), **sc)
    spec = registry.TASKS[meta["task"]]
    kw = run_train.agent_kwargs(meta["agent"], int(meta["window"]),
                                int(meta["hidden"]), int(meta["layers"]),
                                int(meta["chunk"]), int(meta["ddpm_steps"]))
    # per-(task, agent) constructor overrides recorded at train time
    # (registry.TaskSpec.agent_kw) — required to rebuild e.g. a
    # gpt-backbone BESO identically
    kw.update(meta.get("agent_extra", {}))
    if registry.AGENTS[meta["agent"]].vision:
        from d3il_tpu.vision import taskviews
        kw["render_fn"] = taskviews.make_render_obs(meta["task"])
        kw["low_dim"] = taskviews.low_dim_size(meta["task"])
    centers = jnp.asarray(ck["centers"]) if "centers" in ck else None
    agent, _ = registry.make_agent(meta["agent"], jax.random.PRNGKey(0),
                                   spec.obs_dim, spec.act_dim, scaler,
                                   centers, **kw)
    agent.params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
    if centers is not None and hasattr(agent, "centers"):
        # Restore the stored centers verbatim: re-fitting k-means over the
        # stored centers returns the same *set* but in a permuted *order*
        # (kmeans_fit seeds with a random permutation), which would misalign
        # the trained logits/offsets heads with their bins.
        agent.centers = centers
    return spec, agent, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n-contexts", type=int, default=None)
    ap.add_argument("--n-trajs", type=int, default=None)
    ap.add_argument("--eval-max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kinematic", action="store_true", default=False)
    args = ap.parse_args()

    spec, agent, meta = load_agent(args.ckpt)
    tk = spec.train_kw
    eargs = argparse.Namespace(
        kinematic=args.kinematic, eval_max_steps=args.eval_max_steps,
        seed=args.seed,
        n_contexts=args.n_contexts or tk.get("n_contexts", 15),
        n_trajs=args.n_trajs or tk.get("n_trajs", 8))
    t0 = time.time()
    out = run_train.evaluate(spec, agent, eargs)
    out["eval_seconds"] = round(time.time() - t0, 1)
    print(json.dumps({"task": meta["task"], "agent": meta["agent"],
                      "seed": int(meta["seed"]), **out}))


if __name__ == "__main__":
    main()
