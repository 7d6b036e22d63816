"""Train + evaluate an agent on a task (the reference run.py equivalent).

  python run_train.py --task avoiding --agent bc --epochs 60 --n-trajs 48
  python run_train.py --task pushing --agent ddpm --epochs 100

Any registered task x agent combination works (d3il_tpu/registry.py):
tasks avoiding | pushing | aligning | sorting_2/4/6 | stacking | inserting,
agents bc | cvae | gmm | ibc | gpt_bc | bet | bet_mlp | act | ddpm |
ddpm_encdec | beso.

Pipeline: load demonstration pickles -> padded device tensors -> Scaler ->
jitted epoch training -> batched on-device rollout evaluation (all episodes
in lockstep under vmap, replacing the reference's process-per-env harness,
simulation/pushing_sim.py:93-138) -> success/entropy metrics + orbax
checkpoint.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

if os.environ.get("D3IL_RUN_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu import registry  # noqa: E402
from d3il_tpu.agents import base as agent_base  # noqa: E402
from d3il_tpu.data import dataset as ds  # noqa: E402
from d3il_tpu.data.scaler import Scaler  # noqa: E402


def build_agent_and_data(args, key):
    """Load the task dataset, fit the Scaler, construct the agent, and
    (re)window the training tensors to the agent's training window."""
    spec = registry.TASKS[args.task]
    task_dir = os.path.join(args.data, args.task)
    with open(os.path.join(task_dir, "train_files.pkl"), "rb") as f:
        train_files = pickle.load(f)
    with open(os.path.join(task_dir, "eval_files.pkl"), "rb") as f:
        eval_files = pickle.load(f)
    all_dir = os.path.join(task_dir, "all_data")
    max_len = args.max_len or spec.max_steps
    train_data = ds.load_task_dataset(all_dir, train_files, spec.assemble,
                                      max_len, args.window)
    val_data = ds.load_task_dataset(all_dir, eval_files, spec.assemble,
                                    max_len, args.window)
    x, y = ds.all_valid(train_data)
    scaler = Scaler.fit(x, y)
    obs_dim, act_dim = x.shape[-1], y.shape[-1]
    assert obs_dim == spec.obs_dim and act_dim == spec.act_dim, (
        f"dataset dims ({obs_dim},{act_dim}) != spec ({spec.obs_dim},{spec.act_dim})")
    print(f"dataset: {len(train_files)} train eps, {train_data.n_windows} "
          f"windows, obs {obs_dim} act {act_dim}")

    kw = dict(window_size=args.window)
    if args.agent in ("bc", "cvae", "gmm", "ibc", "beso", "ddpm"):
        kw.update(hidden_dim=args.hidden, num_hidden_layers=args.layers)
    if args.agent in ("act", "ddpm_encdec"):
        kw = dict(chunk=args.chunk)
    if args.agent in ("ddpm", "ddpm_encdec"):
        kw["n_timesteps"] = args.ddpm_steps
    if args.agent == "gpt_bc":
        kw["window_size"] = max(args.window, 5)
    acts_scaled = None
    if registry.AGENTS[args.agent].needs_actions:
        acts_scaled = np.asarray(scaler.scale_output(jnp.asarray(y)))
    agent, ema = registry.make_agent(args.agent, key, obs_dim, act_dim,
                                     scaler, acts_scaled, **kw)

    # chunked/windowed agents train on wider windows: rebuild index tables
    want_window = getattr(agent, "train_window", None) or agent.window_size
    if want_window != args.window:
        args.window = want_window
        train_data = ds.rewindow(train_data, args.window)
        val_data = ds.rewindow(val_data, args.window)
    return spec, agent, ema, train_data, val_data


def evaluate(spec, agent, args):
    params = spec.make_params(kinematic=args.kinematic,
                              max_steps=args.eval_max_steps or spec.max_steps)
    if spec.name == "avoiding":
        sim = spec.make_sim(seed=args.seed,
                            n_trajectories=args.n_trajs)
    else:
        sim = spec.make_sim(seed=args.seed, n_contexts=args.n_contexts,
                            n_trajectories_per_context=args.n_trajs)
    t0 = time.time()
    out = sim.test_agent(agent, params=params)
    out["eval_seconds"] = round(time.time() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="avoiding", choices=sorted(registry.TASKS))
    ap.add_argument("--agent", default="bc", choices=sorted(registry.AGENTS))
    ap.add_argument("--data", default="data")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=None,
                    help="pad length for the demo tensors (default: task max)")
    ap.add_argument("--n-contexts", type=int, default=15)
    ap.add_argument("--n-trajs", type=int, default=4,
                    help="trajectories per context (avoiding: total)")
    ap.add_argument("--eval-max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kinematic", action="store_true", default=True,
                    help="kinematic-arm eval (fast); --no-kinematic for full dynamics")
    ap.add_argument("--no-kinematic", dest="kinematic", action="store_false")
    ap.add_argument("--ddpm-steps", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(args.seed)
    key, k1 = jax.random.split(key)
    spec, agent, ema, train_data, val_data = build_agent_and_data(args, k1)

    cfg = agent_base.TrainConfig(epochs=args.epochs,
                                 batch_size=args.batch_size,
                                 window_size=args.window,
                                 eval_every_n_epochs=10, ema_decay=ema)
    t0 = time.time()
    best, final, hist = agent_base.fit(agent.loss_fn(), agent.params,
                                       train_data, val_data, cfg, key,
                                       log_every=10)
    print(f"training done in {time.time()-t0:.1f}s, "
          f"final loss {hist[-1]['train_loss']:.5f}")
    agent.params = best

    if args.ckpt:
        agent_base.save_checkpoint(args.ckpt, best)
        print("checkpoint saved:", args.ckpt)

    result = {}
    if not args.skip_eval:
        result = evaluate(spec, agent, args)
    print(json.dumps({"task": args.task, "agent": args.agent, **result}))


if __name__ == "__main__":
    main()
