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
checkpoint. Evaluation runs the FULL arm dynamics by default (the reference
always exercises them, gym_env_wrapper.py:83-93); pass --kinematic for the
fast kinematic-arm mode.
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

if os.environ.get("D3IL_RUN_CPU", "1") == "1" and "JAX_PLATFORMS" not in os.environ:
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
from d3il_tpu.utils import logging as run_logging  # noqa: E402


def agent_kwargs(name: str, window: int, hidden: int, layers: int,
                 chunk: int, ddpm_steps: int) -> dict:
    """Per-agent constructor kwargs from the generic hyperparameters (shared
    by training and checkpoint-restore so run_eval rebuilds identically)."""
    kw = dict(window_size=window)
    if name in ("bc", "cvae", "gmm", "ibc", "beso", "ddpm") or \
            name.endswith("_vision"):
        kw.update(hidden_dim=hidden, num_hidden_layers=layers)
    if name in ("act", "ddpm_encdec", "act_vision", "ddpm_encdec_vision"):
        kw["chunk"] = chunk   # keep window_size etc. (don't clobber kw)
        if window != 1:
            print(f"warning: --window {window} has no effect for {name} "
                  "(single-obs chunk policies)")
    if name in ("ddpm", "ddpm_encdec", "ddpm_vision", "ddpm_encdec_vision"):
        kw["n_timesteps"] = ddpm_steps
    if name in ("gpt_bc", "gpt_bc_vision"):
        kw["window_size"] = max(window, 5)
    return kw


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

    kw = agent_kwargs(args.agent, args.window, args.hidden, args.layers,
                      args.chunk, args.ddpm_steps)
    # per-(task, agent) tuned overrides (registry.TaskSpec.agent_kw — the
    # reference's configs/agents/*.yaml equivalents) trump the generic CLI
    # hyperparameters
    extra = dict(spec.agent_kw.get(args.agent, {}))
    kw.update(extra)
    args.agent_extra = extra
    if registry.AGENTS[args.agent].vision:
        from d3il_tpu.vision import taskviews
        kw["render_fn"] = taskviews.make_render_obs(args.task)
        kw["low_dim"] = taskviews.low_dim_size(args.task)
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


def make_args(**overrides) -> argparse.Namespace:
    """Programmatic entry: the CLI defaults as a Namespace, with per-task
    tuned settings (registry.TaskSpec.train_kw) and explicit overrides
    applied on top (the replacement for the reference's per-task
    configs/agents yamls)."""
    args = _parser().parse_args([])
    task = overrides.get("task", args.task)
    for k, v in registry.TASKS[task].train_kw.items():
        setattr(args, k, v)
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def run_one(args) -> dict:
    """Train + evaluate one (task, agent, seed); returns the metrics row."""
    key = jax.random.PRNGKey(args.seed)
    key, k1 = jax.random.split(key)
    spec, agent, ema, train_data, val_data = build_agent_and_data(args, k1)

    logger = run_logging.RunLogger(
        run_dir=args.log_dir, name=f"{args.task}_{args.agent}_s{args.seed}",
        enabled=args.log_dir is not None)
    cfg = agent_base.TrainConfig(epochs=args.epochs,
                                 batch_size=args.batch_size,
                                 window_size=args.window,
                                 eval_every_n_epochs=10, ema_decay=ema)
    t0 = time.time()
    best, final, hist = agent_base.fit(
        agent.loss_fn(), agent.params, train_data, val_data, cfg, key,
        log_every=10, callback=logger.epoch_callback,
        checkpoint_dir=args.resume_dir, checkpoint_every=args.ckpt_every)
    train_seconds = round(time.time() - t0, 1)
    print(f"training done in {train_seconds:.1f}s, "
          f"final loss {hist[-1]['train_loss']:.5f}")
    agent.params = best

    if args.ckpt:
        extra = {"meta": {
            "task": args.task, "agent": args.agent, "seed": args.seed,
            "window": args.window, "hidden": args.hidden,
            "layers": args.layers, "chunk": args.chunk,
            "ddpm_steps": args.ddpm_steps,
            "agent_extra": getattr(args, "agent_extra", {}),
            "scale_data": bool(agent.scaler.scale_data)},
            "scaler": {k: v for k, v in agent.scaler._asdict().items()
                       if k != "scale_data"}}
        if hasattr(agent, "centers"):
            extra["centers"] = agent.centers
        agent_base.save_checkpoint(args.ckpt, best, extra=extra)
        print("checkpoint saved:", args.ckpt)

    result = {}
    if not args.skip_eval:
        result = evaluate(spec, agent, args)
    row = {"task": args.task, "agent": args.agent, "seed": args.seed,
           "eval_mode": "kinematic" if args.kinematic else "dynamic",
           "data": args.data,
           "date": time.strftime("%Y-%m-%d", time.gmtime()),
           "train_seconds": train_seconds,
           "final_train_loss": round(float(hist[-1]["train_loss"]), 6),
           **result}
    logger.log({"event": "result", **row})
    logger.close()
    return row


def _parser():
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
    ap.add_argument("--kinematic", action="store_true", default=False,
                    help="fast kinematic-arm eval (default: full dynamics)")
    ap.add_argument("--no-kinematic", dest="kinematic", action="store_false")
    ap.add_argument("--ddpm-steps", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--log-dir", default=None,
                    help="JSONL run-metric stream directory (wandb equivalent)")
    ap.add_argument("--resume-dir", default=None,
                    help="mid-run checkpoint dir: resumes full train state")
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="epochs between mid-run checkpoints (0: off)")
    ap.add_argument("--skip-eval", action="store_true")
    return ap


def main():
    ap = _parser()
    args = ap.parse_args()
    # apply the task's tuned defaults for any arg the user did not pass on
    # the command line (checked against sys.argv, not default-equality, so an
    # explicit `--window 1` can force the parser default over train_kw)
    passed = {a.split("=", 1)[0] for a in sys.argv[1:] if a.startswith("--")}
    for k, v in registry.TASKS[args.task].train_kw.items():
        if "--" + k.replace("_", "-") not in passed:
            setattr(args, k, v)
    print(json.dumps(run_one(args)))


if __name__ == "__main__":
    main()
