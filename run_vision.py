"""Vision training with rollout-based model selection (reference run_vision.py).

  python run_vision.py --task sorting_2 --agent bc_vision --epochs 30

Mirrors run_vision.py:54-81: train epochs, and every `--eval-every` epochs
run a (reduced-workload) rollout evaluation with the CURRENT params, keeping
the checkpoint with the best success rate — model selection on rollout
success, not validation MSE. The final full-workload evaluation uses the
best-selected params.

The vision agents render both cameras on device from the state observation
(vision/taskviews.py), so training consumes the ordinary state datasets and
evaluation runs the ordinary batched sims — the images exist only inside the
jitted computation.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("D3IL_TPU_CACHE", "/tmp/d3il_tpu_jax_cache"))

from d3il_tpu import registry  # noqa: E402
from d3il_tpu.agents import base as agent_base  # noqa: E402
import run_train  # noqa: E402


def main():
    ap = run_train._parser()
    ap.add_argument("--eval-every", type=int, default=10,
                    help="epochs between rollout-based selection evals")
    ap.add_argument("--select-contexts", type=int, default=10)
    ap.add_argument("--select-trajs", type=int, default=2)
    args = ap.parse_args()
    assert registry.AGENTS[args.agent].vision, \
        f"--agent {args.agent} is not a vision agent"
    for k, v in registry.TASKS[args.task].train_kw.items():
        if getattr(args, k) == ap.get_default(k):
            setattr(args, k, v)

    key = jax.random.PRNGKey(args.seed)
    key, k1 = jax.random.split(key)
    spec, agent, ema, train_data, val_data = \
        run_train.build_agent_and_data(args, k1)

    sel_args = argparse.Namespace(
        kinematic=args.kinematic, eval_max_steps=args.eval_max_steps,
        seed=args.seed, n_contexts=args.select_contexts,
        n_trajs=args.select_trajs)
    best = {"success": -1.0, "params": agent.params, "epoch": -1}

    def select(epoch, params, rec):
        if (epoch + 1) % args.eval_every != 0:
            return
        agent.params = params
        out = run_train.evaluate(spec, agent, sel_args)
        sr = out.get("success_rate", 0.0)
        print(f"[select] epoch {epoch+1}: success {sr:.3f} "
              f"(best {best['success']:.3f} @ {best['epoch']+1})")
        if sr > best["success"]:
            best.update(success=sr, params=params, epoch=epoch)

    cfg = agent_base.TrainConfig(epochs=args.epochs,
                                 batch_size=args.batch_size,
                                 window_size=args.window,
                                 eval_every_n_epochs=10, ema_decay=ema)
    t0 = time.time()
    _, final, hist = agent_base.fit(agent.loss_fn(), agent.params,
                                    train_data, val_data, cfg, key,
                                    log_every=5, callback=select)
    train_seconds = round(time.time() - t0, 1)
    agent.params = best["params"] if best["epoch"] >= 0 else final

    if args.ckpt:
        agent_base.save_checkpoint(args.ckpt, agent.params)
    result = {} if args.skip_eval else run_train.evaluate(spec, agent, args)
    print(json.dumps({"task": args.task, "agent": args.agent,
                      "seed": args.seed, "train_seconds": train_seconds,
                      "selected_epoch": best["epoch"] + 1, **result}))


if __name__ == "__main__":
    main()
