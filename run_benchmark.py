"""Multi-seed benchmark sweep driver (the reference scripts/*/*.sh).

  python run_benchmark.py --tasks avoiding pushing --agents bc ddpm \
      --seeds 0 1 2 --out results

Replaces the reference's 119 per-task shell scripts (e.g.
scripts/pushing/ddpm_benchmark.sh: hydra --multirun seed=0,...,5) with one
in-process sweep: every (task, agent, seed) row trains + evaluates via
run_train.run_one with the task's tuned defaults (registry.TaskSpec.train_kw)
and appends its metrics to <out>/results.jsonl. Seeds of the same
(task, agent) reuse the jit cache, so a 6-seed sweep costs ~1 compile +
6 runs. Already-recorded rows are skipped, making the sweep resumable.

tools/make_results.py renders the JSONL into RESULTS.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_train  # noqa: E402  (performs the backend env setup)
from d3il_tpu import registry  # noqa: E402


def _run_row(over: dict) -> dict:
    """One (task, agent, seed) row in a SUBPROCESS.

    A diverged policy or tunnel hiccup can hard-fault the TPU runtime, and a
    faulted device poisons every later jax call in the same process (one bad
    row used to turn the rest of the sweep into UNAVAILABLE error rows).
    Each row gets a fresh process; the row JSON is the last stdout line."""
    import subprocess
    cmd = [sys.executable, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "run_train.py")]
    for k, v in over.items():
        if isinstance(v, bool):
            if v:
                cmd.append(f"--{k.replace('_', '-')}")
        elif v is not None:
            cmd += [f"--{k.replace('_', '-')}", str(v)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"row subprocess failed (rc {proc.returncode}):\n"
            + (proc.stderr or "")[-800:])
    return json.loads(lines[-1])


def load_done(path):
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "error" in r:
                    continue  # failed rows are retried on the next sweep
                done.add((r.get("task"), r.get("agent"), r.get("seed")))
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="+", default=["avoiding"],
                    choices=sorted(registry.TASKS))
    ap.add_argument("--agents", nargs="+", default=["bc"],
                    choices=sorted(registry.AGENTS))
    ap.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    ap.add_argument("--out", default="results")
    ap.add_argument("--data", default="data")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the per-task tuned epoch count")
    ap.add_argument("--n-contexts", type=int, default=None,
                    help="override the per-task eval context count")
    ap.add_argument("--n-trajs", type=int, default=None,
                    help="override the per-task eval trajectories")
    ap.add_argument("--eval-max-steps", type=int, default=None,
                    help="cap the eval episode horizon")
    ap.add_argument("--kinematic", action="store_true", default=False)
    ap.add_argument("--rerun", action="store_true",
                    help="recompute rows already in results.jsonl")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "results.jsonl")
    done = set() if args.rerun else load_done(path)

    for task in args.tasks:
        if not os.path.exists(os.path.join(args.data, task, "train_files.pkl")):
            print(f"[skip] {task}: no dataset under {args.data}/{task} "
                  f"(run tools/gen_demos.py first)")
            continue
        for agent in args.agents:
            for seed in args.seeds:
                if (task, agent, seed) in done:
                    print(f"[done] {task} {agent} seed {seed}")
                    continue
                over = dict(task=task, agent=agent, seed=seed, data=args.data,
                            kinematic=args.kinematic, log_dir=args.out)
                if args.epochs is not None:
                    over["epochs"] = args.epochs
                if args.n_contexts is not None:
                    over["n_contexts"] = args.n_contexts
                if args.n_trajs is not None:
                    over["n_trajs"] = args.n_trajs
                if args.eval_max_steps is not None:
                    over["eval_max_steps"] = args.eval_max_steps
                t0 = time.time()
                print(f"[run ] {task} {agent} seed {seed}")
                try:
                    row = _run_row(over)
                except Exception:
                    traceback.print_exc()
                    row = {"task": task, "agent": agent, "seed": seed,
                           "error": traceback.format_exc(limit=1)[-400:]}
                row["wall_seconds"] = round(time.time() - t0, 1)
                with open(path, "a") as f:
                    f.write(json.dumps(row) + "\n")
                print(f"[row ] {json.dumps(row)}")


if __name__ == "__main__":
    main()
