"""Generate synthetic demonstration datasets with scripted experts.

Writes per-episode pickles in the reference logger schema
(environments/dataset/*_dataset.py expectations) plus train/eval split and
test-context files, under data/<task>/.

Usage:
  python tools/gen_demos.py --task avoiding --n 60 --out data
  python tools/gen_demos.py --task pushing --n 120 --out data
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# host-side generation runs on CPU; disable the ambient TPU plugin
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if os.environ.get("JAX_PLATFORMS") != "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")

from d3il_tpu.data import experts  # noqa: E402
from d3il_tpu.envs import avoiding, pushing, scenes  # noqa: E402


def gen_avoiding(n_episodes, out_dir, seed=0):
    params = avoiding.AvoidingParams(kinematic=True)
    reset_j = jax.jit(lambda: avoiding.reset(params))
    step_j = jax.jit(lambda s, a: avoiding.step(params, s, a))
    rng = np.random.default_rng(seed)
    files = []
    for ep_i in range(n_episodes):
        mode = (ep_i % 2, (ep_i // 2) % 3, (ep_i // 6) % 4)
        expert = experts.AvoidingExpert(rng, mode)
        state = reset_j()
        tcp = np.asarray(params.tcp_pose(state.scene)[0])
        des_xy = tcp[:2].copy()
        log = {"robot": {"des_c_pos": [], "c_pos": []}}
        success = False
        for t in range(params.max_steps):
            tcp = np.asarray(params.tcp_pose(state.scene)[0])
            delta = expert.act(des_xy, tcp[:2])
            des_xy = des_xy + delta
            log["robot"]["des_c_pos"].append([des_xy[0], des_xy[1], 0.12])
            log["robot"]["c_pos"].append(tcp.tolist())
            a = jnp.asarray(np.concatenate([des_xy, [0.12, 0, 1, 0, 0]]), jnp.float32)
            state, res = step_j(state, a)
            if bool(res.done):
                success = bool(state.success)
                break
        if not success:
            print(f"  episode {ep_i} mode {mode} FAILED, skipping")
            continue
        fname = f"env_{ep_i:03d}.pkl"
        episode = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()}
                   for k, v in log.items()}
        episode["mode"] = np.asarray(expert.mode)
        with open(os.path.join(out_dir, fname), "wb") as f:
            pickle.dump(episode, f)
        files.append(fname)
    return files


def gen_pushing(n_episodes, out_dir, seed=0):
    params = pushing.PushingParams(kinematic=True)
    reset_j = jax.jit(lambda c: pushing.reset(params, c))
    step_j = jax.jit(lambda s, a: pushing.step(params, s, a))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    files, contexts = [], []
    for ep_i in range(n_episodes):
        key, sub = jax.random.split(key)
        ctx = pushing.sample_context(sub)
        expert = experts.PushingExpert(rng, mode=ep_i % 4)
        state = reset_j(ctx)
        tcp = np.asarray(params.tcp_pose(state.scene)[0])
        des_xy = tcp[:2].copy()
        log = {
            "robot": {"des_c_pos": [], "c_pos": []},
            "red-box": {"pos": [], "quat": []},
            "green-box": {"pos": [], "quat": []},
            "red-target": {"pos": [], "quat": []},
            "green-target": {"pos": [], "quat": []},
        }
        success = False
        for t in range(params.max_steps):
            boxes = np.asarray(state.scene.free_pos)[:, :2]
            tcp = np.asarray(params.tcp_pose(state.scene)[0])
            delta = expert.act(des_xy, tcp[:2], boxes)
            des_xy = des_xy + np.clip(delta, -0.01, 0.01)
            log["robot"]["des_c_pos"].append([des_xy[0], des_xy[1], 0.12])
            log["robot"]["c_pos"].append(tcp.tolist())
            log["red-box"]["pos"].append(np.asarray(state.scene.free_pos[0]).tolist())
            log["red-box"]["quat"].append(np.asarray(state.scene.free_quat[0]).tolist())
            log["green-box"]["pos"].append(np.asarray(state.scene.free_pos[1]).tolist())
            log["green-box"]["quat"].append(np.asarray(state.scene.free_quat[1]).tolist())
            log["red-target"]["pos"].append(scenes.PUSHING_TARGET_1.tolist())
            log["red-target"]["quat"].append([0, 1, 0, 0])
            log["green-target"]["pos"].append(scenes.PUSHING_TARGET_2.tolist())
            log["green-target"]["quat"].append([0, 1, 0, 0])
            a = jnp.asarray(np.concatenate([des_xy, [0.12, 0, 1, 0, 0]]), jnp.float32)
            state, res = step_j(state, a)
            if bool(res.done):
                success = bool(state.success)
                break
        if not success:
            print(f"  episode {ep_i} mode {expert.mode} FAILED "
                  f"(stage {expert.stage}), skipping")
            continue
        fname = f"env_{ep_i:03d}.pkl"
        episode = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()}
                   for k, v in log.items()}
        episode["mode"] = np.asarray(expert.mode)
        with open(os.path.join(out_dir, fname), "wb") as f:
            pickle.dump(episode, f)
        files.append(fname)
        contexts.append(jax.tree_util.tree_map(np.asarray, ctx))
    return files, contexts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["avoiding", "pushing"])
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--out", default="data")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    task_dir = os.path.join(args.out, args.task)
    all_dir = os.path.join(task_dir, "all_data")
    os.makedirs(all_dir, exist_ok=True)

    if args.task == "avoiding":
        files = gen_avoiding(args.n, all_dir, args.seed)
        contexts = None
    else:
        files, contexts = gen_pushing(args.n, all_dir, args.seed)

    rng = np.random.default_rng(args.seed + 1)
    files = list(files)
    perm = rng.permutation(len(files))
    n_eval = max(1, len(files) // 10)
    eval_files = [files[i] for i in perm[:n_eval]]
    train_files = [files[i] for i in perm[n_eval:]]
    with open(os.path.join(task_dir, "train_files.pkl"), "wb") as f:
        pickle.dump(train_files, f)
    with open(os.path.join(task_dir, "eval_files.pkl"), "wb") as f:
        pickle.dump(eval_files, f)
    if contexts is not None:
        # fixed test contexts, seed 2 (reference get_contexts.py:14-25)
        key = jax.random.PRNGKey(2)
        test_ctx = []
        for _ in range(60):
            key, sub = jax.random.split(key)
            from d3il_tpu.envs.pushing import sample_context
            test_ctx.append(jax.tree_util.tree_map(np.asarray, sample_context(sub)))
        with open(os.path.join(task_dir, "test_contexts.pkl"), "wb") as f:
            pickle.dump(test_ctx, f)
    print(f"wrote {len(train_files)} train + {len(eval_files)} eval episodes "
          f"to {task_dir}")


if __name__ == "__main__":
    main()
