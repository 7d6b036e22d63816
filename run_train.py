"""Train + evaluate an agent on a task (the reference run.py equivalent).

  python run_train.py --task avoiding --agent bc --epochs 60 --n-trajs 48

Pipeline: load demonstration pickles -> padded device tensors -> Scaler ->
jitted epoch training -> batched on-device rollout evaluation (all episodes
in lockstep under vmap, replacing the reference's process-per-env harness) ->
success/entropy metrics + orbax checkpoint.
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

from d3il_tpu.agents import base as agent_base  # noqa: E402
from d3il_tpu.agents.bc import BCAgent  # noqa: E402
from d3il_tpu.data import dataset as ds  # noqa: E402
from d3il_tpu.data.scaler import Scaler  # noqa: E402
from d3il_tpu.eval import metrics, rollout  # noqa: E402


def load_task(name: str, kinematic: bool):
    if name == "avoiding":
        from d3il_tpu.envs import avoiding as env
        params = env.AvoidingParams(kinematic=kinematic)
        return params, env, ds.assemble_avoiding
    if name == "pushing":
        from d3il_tpu.envs import pushing as env
        params = env.PushingParams(kinematic=kinematic)
        return params, env, ds.assemble_pushing
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="avoiding")
    ap.add_argument("--agent", default="bc")
    ap.add_argument("--data", default="data")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--n-trajs", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kinematic", action="store_true", default=True)
    ap.add_argument("--ddpm-steps", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    task_dir = os.path.join(args.data, args.task)
    with open(os.path.join(task_dir, "train_files.pkl"), "rb") as f:
        train_files = pickle.load(f)
    with open(os.path.join(task_dir, "eval_files.pkl"), "rb") as f:
        eval_files = pickle.load(f)
    params, env_mod, assemble = load_task(args.task, args.kinematic)

    all_dir = os.path.join(task_dir, "all_data")
    max_len = params.max_steps
    train_data = ds.load_task_dataset(all_dir, train_files, assemble, max_len,
                                      args.window)
    val_data = ds.load_task_dataset(all_dir, eval_files, assemble, max_len,
                                    args.window)
    x, y = ds.all_valid(train_data)
    scaler = Scaler.fit(x, y)
    obs_dim, act_dim = x.shape[-1], y.shape[-1]
    print(f"dataset: {len(train_files)} train eps, {train_data.n_windows} windows, "
          f"obs {obs_dim} act {act_dim}")

    key = jax.random.PRNGKey(args.seed)
    key, k1 = jax.random.split(key)
    kw = dict(hidden_dim=args.hidden, num_hidden_layers=args.layers,
              window_size=args.window)
    ema = None
    if args.agent == "bc":
        agent = BCAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent == "cvae":
        from d3il_tpu.agents.cvae import CVAEAgent
        agent = CVAEAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent == "gmm":
        from d3il_tpu.agents.gmm import GMMAgent
        agent = GMMAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent == "ddpm":
        from d3il_tpu.agents.ddpm import DDPMAgent
        agent = DDPMAgent.create(k1, obs_dim, act_dim, scaler,
                                 n_timesteps=args.ddpm_steps, **kw)
        ema = 0.995
    elif args.agent == "gpt_bc":
        from d3il_tpu.agents.gpt_bc import GPTBCAgent
        kw["window_size"] = max(args.window, 5)
        agent = GPTBCAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent in ("bet", "bet_mlp"):
        from d3il_tpu.agents.bet import BeTAgent
        acts_scaled = np.asarray(scaler.scale_output(jnp.asarray(y)))
        agent = BeTAgent.create(k1, obs_dim, act_dim, scaler, acts_scaled,
                                use_gpt=(args.agent == "bet"), **kw)
    elif args.agent == "ibc":
        from d3il_tpu.agents.ibc import IBCAgent
        agent = IBCAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent == "beso":
        from d3il_tpu.agents.beso import BesoAgent
        agent = BesoAgent.create(k1, obs_dim, act_dim, scaler, **kw)
    elif args.agent == "act":
        from d3il_tpu.agents.act import ACTAgent
        agent = ACTAgent.create(k1, obs_dim, act_dim, scaler, chunk=args.chunk)
    elif args.agent == "ddpm_encdec":
        from d3il_tpu.agents.ddpm_encdec import DDPMEncDecAgent
        agent = DDPMEncDecAgent.create(k1, obs_dim, act_dim, scaler,
                                       chunk=args.chunk,
                                       n_timesteps=args.ddpm_steps)
        ema = 0.995
    else:
        raise ValueError(args.agent)
    # chunked/windowed agents train on wider windows: rebuild index tables
    want_window = getattr(agent, "train_window", None) or agent.window_size
    if want_window != args.window:
        args.window = want_window
        train_data = ds.rewindow(train_data, args.window)
        val_data = ds.rewindow(val_data, args.window)

    cfg = agent_base.TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                                 window_size=args.window, eval_every_n_epochs=10,
                                 ema_decay=ema)
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

    # ---- batched evaluation ----
    policy_apply = agent.policy_apply()
    if args.task == "avoiding":
        roll = rollout.make_rod_rollout(
            params, lambda p, c: env_mod.reset(p), env_mod.step,
            env_mod.get_observation, policy_apply)

        def run_one(key):
            carry0 = agent.init_carry(obs_dim, key)
            state, dones = roll(agent.params, carry0, None)
            return state.success, state.mode_encoding

        t0 = time.time()
        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.n_trajs)
        succ, enc = jax.jit(jax.vmap(run_one))(keys)
        jax.block_until_ready(succ)
        print(f"eval: {args.n_trajs} episodes in {time.time()-t0:.1f}s")
        m = metrics.avoiding_score(np.asarray(succ, np.float32), jnp.asarray(enc))
        result = {k: float(v) for k, v in m.items()}
    elif args.task == "pushing":
        roll = rollout.make_rod_rollout(
            params, env_mod.reset, env_mod.step, env_mod.get_observation,
            policy_apply)

        def run_one(key):
            k1, k2 = jax.random.split(key)
            ctx = env_mod.sample_context(k1)
            carry0 = agent.init_carry(obs_dim, k2)
            state, dones = roll(agent.params, carry0, ctx)
            return state.success, state.mode

        keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.n_trajs)
        succ, modes = jax.jit(jax.vmap(run_one))(keys)
        jax.block_until_ready(succ)
        m = metrics.pushing_score(
            jnp.asarray(succ, jnp.float32).reshape(-1, 1),
            jnp.asarray(modes).reshape(-1, 1))
        result = {k: float(v) for k, v in m.items()}

    print(json.dumps({"task": args.task, "agent": args.agent, **result}))


if __name__ == "__main__":
    main()
