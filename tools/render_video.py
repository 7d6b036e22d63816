"""Render an episode to an animated GIF (the reference's offscreen
video-recording capability, d3il_sim mj_renderer.py:280+, minus the
interactive GUI — there is no display in a TPU pod).

  python tools/render_video.py --task pushing --out /tmp/pushing.gif
  python tools/render_video.py --task pushing --ckpt ckpts/pushing_bc \
      --out /tmp/policy.gif

Without --ckpt the episode is driven by the scripted expert's demonstration
data path (replays the first generated demo's recorded observations);
with --ckpt the trained policy rolls out live in the env and each frame is
rendered on device from the observation (vision/taskviews.py).
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("D3IL_RUN_CPU", "1") == "1" and "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np


def _to_gif(frames, path, fps=20):
    from PIL import Image
    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    print(f"wrote {path}: {len(imgs)} frames {imgs[0].size}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="pushing")
    ap.add_argument("--data", default="data")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="/tmp/episode.gif")
    ap.add_argument("--res", type=int, default=192)
    ap.add_argument("--every", type=int, default=2,
                    help="render every Nth env step")
    ap.add_argument("--max-frames", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("D3IL_TPU_CACHE",
                                     "/tmp/d3il_tpu_jax_cache"))
    from d3il_tpu.vision import taskviews

    render = jax.jit(taskviews.make_render_obs(args.task, res=args.res))

    if args.ckpt:
        import run_eval
        import run_train
        spec, agent, meta = run_eval.load_agent(args.ckpt)
        from d3il_tpu.eval import sims as sims_mod
        from d3il_tpu.eval import rollout as roll_mod
        env = spec.env()
        params = spec.make_params()
        init, body = roll_mod.make_rod_stepper(
            params, env.reset, env.step, env.get_observation,
            agent.policy_apply(),
            pos_dim=3 if spec.rollout == "rod3" else 2)
        ctx = env.sample_context(jax.random.PRNGKey(3)) \
            if hasattr(env, "sample_context") else None
        carry = init(agent.params, agent.init_carry(
            spec.obs_dim, jax.random.PRNGKey(0)), ctx)
        body_j = jax.jit(lambda c: body(agent.params, c))
        frames = []
        for t in range(min(spec.max_steps, args.max_frames * args.every)):
            carry = body_j(carry)
            if t % args.every == 0:
                obs = env.get_observation(params, carry[0])
                # policy-view obs prefix: prev absolute action = tcp pos
                obs_full = jnp.concatenate([carry[2], obs])
                bp, ih, _ = render(obs_full)
                frames.append((np.asarray(bp) * 255).astype(np.uint8))
        _to_gif(frames[:args.max_frames], args.out)
        return

    # demo replay: re-render the recorded observation stream
    task_dir = os.path.join(args.data, args.task)
    with open(os.path.join(task_dir, "train_files.pkl"), "rb") as f:
        fn = pickle.load(f)[0]
    with open(os.path.join(task_dir, "all_data", fn), "rb") as f:
        ep = pickle.load(f)
    from d3il_tpu.data import dataset as ds
    from d3il_tpu import registry
    obs, _ = registry.TASKS[args.task].assemble(ep)
    frames = []
    for t in range(0, min(len(obs), args.max_frames * args.every),
                   args.every):
        bp, ih, _ = render(jnp.asarray(obs[t]))
        frames.append((np.asarray(bp) * 255).astype(np.uint8))
    _to_gif(frames[:args.max_frames], args.out)


if __name__ == "__main__":
    main()
