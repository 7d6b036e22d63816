"""Renderer + vision encoder tests."""
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.vision import renderer as R
from d3il_tpu.vision.encoder import MultiImageObsEncoder


def _scene():
    return R.RenderGeom(
        pos=jnp.array([[0.45, -0.1, 0.011], [0.6, -0.1, 0.011]]),
        quat=jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
        half=jnp.array([[0.03, 0.03, 0.03]] * 2),
        color=jnp.array([[1.0, 0, 0], [0.0, 1.0, 0]]),
    )


def test_render_boxes_visible():
    img = jax.jit(lambda g: R.render(
        g, jnp.asarray(R.BP_CAM_POS), jnp.asarray(R.BP_CAM_QUAT),
        R.BP_CAM_FOVY, res=96))(_scene())
    img = np.asarray(img)
    assert img.shape == (96, 96, 3)
    assert img.min() >= 0 and img.max() <= 1
    # red and green boxes must each dominate some pixels
    red_px = ((img[..., 0] > 0.5) & (img[..., 1] < 0.3)).sum()
    green_px = ((img[..., 1] > 0.5) & (img[..., 0] < 0.3) & (img[..., 2] < 0.3)).sum()
    assert red_px > 3, f"red box invisible ({red_px} px)"
    assert green_px > 3, f"green box invisible ({green_px} px)"
    # floor color present
    floor_px = ((abs(img[..., 0] - 0.8 * 0.9) < 0.25)
                & (img[..., 2] < 0.55)).sum()
    assert floor_px > 500


def test_render_moving_box_moves_pixels():
    g1 = _scene()
    g2 = g1._replace(pos=g1.pos.at[0, 0].add(0.1))
    f = jax.jit(lambda g: R.render(g, jnp.asarray(R.BP_CAM_POS),
                                   jnp.asarray(R.BP_CAM_QUAT), R.BP_CAM_FOVY,
                                   res=64))
    d = np.abs(np.asarray(f(g1)) - np.asarray(f(g2))).sum()
    assert d > 1.0


def test_encoder_shapes():
    enc = MultiImageObsEncoder(num_kp=8, out_dim=16)
    key = jax.random.PRNGKey(0)
    bp = jnp.zeros((2, 96, 96, 3))
    inh = jnp.zeros((2, 96, 96, 3))
    low = jnp.zeros((2, 4))
    params = enc.init(key, bp, inh, low)
    out = enc.apply(params, bp, inh, low)
    assert out.shape == (2, 16 * 2 + 4)


def test_vision_bc_trains():
    """VisionBCAgent: render-from-state training converges a step."""
    from d3il_tpu.agents.vision_bc import VisionBCAgent
    from d3il_tpu.agents import base as agent_base
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler
    from d3il_tpu.envs import pushing

    params = None  # render_obs doesn't need env params built; use factory lite
    class _P:  # minimal stub with the fields make_render_obs uses
        pass
    render = pushing.make_render_obs(_P(), res=48)

    rng = np.random.default_rng(0)
    obs = rng.uniform(0.3, 0.7, size=(4, 20, 8)).astype(np.float32)
    act = rng.normal(scale=0.01, size=(4, 20, 2)).astype(np.float32)
    d = ds.build([(obs[i], act[i]) for i in range(4)], 20, 1)
    x, y = ds.all_valid(d)
    scaler = Scaler.fit(x, y)
    ag = VisionBCAgent.create(jax.random.PRNGKey(0), low_dim=2, action_dim=2,
                              scaler=scaler, render_fn=render, res=48,
                              hidden_dim=32, num_hidden_layers=2)
    cfg = agent_base.TrainConfig(epochs=1, batch_size=8, window_size=1,
                                 steps_per_epoch=2, eval_every_n_epochs=10)
    best, final, hist = agent_base.fit(ag.loss_fn(), ag.params, d, None, cfg,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(hist[-1]["train_loss"])
    # policy produces an action from a raw obs
    carry, a = jax.jit(ag.policy_apply())(final, (), jnp.asarray(obs[0, 0]))
    assert np.isfinite(np.asarray(a)).all()
