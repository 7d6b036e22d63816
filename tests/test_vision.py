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
    from d3il_tpu.agents.vision import VisionBCAgent
    from d3il_tpu.agents import base as agent_base
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler
    from d3il_tpu.vision import taskviews

    render = taskviews.make_pushing_view(res=48)

    rng = np.random.default_rng(0)
    obs = rng.uniform(0.3, 0.7, size=(4, 20, 10)).astype(np.float32)
    act = rng.normal(scale=0.01, size=(4, 20, 2)).astype(np.float32)
    d = ds.build([(obs[i], act[i]) for i in range(4)], 20, 1)
    x, y = ds.all_valid(d)
    scaler = Scaler.fit(x, y)
    ag = VisionBCAgent.create(jax.random.PRNGKey(0), obs_dim=10, action_dim=2,
                              scaler=scaler, render_fn=render, low_dim=4,
                              res=48, hidden_dim=32, num_hidden_layers=2)
    cfg = agent_base.TrainConfig(epochs=1, batch_size=8, window_size=1,
                                 steps_per_epoch=2, eval_every_n_epochs=10)
    best, final, hist = agent_base.fit(ag.loss_fn(), ag.params, d, None, cfg,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(hist[-1]["train_loss"])
    # policy produces an action from a raw obs
    carry, a = jax.jit(ag.policy_apply())(final, (), jnp.asarray(obs[0, 0]))
    assert np.isfinite(np.asarray(a)).all()


def test_taskviews_render_all():
    """Every vision task view renders finite images of the right shape."""
    from d3il_tpu.vision import taskviews

    dims = {"avoiding": 4, "pushing": 10, "aligning": 20, "sorting_2": 10,
            "sorting_4": 16}
    for task, dim in dims.items():
        render = taskviews.make_render_obs(task, res=32)
        obs = jnp.asarray(np.random.default_rng(1).uniform(
            0.2, 0.6, size=(dim,)).astype(np.float32))
        bp, ih, low = jax.jit(render)(obs)
        assert bp.shape == (32, 32, 3) and ih.shape == (32, 32, 3)
        assert low.shape[0] == taskviews.low_dim_size(task)
        assert np.isfinite(np.asarray(bp)).all()


def test_vision_ddpm_and_bet_smoke():
    """VisionDDPM / VisionBeT: one train step + one policy action."""
    from d3il_tpu.agents.vision import VisionDDPMAgent, VisionBeTAgent
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler
    from d3il_tpu.vision import taskviews

    render = taskviews.make_pushing_view(res=32)
    rng = np.random.default_rng(0)
    obs = rng.uniform(0.3, 0.7, size=(2, 10, 10)).astype(np.float32)
    act = rng.normal(scale=0.01, size=(2, 10, 2)).astype(np.float32)
    d = ds.build([(obs[i], act[i]) for i in range(2)], 10, 1)
    x, y = ds.all_valid(d)
    scaler = Scaler.fit(x, y)
    key = jax.random.PRNGKey(0)

    ddpm = VisionDDPMAgent.create(key, 10, 2, scaler, render, low_dim=4,
                                  res=32, hidden_dim=32, num_hidden_layers=2,
                                  n_timesteps=4)
    ow, aw = ds.sample_windows(d, key, 4, 1)
    l = jax.jit(ddpm.loss_fn())(ddpm.params, ow, aw, key)
    assert np.isfinite(float(l))
    carry = ddpm.init_carry(10, key)
    _, a = jax.jit(ddpm.policy_apply())(ddpm.params, carry,
                                        jnp.asarray(obs[0, 0]))
    assert np.isfinite(np.asarray(a)).all()

    y_scaled = np.asarray(scaler.scale_output(jnp.asarray(y)))
    bet = VisionBeTAgent.create(key, 10, 2, scaler, y_scaled,
                                render_fn=render, low_dim=4, res=32,
                                hidden_dim=32, num_hidden_layers=2, n_bins=4)
    l = jax.jit(bet.loss_fn())(bet.params, ow, aw, key)
    assert np.isfinite(float(l))
    _, a = jax.jit(bet.policy_apply())(bet.params, bet.init_carry(10, key),
                                       jnp.asarray(obs[0, 0]))
    assert np.isfinite(np.asarray(a)).all()


def test_depth_seg_pointcloud():
    """Depth/segmentation/point-cloud channels (Camera.py:120-178 parity)."""
    g = _scene()
    cam_pos = jnp.array([0.525, -0.1, 1.0])
    cam_quat = jnp.array([1.0, 0.0, 0.0, 0.0])  # looking straight down
    rgb, depth, seg = jax.jit(lambda g: R.render_rgbds(
        g, cam_pos, cam_quat, 45.0, res=64))(g)
    rgb, depth, seg = map(np.asarray, (rgb, depth, seg))
    assert depth.shape == (64, 64) and seg.shape == (64, 64)
    # the two boxes appear in the segmentation mask with their geom indices
    assert (seg == 0).sum() > 3 and (seg == 1).sum() > 3
    # floor index = G (=2), everywhere else
    assert (seg == 2).sum() > 1000
    # depth at a box pixel < depth at a floor pixel (boxes are above floor)
    box_d = depth[seg == 0].mean()
    floor_d = depth[seg == 2].mean()
    assert box_d < floor_d
    # unprojected floor points sit on the floor plane
    pts = np.asarray(R.point_cloud(jnp.asarray(depth), cam_pos, cam_quat, 45.0))
    floor_pts = pts.reshape(64, 64, 3)[np.asarray(seg) == 2]
    assert np.allclose(floor_pts[:, 2], -0.019, atol=1e-3)
    # box-top points sit at the box top surface (z = 0.011 + 0.03)
    box_pts = pts.reshape(64, 64, 3)[np.asarray(seg) == 0]
    assert abs(np.median(box_pts[:, 2]) - 0.041) < 5e-3


def test_vision_gmm_cvae_beso_smoke():
    """Round-4 vision heads (gmm/cvae/beso): one train step + one action."""
    from d3il_tpu.agents.vision import (VisionGMMAgent, VisionCVAEAgent,
                                        VisionBesoAgent)
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler
    from d3il_tpu.vision import taskviews

    render = taskviews.make_pushing_view(res=32)
    rng = np.random.default_rng(0)
    obs = rng.uniform(0.3, 0.7, size=(2, 10, 10)).astype(np.float32)
    act = rng.normal(scale=0.01, size=(2, 10, 2)).astype(np.float32)
    d = ds.build([(obs[i], act[i]) for i in range(2)], 10, 1)
    x, y = ds.all_valid(d)
    scaler = Scaler.fit(x, y)
    key = jax.random.PRNGKey(0)
    ow, aw = ds.sample_windows(d, key, 4, 1)

    for cls, kw in ((VisionGMMAgent, dict(n_gaussians=4)),
                    (VisionCVAEAgent, dict(latent_dim=4)),
                    (VisionBesoAgent, dict(n_steps=2))):
        agent = cls.create(key, 10, 2, scaler, render, low_dim=4, res=32,
                           hidden_dim=32, num_hidden_layers=2, **kw)
        l = jax.jit(agent.loss_fn())(agent.params, ow, aw, key)
        assert np.isfinite(float(l)), cls.__name__
        _, a = jax.jit(agent.policy_apply())(
            agent.params, agent.init_carry(10, key), jnp.asarray(obs[0, 0]))
        assert np.isfinite(np.asarray(a)).all(), cls.__name__


def test_vision_act_gptbc_ibc_encdec_smoke():
    """Round-5 vision heads (act/gpt_bc/ibc/ddpm_encdec): one train step +
    one policy action each (the last 4 of the reference's 9 vision variants,
    agents/{act,gpt_bc,ibc,ddpm_encdec}_vision_agent.py)."""
    from d3il_tpu.agents.vision import (VisionACTAgent, VisionGPTBCAgent,
                                        VisionIBCAgent,
                                        VisionDDPMEncDecAgent)
    from d3il_tpu.data import dataset as ds
    from d3il_tpu.data.scaler import Scaler
    from d3il_tpu.vision import taskviews

    render = taskviews.make_pushing_view(res=32)
    rng = np.random.default_rng(0)
    obs = rng.uniform(0.3, 0.7, size=(2, 12, 10)).astype(np.float32)
    act = rng.normal(scale=0.01, size=(2, 12, 2)).astype(np.float32)
    d = ds.build([(obs[i], act[i]) for i in range(2)], 12, 1)
    x, y = ds.all_valid(d)
    scaler = Scaler.fit(x, y)
    key = jax.random.PRNGKey(0)

    for cls, kw in ((VisionACTAgent, dict(chunk=4, embed_dim=32)),
                    (VisionGPTBCAgent, dict(window_size=3, n_embd=32,
                                            n_layer=2)),
                    (VisionIBCAgent, dict(hidden_dim=32,
                                          num_hidden_layers=2)),
                    (VisionDDPMEncDecAgent, dict(chunk=4, embed_dim=32,
                                                 n_timesteps=4))):
        agent = cls.create(key, 10, 2, scaler, render, low_dim=4, res=32,
                           **kw)
        W = getattr(agent, "train_window", None) or agent.window_size
        dW = ds.rewindow(d, W)
        ow, aw = ds.sample_windows(dW, key, 4, W)
        l = jax.jit(agent.loss_fn())(agent.params, ow, aw, key)
        assert np.isfinite(float(l)), cls.__name__
        _, a = jax.jit(agent.policy_apply())(
            agent.params, agent.init_carry(10, key), jnp.asarray(obs[0, 0]))
        assert np.isfinite(np.asarray(a)).all(), cls.__name__
