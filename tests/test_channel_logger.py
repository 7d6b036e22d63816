"""Channel logger (utils/channel_logger.py) vs the reference's imperative
LoggerBase semantics (core/logger.py): per-step recording inside a scan,
interval downsampling, episode-length trim, pickle-schema export."""
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.envs import pushing
from d3il_tpu.utils import channel_logger as cl


def test_scan_recording_and_export():
    params = pushing.PushingParams(kinematic=True)
    ctx = pushing.sample_context(jax.random.PRNGKey(0))
    state0 = pushing.reset(params, ctx)

    chans = cl.robot_channels(lambda s: params.tcp_pose(s)) \
        + cl.object_channels(["red-box", "green-box"])
    T = 12
    init, record, export = cl.make_logger(chans, T,
                                          example_state=state0.scene)

    action = jnp.array([0.45, -0.2, 0.12, 0, 1, 0, 0], jnp.float32)

    @jax.jit
    def run(state):
        bufs = init()

        def body(carry, t):
            state, bufs = carry
            bufs = record(bufs, t, state.scene)
            state, _ = pushing.step(params, state, action)
            return (state, bufs), None

        (state, bufs), _ = jax.lax.scan(body, (state, bufs),
                                        jnp.arange(T))
        return bufs

    bufs = run(state0)
    log = export(bufs, length=T)
    assert set(log) == {"robot", "red-box", "green-box"}
    assert log["robot"]["j_pos"].shape == (T, 7)
    assert log["robot"]["c_pos"].shape == (T, 3)
    assert log["red-box"]["pos"].shape == (T, 3)
    assert log["red-box"]["quat"].shape == (T, 4)
    # recorded state must change as the arm tracks the setpoint
    assert np.linalg.norm(log["robot"]["c_pos"][-1]
                          - log["robot"]["c_pos"][0]) > 1e-3
    # boxes rest on the table through the hold (step 0 is the raw spawn
    # height, still settling)
    assert np.allclose(log["red-box"]["pos"][1:, 2], 0.011, atol=5e-3)


def test_interval_downsampling_and_trim():
    params = pushing.PushingParams(kinematic=True)
    ctx = pushing.sample_context(jax.random.PRNGKey(1))
    state = pushing.reset(params, ctx)
    chans = [cl.Channel("robot.t", lambda s: s.q[0])]
    init, record, export = cl.make_logger(chans, 10, interval=3,
                                          example_state=state.scene)
    bufs = init()
    for t in range(10):
        # make the logged value identifiable per step
        sc = state.scene._replace(q=state.scene.q.at[0].set(float(t)))
        bufs = record(bufs, jnp.int32(t), sc)
    log = export(bufs, length=7)
    # steps 0, 3, 6 recorded; length 7 -> ceil(7/3) = 3 slots
    assert log["robot"]["t"].shape == (3,)
    assert np.allclose(log["robot"]["t"], [0.0, 3.0, 6.0])


def test_plot_headless(tmp_path):
    log = {"robot": {"c_pos": np.random.default_rng(0).normal(
        size=(20, 3)).astype(np.float32)}}
    p = str(tmp_path / "log.png")
    cl.plot(log, p)
    import os
    assert os.path.getsize(p) > 0
