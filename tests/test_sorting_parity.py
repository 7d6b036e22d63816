"""Sorting-scene episode parity vs C MuJoCo: push a box off the platform.

Extends tests/test_episode_parity.py (pushing scene) to the sorting scene's
distinguishing physics: a raised platform (static box geom, top z=0.1,
friction 0.3 with geom priority — sorting/platform.xml + sorting_objects.py
pos override) whose +y edge the boxes are ejected over. Both engines are
driven by the IDENTICAL prescribed joint trajectory from the repo's own
DLS-IK controller; the pushed box must slide on the low-friction platform
in lockstep, tip over the edge, and come to rest on the table below in both
simulators.
"""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.control import cartesian
from d3il_tpu.envs import common, scenes, sorting
from d3il_tpu.testing import mjcf_ref


@pytest.fixture(scope="module")
def sort_params():
    return sorting.SortingParams(2, kinematic=True)


def _mj_golden_model(params):
    chain = params.scene.robot
    hand = chain.body_index("panda_hand")
    xml = mjcf_ref.chain_to_mjcf(
        chain, timestep=1e-3,
        option_extra='cone="elliptic" impratio="3" solver="Newton" '
                     'tolerance="1e-10"',
        extra_worldbody=f"""
    <geom name="table" type="plane" size="5 5 1" pos="0.4 0 {scenes.TABLE_Z}"
          solimp="0.999 0.999 0.001" solref="0.002 1"/>
    <geom name="platform" type="box" size="0.3 0.3 0.1" pos="0.5 -0.1 0"
          friction="0.3 0.001 0.0001" priority="1"/>
    <body name="sort_box" pos="0.5 0.0 0.131"><freejoint name="sort_box"/>
      <geom type="box" size="0.03 0.03 0.03" mass="0.05"/></body>
""")
    hand_name = chain.names[hand]
    marker = f'<body name="{hand_name}"'
    i = xml.index(marker)
    j = xml.index(">", i) + 1
    rod = ('<geom name="rod" type="capsule" size="0.01 0.14" '
           'pos="0 0 0.075"/>')
    xml = xml[:j] + rod + xml[j:]
    m = mujoco.MjModel.from_xml_string(xml)
    return m, mujoco.MjData(m)


def _ik_q_trajectory(params, des_seq, z):
    des_quat = jnp.array([0.0, 1.0, 0.0, 0.0])

    def per_step(cs, des_xy):
        des_pos = jnp.concatenate([des_xy, jnp.float32(z)[None]])
        cs, (q_des, qd_des, _) = common.ik_trajectory(params, cs, des_pos,
                                                      des_quat)
        return cs, q_des

    cs = cartesian.init_state(jnp.asarray(params.q_init, jnp.float32))
    _, qs = jax.lax.scan(per_step, cs, des_seq)
    return np.asarray(qs)


def test_sorting_platform_edge_parity(sort_params):
    """Box slides on the friction-0.3 platform and drops off the +y edge in
    both engines, with bounded divergence during the sliding segment."""
    params = sort_params
    T = 110
    box0 = np.array([0.5, 0.0], np.float32)
    start = np.asarray(sorting.INIT_EE_POS[:2], np.float32)
    u = np.array([0.0, 1.0], np.float32)
    approach = box0 - u * 0.065
    seg1 = max(2, int(np.linalg.norm(approach - start) / 0.01) + 1)
    path1 = start + (approach - start) * np.linspace(0, 1, seg1)[:, None]
    rest = T - seg1
    path2 = approach + u * 0.006 * np.arange(1, rest + 1)[:, None]
    des_seq = jnp.asarray(np.concatenate([path1, path2]), jnp.float32)
    z_rod = float(sorting.INIT_EE_POS[2])

    qs = _ik_q_trajectory(params, des_seq, z_rod)  # [T, 35, 7]

    # ---- our engine, robot position-prescribed; second box parked far away
    ctx = (jnp.asarray([[0.5, 0.0], [0.25, -0.35]], jnp.float32),
           jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)))
    state = sorting.reset(params, ctx)
    sc = state.scene

    def env_step(sc, q_des_block):
        def sub(sc, q_d):
            w = sc.q[7:]
            q_new = jnp.concatenate([q_d, w])
            qd_new = (q_new - sc.q) / params.dt
            sc = params._engine_step(sc, jnp.concatenate([q_new, qd_new]))
            return sc, None
        sc, _ = jax.lax.scan(sub, sc, q_des_block)
        return sc, sc.free_pos

    sc, ours_pos = jax.jit(
        lambda sc, qs: jax.lax.scan(env_step, sc, qs))(sc, jnp.asarray(qs))
    ours_pos = np.asarray(ours_pos)  # [T, 2, 3]

    # ---- golden MuJoCo
    m, d = _mj_golden_model(params)
    d.qpos[:7] = np.asarray(params.q_init)
    d.qpos[7:9] = 0.0
    box_adr = m.jnt_qposadr[m.joint("sort_box").id]
    mujoco.mj_forward(m, d)
    for _ in range(60):   # settle like env reset
        d.qvel[:7] = 0.0
        mujoco.mj_step(m, d)
    mj_pos = np.zeros((T, 3))
    prev_q = np.asarray(params.q_init).copy()
    for t in range(T):
        for s in range(qs.shape[1]):
            q = qs[t, s]
            d.qpos[:7] = q
            d.qvel[:7] = (q - prev_q) / 1e-3
            d.qpos[7:9] = 0.0
            d.qvel[7:9] = 0.0
            prev_q = q
            mujoco.mj_step(m, d)
        mj_pos[t] = d.qpos[box_adr:box_adr + 3]

    # both boxes land on the platform top (z ~ 0.13; the env's settle pops
    # the overlapped spawn out of the platform and the box may still be
    # descending through the first control steps)
    assert 0.11 < ours_pos[5, 0, 2] < 0.17, ours_pos[5, 0]
    assert 0.11 < mj_pos[5, 2] < 0.17, mj_pos[5]

    # sliding segment: pointwise parity while both boxes stay on the
    # platform (contact-rich trajectories decorrelate near the edge-tip
    # instability, so the pointwise bound covers the flat slide only)
    on_platform = (ours_pos[:, 0, 2] > 0.12) & (mj_pos[:, 2] > 0.12)
    k = int(np.argmin(on_platform)) if not on_platform.all() else T
    k_cmp = max(10, int(0.8 * k))
    div = np.linalg.norm(ours_pos[10:k_cmp, 0, :2] - mj_pos[10:k_cmp, :2],
                         axis=-1)
    assert div.max() < 0.035, f"slide divergence {div.max():.3f} m (k={k})"

    # both engines must eject the box over the +y edge and drop it to the
    # table (platform top 0.1 -> table rest z ~ 0.011)
    assert ours_pos[-1, 0, 1] > 0.2, f"ours y={ours_pos[-1, 0, 1]:.3f}"
    assert mj_pos[-1, 1] > 0.2, f"mujoco y={mj_pos[-1, 1]:.3f}"
    assert ours_pos[-1, 0, 2] < 0.06, f"ours z={ours_pos[-1, 0, 2]:.3f}"
    assert mj_pos[-1, 2] < 0.06, f"mujoco z={mj_pos[-1, 2]:.3f}"

    # the parked second box must not move in our engine
    assert np.abs(ours_pos[-1, 1, :2] - [0.25, -0.35]).max() < 5e-3
