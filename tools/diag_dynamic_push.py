"""Diagnose dynamic-arm pushing speed: our engine vs a C-MuJoCo golden.

Round-4 finding (RESULTS.md): in full-dynamics mode the impedance-tracked arm
pushes boxes at ~25 mm/s, overruning the 400-step pushing horizon. This tool
answers WHERE that limit comes from by driving the identical moving setpoint
(a straight line through the red box at a commanded speed) through the full
torque path (cartesian DLS-IK -> joint PD feedforward -> gravity comp) in

  (a) our batched engine (envs/pushing.py, kinematic=False), and
  (b) C MuJoCo on the serialized golden scene (testing/mjcf_ref.py),

and logging tcp + box trajectories for both.

  python tools/diag_dynamic_push.py --speed 0.006 --steps 150
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
import mujoco                                 # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/d3il_tpu_jax_cache")

from d3il_tpu.control import cartesian, gains, gripper, joint_pd  # noqa: E402
from d3il_tpu.envs import pushing, scenes     # noqa: E402
from d3il_tpu.robot import panda              # noqa: E402
from d3il_tpu.testing import mjcf_ref         # noqa: E402


def setpoint_path(steps, speed, box0, tgt):
    start = np.asarray(scenes.INIT_EE_POS[:2], np.float32)
    u = (tgt - box0) / np.linalg.norm(tgt - box0)
    approach = box0 - u * 0.065
    seg1 = max(2, int(np.linalg.norm(approach - start) / 0.01) + 1)
    path1 = start + (approach - start) * np.linspace(0, 1, seg1)[:, None]
    rest = steps - seg1
    path2 = approach + u * speed * np.arange(1, rest + 1)[:, None]
    return np.concatenate([path1, path2]).astype(np.float32), seg1


def run_ours(params, des_seq, box0, z=0.12):
    ctx = (jnp.asarray(box0), jnp.array([1.0, 0, 0, 0]),
           jnp.asarray([0.6, -0.05], jnp.float32), jnp.array([1.0, 0, 0, 0]))
    state = pushing.reset(params, ctx)

    def one(state, des_xy):
        a = jnp.concatenate([des_xy, jnp.array([z, 0.0, 1.0, 0.0, 0.0],
                                               jnp.float32)])
        state, res = pushing.step(params, state, a)
        return state, (res.obs[0:2], state.scene.free_pos[0, :2])

    state, (tcp, box) = jax.lax.scan(jax.jit(one), state, jnp.asarray(des_seq))
    return np.asarray(tcp), np.asarray(box)


def run_mujoco(params, des_seq, box0, z=0.12):
    chain = params.scene.robot
    hand = chain.body_index("panda_hand")
    xml = mjcf_ref.chain_to_mjcf(
        chain, timestep=1e-3, actuators=True,
        option_extra='cone="elliptic" impratio="3" solver="Newton" '
                     'tolerance="1e-10"',
        extra_worldbody=f"""
    <geom name="table" type="plane" size="5 5 1" pos="0.4 0 {scenes.TABLE_Z}"
          solimp="0.999 0.999 0.001" solref="0.002 1"/>
    <body name="push_box" pos="{box0[0]} {box0[1]} 0.011">
      <freejoint name="push_box"/>
      <geom type="box" size="0.03 0.03 0.03" mass="0.05"/></body>
""")
    hand_name = chain.names[hand]
    i = xml.index(f'<body name="{hand_name}"')
    j = xml.index(">", i) + 1
    rod = ('<geom name="rod" type="capsule" size="0.01 0.14" '
           'pos="0 0 0.075"/>')
    xml = xml[:j] + rod + xml[j:]
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    d.qpos[:7] = np.asarray(params.q_init)
    mujoco.mj_forward(m, d)

    ctrl_chain = panda.build_control_chain()
    g = gains.CartPosQuatGains()
    jg = gains.JointPDGains()
    forcerange = np.array([[-87, 87]] * 4 + [[-12, 12]] * 3 + [[-70, 70]] * 2,
                          float)
    des_quat = jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32)

    @jax.jit
    def torque(st, q, qd, des_xy):
        des_pos = jnp.concatenate([des_xy, jnp.array([z], jnp.float32)])
        st, q_des, qd_des, qdd_des = cartesian.step(
            ctrl_chain, g, st, des_pos, des_quat, 1e-3)
        tau = joint_pd.feedforward_torque(ctrl_chain, jg, q_des, qd_des,
                                          qdd_des, q[:7], qd[:7])
        fing = gripper.finger_forces(q[7:], qd[7:], 0.0, False)
        return st, jnp.concatenate([tau, fing])

    st = cartesian.init_state(jnp.array(d.qpos[:7], jnp.float32))
    box_adr = m.jnt_qposadr[m.joint("push_box").id]
    tcp_id = m.body("tcp").id
    nq_rob = 9
    tcp_log, box_log = [], []
    for t in range(des_seq.shape[0]):
        des_xy = jnp.asarray(des_seq[t])
        for s in range(params.n_substeps):
            q = jnp.array(d.qpos[:nq_rob], jnp.float32)
            qd = jnp.array(d.qvel[:nq_rob], jnp.float32)
            st, u = torque(st, q, qd, des_xy)
            u = np.asarray(u, np.float64)
            u[:7] += d.qfrc_bias[:7]
            d.ctrl[:] = np.clip(u, forcerange[:, 0], forcerange[:, 1])
            mujoco.mj_step(m, d)
        tcp_log.append(d.xpos[tcp_id, :2].copy())
        box_log.append(d.qpos[box_adr:box_adr + 2].copy())
    return np.asarray(tcp_log), np.asarray(box_log)


def report(name, des_seq, tcp, box, seg1, dt_ctrl):
    lag = np.linalg.norm(des_seq - tcp, axis=-1)
    tcp_v = np.linalg.norm(np.diff(tcp, axis=0), axis=-1) / dt_ctrl
    box_v = np.linalg.norm(np.diff(box, axis=0), axis=-1) / dt_ctrl
    print(f"--- {name}")
    print(f"  approach phase ends at step {seg1}")
    print(f"  tcp speed  mean/max during push: "
          f"{tcp_v[seg1:].mean()*1000:.1f} / {tcp_v[seg1:].max()*1000:.1f} mm/s")
    print(f"  box speed  mean/max during push: "
          f"{box_v[seg1:].mean()*1000:.1f} / {box_v[seg1:].max()*1000:.1f} mm/s")
    print(f"  setpoint lag mean/max during push: "
          f"{lag[seg1:].mean()*1000:.1f} / {lag[seg1:].max()*1000:.1f} mm")
    print(f"  box displacement: {np.linalg.norm(box[-1]-box[0]):.3f} m")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed", type=float, default=0.006,
                    help="setpoint advance per control step (m)")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--skip-mujoco", action="store_true")
    ap.add_argument("--z", type=float, default=0.12)
    ap.add_argument("--no-box", action="store_true",
                    help="move the box out of the path (free-space tracking)")
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    params = pushing.PushingParams(kinematic=False)
    box0 = np.array([0.45, -0.05], np.float32)
    tgt = np.array([0.45, 0.25], np.float32)
    real_box0 = np.array([0.8, -0.4], np.float32) if args.no_box else box0
    des_seq, seg1 = setpoint_path(args.steps, args.speed, box0, tgt)
    dt_ctrl = params.n_substeps * 1e-3
    print(f"commanded speed {args.speed / dt_ctrl * 1000:.0f} mm/s")

    if not args.skip_ours:
        tcp, box = run_ours(params, des_seq, real_box0, args.z)
        report("ours (dynamic)", des_seq, tcp, box, seg1, dt_ctrl)
    if not args.skip_mujoco:
        tcp, box = run_mujoco(params, des_seq, real_box0, args.z)
        report("C MuJoCo golden (dynamic)", des_seq, tcp, box, seg1, dt_ctrl)


if __name__ == "__main__":
    main()
