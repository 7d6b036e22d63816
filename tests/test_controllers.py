"""Controller stack validation.

The decisive test drives a C-MuJoCo plant (the 9-dof sim chain, no contacts)
with torques computed by the JAX controller stack exactly as the reference
robot does per physics step (MjRobot.prepare_step + RobotBase.preprocessCommand):
cartesian DLS-IK -> joint PD + model feedforward -> finger law -> gravity
compensation. The end effector must track a commanded Cartesian target.
"""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.control import cartesian, gains, gripper, joint_pd
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot import panda
from d3il_tpu.testing.mjcf_ref import chain_to_mjcf

DT = 1e-3


def test_ik_virtual_trajectory_converges():
    """Kinematic sanity: iterating the controller moves the virtual joint
    trajectory until FK reaches the commanded pose (reference behavior with
    neglect_dynamics=True, IKControllers.py:317-319)."""
    ctrl_chain = panda.build_control_chain()
    g = gains.CartPosQuatGains()
    ee = ctrl_chain.body_index("panda_grasptarget")

    q0 = jnp.array(panda.INIT_QPOS, jnp.float32)
    st = cartesian.init_state(q0)
    des_pos = jnp.array([0.525, -0.28, 0.12], jnp.float32)
    des_quat = jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32)

    step = jax.jit(lambda s: cartesian.step(ctrl_chain, g, s, des_pos, des_quat, DT))
    for _ in range(2000):
        st, q_des, qd_des, qdd_des = step(st)
    xpos, xquat = chain_mod.fk(ctrl_chain, st.q_virt)
    err = np.linalg.norm(np.asarray(xpos[ee]) - np.asarray(des_pos))
    assert err < 5e-3, f"IK did not converge: err={err}"
    # orientation close to [0,1,0,0] up to sign
    dot = abs(float(jnp.dot(xquat[ee], des_quat)))
    assert dot > 0.999


def test_closed_loop_tracking_mujoco_plant():
    """Full torque path against a C-MuJoCo plant."""
    sim_chain = panda.build_sim_chain("rod")
    ctrl_chain = panda.build_control_chain()
    g = gains.CartPosQuatGains()
    jg = gains.JointPDGains()
    model = mujoco.MjModel.from_xml_string(chain_to_mjcf(sim_chain, actuators=True))
    # actuator force ranges from the reference MJCF (panda_rod_invisible.xml:120-133)
    forcerange = np.array([[-87, 87]] * 4 + [[-12, 12]] * 3 + [[-70, 70]] * 2, float)
    data = mujoco.MjData(model)
    data.qpos[:7] = panda.INIT_QPOS
    mujoco.mj_forward(model, data)

    des_pos = jnp.array([0.45, -0.2, 0.25], jnp.float32)
    des_quat = jnp.array([0.0, 1.0, 0.0, 0.0], jnp.float32)

    @jax.jit
    def torque(st, q, qd):
        st, q_des, qd_des, qdd_des = cartesian.step(ctrl_chain, g, st, des_pos, des_quat, DT)
        tau = joint_pd.feedforward_torque(ctrl_chain, jg, q_des, qd_des, qdd_des, q[:7], qd[:7])
        fing = gripper.finger_forces(q[7:], qd[7:], 0.04, False)
        return st, jnp.concatenate([tau, fing])

    st = cartesian.init_state(jnp.array(data.qpos[:7], jnp.float32))
    for i in range(3000):
        q = jnp.array(data.qpos, jnp.float32)
        qd = jnp.array(data.qvel, jnp.float32)
        st, u = torque(st, q, qd)
        u = np.asarray(u, np.float64)
        # gravity compensation from the plant's own bias (RobotBase.preprocessCommand,
        # Robots.py:552-559 + MjRobot.get_command_from_inverse_dynamics qfrc_bias)
        u = u + data.qfrc_bias
        data.ctrl[:] = np.clip(u, forcerange[:, 0], forcerange[:, 1])
        mujoco.mj_step(model, data)

    tcp = model.body("tcp").id
    err = np.linalg.norm(data.xpos[tcp] - np.asarray(des_pos))
    assert err < 0.012, f"EE tracking error {err}"
    # fingers should hold near the commanded width
    assert abs(data.qpos[7] - 0.04) < 0.02
