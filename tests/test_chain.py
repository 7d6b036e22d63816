"""Chain kinematics/dynamics vs C-MuJoCo golden models.

Builds MJCF equivalents of the Panda chains and checks FK, Jacobians, the
mass matrix, and bias forces against mujoco.mj_* on random configurations.
"""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot import panda
from d3il_tpu.testing.mjcf_ref import chain_to_mjcf


@pytest.fixture(scope="module")
def ctrl():
    ch = panda.build_control_chain()
    model = mujoco.MjModel.from_xml_string(chain_to_mjcf(ch))
    return ch, model


@pytest.fixture(scope="module")
def sim():
    ch = panda.build_sim_chain("rod")
    model = mujoco.MjModel.from_xml_string(chain_to_mjcf(ch))
    return ch, model


def rand_q(model, n, seed):
    rng = np.random.default_rng(seed)
    lo = np.where(model.jnt_limited, model.jnt_range[:, 0], -1.5)
    hi = np.where(model.jnt_limited, model.jnt_range[:, 1], 1.5)
    return rng.uniform(lo, hi, size=(n, model.nq))


def test_control_chain_fk(ctrl):
    ch, model = ctrl
    data = mujoco.MjData(model)
    gt_body = ch.body_index("panda_grasptarget")
    fk_j = jax.jit(lambda q: chain_mod.fk(ch, q))
    for q in rand_q(model, 8, 0):
        data.qpos[:] = q
        mujoco.mj_kinematics(model, data)
        xpos, xquat = fk_j(jnp.array(q, jnp.float32))
        bid = model.body("panda_grasptarget").id
        np.testing.assert_allclose(np.asarray(xpos[gt_body]), data.xpos[bid], atol=2e-5)
        dot = abs(np.dot(np.asarray(xquat[gt_body]), data.xquat[bid]))
        assert dot > 1 - 1e-5


def test_control_chain_jacobian(ctrl):
    ch, model = ctrl
    data = mujoco.MjData(model)
    gt_body = ch.body_index("panda_grasptarget")
    jac_j = jax.jit(lambda q: chain_mod.point_jacobian(ch, q, gt_body))
    for q in rand_q(model, 5, 1):
        data.qpos[:] = q
        mujoco.mj_kinematics(model, data)
        mujoco.mj_comPos(model, data)
        bid = model.body("panda_grasptarget").id
        jacp = np.zeros((3, model.nv))
        jacr = np.zeros((3, model.nv))
        mujoco.mj_jacBody(model, data, jacp, jacr, bid)
        ours = np.asarray(jac_j(jnp.array(q, jnp.float32)))
        np.testing.assert_allclose(ours[:3], jacp, atol=2e-5)
        np.testing.assert_allclose(ours[3:], jacr, atol=2e-5)


def test_mass_matrix(ctrl):
    ch, model = ctrl
    data = mujoco.MjData(model)
    mm_j = jax.jit(lambda q: chain_mod.mass_matrix(ch, q))
    for q in rand_q(model, 5, 2):
        data.qpos[:] = q
        mujoco.mj_forward(model, data)
        M = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(model, data, M)
        ours = np.asarray(mm_j(jnp.array(q, jnp.float32)))
        np.testing.assert_allclose(ours, M, atol=5e-5, rtol=1e-4)


def test_bias_forces(ctrl):
    ch, model = ctrl
    data = mujoco.MjData(model)
    bias_j = jax.jit(lambda q, qd: chain_mod.bias_forces(ch, q, qd))
    rng = np.random.default_rng(3)
    for q in rand_q(model, 5, 3):
        qd = rng.normal(size=model.nv)
        data.qpos[:] = q
        data.qvel[:] = qd
        mujoco.mj_forward(model, data)
        ours = np.asarray(bias_j(jnp.array(q, jnp.float32), jnp.array(qd, jnp.float32)))
        # qfrc_bias includes passive? no: passive is separate. bias = C+g.
        np.testing.assert_allclose(ours, data.qfrc_bias, atol=1e-3, rtol=1e-4)


def test_sim_chain_fk_tcp(sim):
    ch, model = sim
    data = mujoco.MjData(model)
    tcp = ch.body_index("tcp")
    fk_j = jax.jit(lambda q: chain_mod.fk(ch, q))
    for q in rand_q(model, 6, 4):
        data.qpos[:] = q
        mujoco.mj_kinematics(model, data)
        xpos, xquat = fk_j(jnp.array(q, jnp.float32))
        bid = model.body("tcp").id
        np.testing.assert_allclose(np.asarray(xpos[tcp]), data.xpos[bid], atol=2e-5)
        assert abs(np.dot(np.asarray(xquat[tcp]), data.xquat[bid])) > 1 - 1e-5


def test_sim_chain_bias_9dof(sim):
    ch, model = sim
    assert ch.nv == 9
    data = mujoco.MjData(model)
    bias_j = jax.jit(lambda q, qd: chain_mod.bias_forces(ch, q, qd))
    rng = np.random.default_rng(5)
    for q in rand_q(model, 4, 6):
        qd = rng.normal(size=model.nv) * 0.5
        data.qpos[:] = q
        data.qvel[:] = qd
        mujoco.mj_forward(model, data)
        ours = np.asarray(bias_j(jnp.array(q, jnp.float32), jnp.array(qd, jnp.float32)))
        np.testing.assert_allclose(ours, data.qfrc_bias, atol=1e-3, rtol=1e-4)


def test_init_ee_pose_matches_reference_start():
    """At the IK'd start pose the tcp should sit near init_end_eff_pos with
    quat ~ [0,1,0,0] (reference pushing.py start sequence)."""
    ch = panda.build_sim_chain("rod")
    q = jnp.concatenate([jnp.array(panda.INIT_QPOS, jnp.float32), jnp.zeros(2, jnp.float32)])
    xpos, xquat = chain_mod.fk(ch, q)
    tcp = ch.body_index("tcp")
    pos = np.asarray(xpos[tcp])
    # default init qpos corresponds roughly to EE [0.52, 0, ~0.2]
    assert abs(pos[0] - 0.52) < 0.15 and abs(pos[1]) < 0.05
    quat = np.asarray(xquat[tcp])
    assert abs(abs(quat[1]) - 1) < 0.1  # x-dominant: flipped down
