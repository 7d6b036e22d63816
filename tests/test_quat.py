"""Quaternion ops vs MuJoCo's mju_* reference implementations."""
import mujoco
import numpy as np
import jax.numpy as jnp
import pytest

from d3il_tpu.ops import quat


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_matches_mujoco():
    qa, qb = rand_quats(32, 1), rand_quats(32, 2)
    got = np.asarray(quat.mul(jnp.array(qa), jnp.array(qb)))
    for i in range(32):
        want = np.zeros(4)
        mujoco.mju_mulQuat(want, qa[i], qb[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_rotate_matches_mujoco():
    q = rand_quats(32, 3)
    rng = np.random.default_rng(4)
    v = rng.normal(size=(32, 3))
    got = np.asarray(quat.rotate(jnp.array(q), jnp.array(v)))
    for i in range(32):
        want = np.zeros(3)
        mujoco.mju_rotVecQuat(want, v[i], q[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_to_mat_from_mat_roundtrip():
    q = rand_quats(64, 5)
    m = np.asarray(quat.to_mat(jnp.array(q)))
    for i in range(64):
        want = np.zeros(9)
        mujoco.mju_quat2Mat(want, q[i])
        np.testing.assert_allclose(m[i].ravel(), want, atol=1e-6)
    q2 = np.asarray(quat.from_mat(jnp.array(m)))
    # same rotation up to sign
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_integrate_matches_mujoco():
    q = rand_quats(16, 6)
    rng = np.random.default_rng(7)
    w = rng.normal(size=(16, 3)) * 3.0
    dt = 0.01
    got = np.asarray(quat.integrate(jnp.array(q), jnp.array(w), dt))
    for i in range(16):
        want = q[i].copy()
        mujoco.mju_quatIntegrate(want, w[i], dt)
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_euler_roundtrip_yaw():
    # reference env obs encode yaw = quat2euler(q)[-1]; check pure-z case
    yaws = np.linspace(-np.pi + 0.1, np.pi - 0.1, 21)
    e = np.stack([np.zeros_like(yaws), np.zeros_like(yaws), yaws], axis=-1)
    q = np.asarray(quat.from_euler(jnp.array(e)))
    # pure z rotation -> [cos(y/2), 0, 0, sin(y/2)]
    np.testing.assert_allclose(q[:, 0], np.cos(yaws / 2), atol=1e-6)
    np.testing.assert_allclose(q[:, 3], np.sin(yaws / 2), atol=1e-6)
    back = np.asarray(quat.to_euler(jnp.array(q)))
    np.testing.assert_allclose(back[:, 2], yaws, atol=1e-5)


def test_quat_error_zero_when_equal():
    q = rand_quats(8, 8)
    err = np.asarray(quat.quat_error(jnp.array(q), jnp.array(q)))
    np.testing.assert_allclose(err, 0.0, atol=1e-7)


def test_quat_error_matches_reference_formula():
    qa, qb = rand_quats(16, 9), rand_quats(16, 10)
    got = np.asarray(quat.quat_error(jnp.array(qa), jnp.array(qb)))
    for i in range(16):
        c, d = qa[i], qb[i]
        want = np.array(
            [
                c[0] * d[1] - d[0] * c[1] - c[3] * d[2] + c[2] * d[3],
                c[0] * d[2] - d[0] * c[2] + c[3] * d[1] - c[1] * d[3],
                c[0] * d[3] - d[0] * c[3] - c[2] * d[1] + c[1] * d[2],
            ]
        )
        np.testing.assert_allclose(got[i], want, atol=1e-6)
