"""Golden tests: scalarized RNEA/CRBA dynamics (engine/dyn_scalar.py) vs the
Jacobian/jvp formulation of robot/chain.py, on both Panda chain models.

The scalarized form is the math the Pallas dynamics kernels run; these tests
pin it (in float64, where truncation can't mask an algorithm error, and in
float32 at kernel precision) before any kernel wraps it.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.engine import dyn_scalar as dsc
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot import panda


def _chains():
    return {
        "ctrl": panda.build_control_chain(),
        "sim_rod": panda.build_sim_chain("rod"),
        "sim_gripper": panda.build_sim_chain("gripper"),
    }


def _rand_qqd(chain, key, n=16):
    kq, kd = jax.random.split(jax.random.PRNGKey(key))
    lo = np.where(np.isfinite(chain.joint_range[:, 0]),
                  np.maximum(chain.joint_range[:, 0], -3.0), -3.0)
    hi = np.where(np.isfinite(chain.joint_range[:, 1]),
                  np.minimum(chain.joint_range[:, 1], 3.0), 3.0)
    q = jax.random.uniform(kq, (n, chain.nv)) * (hi - lo) + lo
    qd = jax.random.normal(kd, (n, chain.nv)) * 1.5
    return q, qd


@pytest.mark.parametrize("name", ["ctrl", "sim_rod", "sim_gripper"])
def test_fk_matches_chain(name):
    chain = _chains()[name]
    q, _ = _rand_qqd(chain, 0)
    xp_ref, xq_ref = jax.vmap(lambda qq: chain_mod.fk(chain, qq))(q)

    def fk_flat(qq):
        xpos, xquat = dsc.fk_s(chain, [qq[i] for i in range(chain.nv)])
        return (jnp.stack([jnp.stack(p) for p in xpos]),
                jnp.stack([jnp.stack(x) for x in xquat]))

    xp, xq = jax.vmap(fk_flat)(q)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xp_ref), atol=1e-5)
    # quaternions defined up to sign per-body; chain.fk composes in a fixed
    # order so signs match exactly
    np.testing.assert_allclose(np.asarray(xq), np.asarray(xq_ref), atol=1e-5)


@pytest.mark.parametrize("name", ["ctrl", "sim_rod", "sim_gripper"])
def test_dynamics_matches_chain(name):
    chain = _chains()[name]
    q, qd = _rand_qqd(chain, 1)
    (xp_r, xq_r), M_ref, bias_ref = jax.vmap(
        lambda a, b: chain_mod.dynamics(chain, a, b))(q, qd)

    nv = chain.nv

    def dyn_flat(qq, qqd):
        xpos, xquat, axes, anchors, M, bias = dsc.dynamics_s(
            chain, [qq[i] for i in range(nv)], [qqd[i] for i in range(nv)])
        Mfull = jnp.stack([jnp.stack([
            M[(i, j)] if (i, j) in M else
            (M[(j, i)] if (j, i) in M else jnp.zeros(()))
            for j in range(nv)]) for i in range(nv)])
        return Mfull, jnp.stack(bias)

    M, bias = jax.vmap(dyn_flat)(q, qd)
    scale = np.abs(np.asarray(M_ref)).max()
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref),
                               atol=2e-4 * scale)
    bscale = max(np.abs(np.asarray(bias_ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(bias), np.asarray(bias_ref),
                               atol=3e-4 * bscale)


@pytest.mark.parametrize("name", ["ctrl", "sim_rod"])
def test_rnea_feedforward_matches_model_feedforward(name):
    from d3il_tpu.control import joint_pd
    chain = _chains()[name]
    q, qd = _rand_qqd(chain, 2)
    qdd = jax.random.normal(jax.random.PRNGKey(7), q.shape) * 3.0
    ref = jax.vmap(lambda a, b, c: joint_pd.model_feedforward(chain, a, b, c)
                   if chain.nv == 7 else
                   chain_mod.dynamics(chain, a, b, gravity=(0., 0., 0.))[1] @ c
                   + chain_mod.dynamics(chain, a, b, gravity=(0., 0., 0.))[2]
                   )(q, qd, qdd)

    nv = chain.nv

    def ff(qq, qqd, qqdd):
        xpos, xquat = dsc.fk_s(chain, [qq[i] for i in range(nv)])
        tau = dsc.rnea_s(chain, xpos, xquat, [qq[i] for i in range(nv)],
                         [qqd[i] for i in range(nv)],
                         [qqdd[i] for i in range(nv)],
                         gravity=(0.0, 0.0, 0.0))
        return jnp.stack(tau)

    out = jax.vmap(ff)(q, qd, qdd)
    scale = max(np.abs(np.asarray(ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4 * scale)


def test_cart_step_matches_cartesian():
    from d3il_tpu.control import cartesian
    from d3il_tpu.control.gains import CartPosQuatGains
    from d3il_tpu.ops import quat as quat_ops
    chain = panda.build_control_chain()
    gains = CartPosQuatGains()
    dt = 1e-3
    n = 8
    kq, kp = jax.random.split(jax.random.PRNGKey(5))
    q0 = jnp.asarray(panda.INIT_QPOS, jnp.float32)[None] \
        + 0.2 * jax.random.normal(kq, (n, 7))
    ov = 0.05 * jax.random.normal(jax.random.PRNGKey(6), (n, 7))
    des_pos = jnp.array([0.5, 0.0, 0.2]) \
        + 0.05 * jax.random.normal(kp, (n, 3))
    des_quat = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0]), (n, 1))

    def ref(q, o, dp):
        st = cartesian.CartImpedanceState(q_virt=q, old_des_vel=o)
        st2, q_des, qd_des, qdd_des = cartesian.step(
            chain, gains, st, dp, des_quat[0], dt)
        return q_des, qd_des, qdd_des

    qr, qdr, qddr = jax.vmap(ref)(q0, ov, des_pos)

    def scalar(q, o, dp):
        dqn = dsc.qnormalize(tuple(des_quat[0][k] for k in range(4)))
        qn, qd, qdd = dsc.cart_step_s(
            chain, gains, [q[i] for i in range(7)], [o[i] for i in range(7)],
            tuple(dp[k] for k in range(3)), dqn, dt)
        return jnp.stack(qn), jnp.stack(qd), jnp.stack(qdd)

    qs, qds, qdds = jax.vmap(scalar)(q0, ov, des_pos)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qds), np.asarray(qdr), atol=2e-2)
    np.testing.assert_allclose(np.asarray(qdds), np.asarray(qddr), atol=2e-1)


def test_chol_solve_and_inverse():
    rng = np.random.default_rng(0)
    for n in (6, 9):
        A = rng.normal(size=(n, n))
        A = A @ A.T + n * np.eye(n)
        b = rng.normal(size=n)
        Md = {(i, j): float(A[i, j]) for i in range(n) for j in range(i, n)}
        x = dsc.chol_solve_s(Md, [float(v) for v in b], n)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-9)
        inv = dsc.spd_inverse_s(Md, n)
        inv_full = np.zeros((n, n))
        for (i, j), v in inv.items():
            inv_full[i, j] = inv_full[j, i] = v
        np.testing.assert_allclose(inv_full, np.linalg.inv(A), atol=1e-9)
