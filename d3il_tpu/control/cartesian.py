"""Cartesian pos+quat impedance controller (damped-least-squares IK), jitted.

Functional re-derivation of the reference's workhorse controller
(`CartPosQuatImpedenceController.getControl`, d3il_sim/controllers/
IKControllers.py:163-323): a fixed-count (3) damped-least-squares IK loop that
maintains a *virtual* joint trajectory `q_virt` (the reference's `old_q`; with
joint_filter_coefficient == 1.0 the measured joint state only seeds it once),
then hands (q*, qd*, qdd*) to the joint-space tracking controller.

The loop is unrolled under jit; the SVD clamp of J W J^T uses
eigendecomposition of the symmetric 6x6 system (numerically identical to the
reference's SVD on a symmetric PSD matrix). All state is explicit
(`CartImpedanceState`) and batched via vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from d3il_tpu.control.gains import CartPosQuatGains
from d3il_tpu.ops import linalg as linalg_ops
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod
from d3il_tpu.robot.panda import JOINT_POS_MIN, JOINT_POS_MAX


class CartImpedanceState(NamedTuple):
    q_virt: jax.Array        # [7] virtual IK joint positions (reference old_q)
    old_des_vel: jax.Array   # [7] previous commanded joint velocity


def init_state(current_j_pos: jax.Array) -> CartImpedanceState:
    """Seed the virtual trajectory from the measured joints (reference
    IKControllers.py:168-169: old_q is NaN until first use)."""
    return CartImpedanceState(q_virt=current_j_pos,
                              old_des_vel=jnp.zeros_like(current_j_pos))


def _clamped_sym_solve(A: jax.Array, b: jax.Array, lo: float, hi: float):
    """Solve A x = b with A's small eigenvalues regularized up to ~lo.

    Plays the role of IKControllers.py:230-234 (SVD clamp of the symmetric
    PSD system J W J^T + reg I). Implemented as a closed-form Tikhonov solve
    + one refinement step (ops/linalg.clamped_spd_solve) instead of an
    eigendecomposition: XLA's batched 6x6 eigh costs ~7.5 ms on TPU and was
    80% of the entire env-step time; this is a fused handful of 3x3 ops.
    `hi` is unused (the upper clamp never binds for this system — see
    clamped_spd_solve's docstring)."""
    del hi
    return linalg_ops.clamped_spd_solve(A, b, lo)


def step(ctrl_chain, gains: CartPosQuatGains, state: CartImpedanceState,
         des_pos: jax.Array, des_quat: jax.Array, dt: float):
    """One physics-step controller update.

    Returns (new_state, q_des [7], qd_des [7], qdd_des [7]) — the setpoint for
    the joint tracking controller (reference IKControllers.py:303).
    """
    dtype = state.q_virt.dtype
    ee_body = ctrl_chain.body_index("panda_grasptarget")
    jnt_lo = jnp.asarray(JOINT_POS_MIN, dtype)
    jnt_hi = jnp.asarray(JOINT_POS_MAX, dtype)
    pgain = jnp.asarray(np.concatenate([gains.pgain_pos, gains.pgain_quat]), dtype)
    W = jnp.asarray(gains.W, dtype)
    rest = jnp.asarray(gains.rest_posture, dtype)
    pnull = jnp.asarray(gains.pgain_null, dtype)

    q = state.q_virt
    des_quat = quat_ops.normalize(des_quat)
    fk0 = chain_mod.fk(ctrl_chain, q)  # shared: iteration 1 + gate below

    def ik_iter(q, des_quat, fk_cache=None):
        xpos, xquat = chain_mod.fk(ctrl_chain, q) if fk_cache is None \
            else fk_cache
        cur_pos = xpos[ee_body]
        cur_quat = xquat[ee_body]
        # hemisphere alignment (IKControllers.py:204-207 flips des_quat)
        flip = jnp.where(
            jnp.sum((cur_quat - des_quat) ** 2) > jnp.sum((cur_quat + des_quat) ** 2),
            -1.0, 1.0)
        dq = des_quat * flip
        pos_err = jnp.clip(des_pos - cur_pos, -0.01, 0.01)
        quat_err = jnp.clip(quat_ops.quat_error(cur_quat, dq), -0.1, 0.1)
        target = pgain * jnp.concatenate([pos_err, quat_err])  # [6]
        J = chain_mod.point_jacobian(ctrl_chain, q, ee_body,
                                     fk_cache=(xpos, xquat))[:, :7]  # [6,7]
        Jw = J * W[None, :]
        A = Jw @ J.T + gains.J_reg * jnp.eye(6, dtype=dtype)
        qdev_rest = jnp.clip(rest - q, -0.2, 0.2)
        qd_null = pnull * qdev_rest
        y = _clamped_sym_solve(A, target - J @ qd_null,
                               gains.min_svd_values, gains.max_svd_values)
        qd_d = W * (J.T @ y) + qd_null
        nrm = jnp.linalg.norm(qd_d)
        qd_d = jnp.where(nrm > 3.0, qd_d * 3.0 / jnp.maximum(nrm, 1e-9), qd_d)
        q_new = jnp.clip(q + gains.learning_rate * qd_d, jnt_lo, jnt_hi)
        return q_new, dq

    dq = des_quat
    for it in range(gains.num_iter):
        q, dq = ik_iter(q, dq, fk0 if it == 0 else None)

    # Convergence gate: freeze the virtual trajectory once the task error is
    # at the float32 solve-noise floor. Without it, q_virt limit-cycles by
    # ~1e-4 rad per substep (DLS solve jitter), which the finite-difference
    # qdd_des below amplifies by 1/dt^2 into +-200 rad/s^2 — M @ qdd then
    # saturates the +-87 Nm actuators with an alternating-sign dither that
    # makes the arm sag onto the table and walk. (The reference runs this
    # exact math in float64, where the jitter sits ~5 orders lower and the
    # problem never manifests, IKControllers.py:280-281.)
    xpos_f, xquat_f = fk0   # == fk(state.q_virt)
    pos_err_raw = des_pos - xpos_f[ee_body]
    cq = xquat_f[ee_body]
    flip_f = jnp.where(jnp.sum((cq - des_quat) ** 2)
                       > jnp.sum((cq + des_quat) ** 2), -1.0, 1.0)
    quat_err_raw = quat_ops.quat_error(cq, des_quat * flip_f)
    converged = (jnp.linalg.norm(pos_err_raw) < 5e-4) \
        & (jnp.linalg.norm(quat_err_raw) < 5e-3)
    q = jnp.where(converged, state.q_virt, q)

    qd_des = (q - state.q_virt) / dt                      # IKControllers.py:280
    ddg = jnp.asarray(gains.ddgain, dtype)
    qdd_des = ddg * (qd_des - state.old_des_vel) / dt     # IKControllers.py:281
    # physical-band clamp instead of the reference's norm<=10000 (a pure
    # anti-NaN guard): during tracking the solve jitter is the same order as
    # the real per-substep motion, so the unclamped finite-difference qdd is
    # ~50% noise; +-25 rad/s^2 keeps full transient authority (M @ qdd up to
    # ~40 Nm on the heavy joints) while bounding the noise torque well below
    # the actuator limits.
    qdd_des = jnp.clip(qdd_des, -gains.qdd_clip, gains.qdd_clip)
    new_state = CartImpedanceState(q_virt=q, old_des_vel=qd_des)
    return new_state, q, qd_des, qdd_des
