"""Pallas TPU kernels for the arm dynamics + control stages of a substep.

docs/PERF.md round-4 attribution: at B=1024 the 35-substep window spends
~22.7 ms in the sim-model dynamics (jvp through body Jacobians), ~20 ms in
the control-model feedforward and ~20 ms in Minv/PD/integrate glue — all
bandwidth-bound on HBM-materialized einsum intermediates, while the contact
cone QP (the most FLOPs) runs in 7.3 ms inside its Pallas kernel. These
kernels move the rest of the per-substep arm math into VMEM the same way.

Layout: one (8, 128) float32 VPU tile per *scalar component* — the batch is
the only array dimension, bodies/dofs/coordinates are unrolled Python loops
over engine/dyn_scalar.py's tuple algebra, and all chain constants fold into
immediates at trace time (Pallas kernels cannot capture array constants, so
scalarization doubles as the legalization strategy). Grid: (ceil(B/1024),)
batch tiles; tiles never interact.

Kernels:
  * arm_stage   — FK + RNEA bias + CRBA mass matrix + joint PD + finger
                  force law + actuator clamp + (M + h D)^-1 + smooth
                  accelerations, i.e. everything between "read scene state"
                  and "narrow phase" in engine/substep_bm.physics_substep_bm.
  * feedforward — M(q_des) qdd + C(q_des, qd_des) on the URDF control chain
                  (joint_pd.model_feedforward) as one RNEA pass.

Golden-tested against the jnp batch-minor pipeline in
tests/test_dyn_kernel.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3il_tpu.engine import dyn_scalar as dsc

LANES = 1024          # batch tile: 8 sublanes x 128 lanes
_SUB = 8


def _tile(interpret):
    """(lanes_per_tile, sublanes, lane_width). Interpreter mode (CPU CI) has
    no (8, 128) constraint; a minimal tile keeps tests fast."""
    return (8, 1, 8) if interpret else (LANES, _SUB, 128)


def _pad_bm(x, B, Bp, lw):
    """[..., B] -> [..., Bp//lw, lw] (pad, fold batch into sublane+lane)."""
    x = jnp.asarray(x, jnp.float32)
    if Bp != B:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)])
    return x.reshape(x.shape[:-1] + (Bp // lw, lw))


def _unpad_bm(x, B):
    """[..., S, 128] -> [..., B]."""
    return x.reshape(x.shape[:-2] + (-1,))[..., :B]


def _in_spec(shape_prefix, sub, lw):
    nd = len(shape_prefix)
    return pl.BlockSpec(tuple(shape_prefix) + (sub, lw),
                        lambda i, _nd=nd: (0,) * _nd + (i, 0),
                        memory_space=pltpu.VMEM)


def _out_spec(shape_prefix, sub, lw):
    return _in_spec(shape_prefix, sub, lw)


def _clip(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def _stack(rows, tile_shape):
    """Stack scalar components into an array, materializing constant-folded
    Python floats as full tiles (dyn_scalar folds e.g. the root body's pose
    to plain floats)."""
    def mat(x):
        if isinstance(x, (int, float)):
            return jnp.full(tile_shape, x, jnp.float32)
        return x

    def rec(r):
        if isinstance(r, (list, tuple)):
            return jnp.stack([rec(x) for x in r])
        return mat(r)

    return rec(rows)


# ---------------------------------------------------------------------------
# arm stage kernel
# ---------------------------------------------------------------------------

def _make_arm_kernel(scene, pd_gains):
    robot = scene.robot
    nv = robot.nv                      # 9
    nb = robot.nb
    h = float(scene.dt)
    gravity = tuple(float(v) for v in scene.gravity)
    pg = [float(v) for v in pd_gains.pgain]
    dg = [float(v) for v in pd_gains.dgain]
    D = [float(v) for v in robot.joint_damping]
    fr = np.asarray(scene.forcerange, np.float64)
    PG, DG = 500.0, 10.0               # gripper law (control/gripper.py)

    def kernel(q_r, qd_r, qdes_r, qddes_r, taum_r, sw_r, gf_r,
               xpos_o, xquat_o, axes_o, anch_o, minv_o, qdpre_o, aarm_o):
        q = [q_r[i] for i in range(nv)]
        qd = [qd_r[i] for i in range(nv)]
        q_des = [qdes_r[i] for i in range(7)]
        qd_des = [qddes_r[i] for i in range(7)]
        tau_m = [taum_r[i] for i in range(7)]
        sw = sw_r[...]
        gf = gf_r[...]

        xpos, xquat, axes, anchors, M, bias = dsc.dynamics_s(
            robot, q, qd, gravity)

        # joint PD + feedforward + gravity comp (envs/common.physics_substep)
        ctrl = [pg[i] * (q_des[i] - q[i]) + dg[i] * (qd_des[i] - qd[i])
                + tau_m[i] + bias[i] for i in range(7)]
        # finger force law (control/gripper.finger_forces)
        mean_pos = 0.5 * (q[7] + q[8])
        wide = (mean_pos - sw) > 0.005
        for k in (7, 8):
            force = PG * (mean_pos - q[k])
            brake = 200.0 * jnp.maximum(-(qd[k] + 0.2), 0.0)
            grasp = jnp.minimum(-20.0 + brake, 0.0)
            close_servo = DG * (-0.2 - qd[k])
            pd = _clip(PG * (sw - q[k]) - DG * qd[k], -5.0, 5.0)
            f2 = jnp.where(wide, jnp.where(gf > 0.5, grasp, close_servo), pd)
            ctrl.append(force + f2)
        tau_c = [_clip(ctrl[i], float(fr[i, 0]), float(fr[i, 1]))
                 for i in range(nv)]
        f_arm = [tau_c[i] - bias[i] for i in range(nv)]

        # (M + h D)^-1, smooth acceleration, pre-contact velocity update
        Mh = dict(M)
        for i in range(nv):
            Mh[(i, i)] = Mh[(i, i)] + h * D[i]
        Minv = dsc.spd_inverse_s(Mh, nv)
        a_arm = dsc.matvec_sym_s(Minv, f_arm, nv)
        Mqd = dsc.matvec_sym_s(M, qd, nv)
        rhs = [Mqd[i] + h * f_arm[i] for i in range(nv)]
        qd_pre = dsc.matvec_sym_s(Minv, rhs, nv)

        ts = sw.shape
        xpos_o[...] = _stack(xpos, ts)
        xquat_o[...] = _stack(xquat, ts)
        axes_o[...] = _stack(axes, ts)
        anch_o[...] = _stack(anchors, ts)
        minv_o[...] = _stack([[Minv[(i, j)] if i <= j else Minv[(j, i)]
                               for j in range(nv)] for i in range(nv)], ts)
        qdpre_o[...] = _stack(qd_pre, ts)
        aarm_o[...] = _stack(a_arm, ts)

    return kernel, nb, nv


def arm_stage_bm(scene, pd_gains, q, qd, q_des, qd_des, tau_model,
                 set_width, grasp_flag, interpret=False):
    """Batch-minor arm stage. Inputs [., B]; set_width/grasp_flag [B].

    Returns (xpos [nb,3,B], xquat [nb,4,B], axes [nv,3,B], anchors [nv,3,B],
    Minv [nv,nv,B], qd_pre [nv,B], a_arm [nv,B]) where qd_pre is the
    contact-free velocity update (M+hD)^-1 (M qd + h (tau - bias)) and
    a_arm = (M+hD)^-1 (tau - bias)."""
    B = q.shape[-1]
    lanes, sub, lw = _tile(interpret)
    Bp = -(-B // lanes) * lanes
    kernel, nb, nv = _make_arm_kernel(scene, pd_gains)
    gf = jnp.asarray(grasp_flag)
    if gf.dtype == jnp.bool_:
        gf = gf.astype(jnp.float32)
    ins = [_pad_bm(a, B, Bp, lw) for a in
           (q, qd, q_des, qd_des, tau_model, set_width, gf)]
    pre = [(nv,), (nv,), (7,), (7,), (7,), (), ()]
    in_specs = [_in_spec(p, sub, lw) for p in pre]
    S = Bp // lw
    out_pre = [(nb, 3), (nb, 4), (nv, 3), (nv, 3), (nv, nv), (nv,), (nv,)]
    out_shapes = [jax.ShapeDtypeStruct(p + (S, lw), jnp.float32)
                  for p in out_pre]
    out_specs = [_out_spec(p, sub, lw) for p in out_pre]
    outs = pl.pallas_call(
        kernel, grid=(Bp // lanes,), in_specs=in_specs,
        out_shape=tuple(out_shapes), out_specs=tuple(out_specs),
        interpret=interpret,
    )(*ins)
    return tuple(_unpad_bm(o, B) for o in outs)


# ---------------------------------------------------------------------------
# IK window kernel: the whole n_substeps controller trajectory + feedforward
# ---------------------------------------------------------------------------

def _make_ik_window_kernel(ctrl_chain, gains, n_sub, dt):
    def kernel(qv_r, ov_r, dp_r, dq_r,
               qvf_o, ovf_o, qdes_o, qddes_o, tau_o):
        ts = qv_r[0].shape
        des_pos = tuple(dp_r[k] for k in range(3))
        des_quat = dsc.qnormalize(tuple(dq_r[k] for k in range(4)))

        def body(i, carry):
            q_virt = list(carry[:7])
            old_vel = list(carry[7:])
            q_new, qd_des, qdd_des = dsc.cart_step_s(
                ctrl_chain, gains, q_virt, old_vel, des_pos, des_quat, dt)
            xpos, xquat = dsc.fk_s(ctrl_chain, q_new)
            tau = dsc.rnea_s(ctrl_chain, xpos, xquat, q_new, qd_des, qdd_des,
                             gravity=(0.0, 0.0, 0.0))
            qdes_o[pl.ds(i, 1)] = _stack(q_new, ts)[None]
            qddes_o[pl.ds(i, 1)] = _stack(qd_des, ts)[None]
            tau_o[pl.ds(i, 1)] = _stack(tau, ts)[None]
            return tuple(q_new) + tuple(qd_des)

        carry = tuple(qv_r[i] for i in range(7)) \
            + tuple(ov_r[i] for i in range(7))
        carry = jax.lax.fori_loop(0, n_sub, body, carry)
        qvf_o[...] = jnp.stack(carry[:7])
        ovf_o[...] = jnp.stack(carry[7:])

    return kernel


def ik_window_bm(ctrl_chain, gains, n_sub, dt, q_virt, old_vel, des_pos,
                 des_quat, interpret=False):
    """Whole-substep-window cartesian DLS-IK + model feedforward.

    Inputs [7, B] / [3, B] / [4, B]. Returns (q_virt' [7,B], old_vel' [7,B],
    q_des_w [n_sub,7,B], qd_des_w [n_sub,7,B], tau_model_w [n_sub,7,B]) —
    the hoisted-IK trajectory of envs.common.ik_trajectory plus
    joint_pd.model_feedforward, one kernel for the whole window."""
    B = q_virt.shape[-1]
    lanes, sub, lw = _tile(interpret)
    Bp = -(-B // lanes) * lanes
    kernel = _make_ik_window_kernel(ctrl_chain, gains, n_sub, float(dt))
    ins = [_pad_bm(a, B, Bp, lw) for a in (q_virt, old_vel, des_pos, des_quat)]
    in_specs = [_in_spec(p, sub, lw) for p in [(7,), (7,), (3,), (4,)]]
    S = Bp // lw
    out_pre = [(7,), (7,), (n_sub, 7), (n_sub, 7), (n_sub, 7)]
    out_shapes = [jax.ShapeDtypeStruct(p + (S, lw), jnp.float32)
                  for p in out_pre]
    out_specs = [_out_spec(p, sub, lw) for p in out_pre]
    outs = pl.pallas_call(
        kernel, grid=(Bp // lanes,), in_specs=in_specs,
        out_shape=tuple(out_shapes), out_specs=tuple(out_specs),
        interpret=interpret,
    )(*ins)
    return tuple(_unpad_bm(o, B) for o in outs)


# ---------------------------------------------------------------------------
# control-model feedforward kernel
# ---------------------------------------------------------------------------

def _make_ff_kernel(ctrl_chain):
    nv = ctrl_chain.nv                 # 7

    def kernel(q_r, qd_r, qdd_r, tau_o):
        q = [q_r[i] for i in range(nv)]
        qd = [qd_r[i] for i in range(nv)]
        qdd = [qdd_r[i] for i in range(nv)]
        xpos, xquat = dsc.fk_s(ctrl_chain, q)
        tau = dsc.rnea_s(ctrl_chain, xpos, xquat, q, qd, qdd,
                         gravity=(0.0, 0.0, 0.0))
        tau_o[...] = _stack(tau, q[0].shape)

    return kernel, nv


def feedforward_bm(ctrl_chain, q_des, qd_des, qdd_des, interpret=False):
    """M(q_des) qdd + C(q_des, qd_des) [nv, B] (joint_pd.model_feedforward)."""
    B = q_des.shape[-1]
    lanes, sub, lw = _tile(interpret)
    Bp = -(-B // lanes) * lanes
    kernel, nv = _make_ff_kernel(ctrl_chain)
    ins = [_pad_bm(a, B, Bp, lw) for a in (q_des, qd_des, qdd_des)]
    S = Bp // lw
    out = pl.pallas_call(
        kernel, grid=(Bp // lanes,),
        in_specs=[_in_spec((nv,), sub, lw)] * 3,
        out_shape=jax.ShapeDtypeStruct((nv, S, lw), jnp.float32),
        out_specs=_out_spec((nv,), sub, lw),
        interpret=interpret,
    )(*ins)
    return _unpad_bm(out, B)
