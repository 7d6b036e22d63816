"""Whole-substep batch-minor pipeline (docs/PERF.md lever 2).

Under ``jax.vmap`` the control + dynamics chain (FK, DLS-IK, PD feedforward,
mass/bias, integration) runs batch-major: every intermediate is
``[B, 13, 3]`` / ``[B, 9, 9]``-shaped, and the TPU tiles the two MINOR dims
to (8, 128) — a 3-wide lane dim wastes ~40x of every vector op's bandwidth.
The contact phase already escapes this through its batch-minor Pallas kernel
(engine/contact_kernel.py); this module extends the same ``[..., B]`` layout
to the ENTIRE 35-substep window, registered as the
``jax.custom_batching.custom_vmap`` rule of ``envs.common.run_substeps`` so
``jax.vmap(env.step)`` transparently executes it on TPU.

Everything here is plain jnp (XLA tiles trailing-``B`` arrays onto full
(8, 128) vectors by itself); only the contact cone QP stays a hand-written
kernel. Math is a 1:1 port of the per-env modules it shadows —
``robot/chain.py``, ``control/cartesian.py``, ``control/joint_pd.py``,
``control/gripper.py``, ``engine/step.py`` — and is golden-tested against
``jax.vmap`` of those originals (tests/test_substep_bm.py).

Shape conventions: batch is ALWAYS the trailing axis. ``q [nv, B]``,
quaternions ``[..., 4, B]`` (wxyz on axis -2), vectors ``[..., 3, B]``,
matrices ``[n, m, B]``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.robot.chain import HINGE, SLIDE


# ---------------------------------------------------------------------------
# quaternion algebra, component axis -2, batch axis -1 (ops/quat.py port)
# ---------------------------------------------------------------------------

def qparts(q):
    return q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]


def qmul(p, q):
    w0, x0, y0, z0 = qparts(p)
    w1, x1, y1, z1 = qparts(q)
    return jnp.stack([
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
    ], axis=-2)


def vcross(a, b):
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([ay * bz - az * by, az * bx - ax * bz,
                      ax * by - ay * bx], axis=-2)


def qrot(q, v):
    """Rotate [..., 3, B] vectors by [..., 4, B] quaternions."""
    qv = q[..., 1:, :]
    qw = q[..., :1, :]
    t = 2.0 * vcross(qv, v)
    return v + qw * t + vcross(qv, t)


def qnormalize(q, eps=1e-12):
    n = jnp.sqrt((q * q).sum(axis=-2, keepdims=True))
    return q / jnp.maximum(n, eps)


def qfrom_axis_angle(axis, angle):
    """axis [..., 3, B] (unit), angle [..., B] -> [..., 4, B]."""
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half)[..., None, :],
                            axis * jnp.sin(half)[..., None, :]], axis=-2)


def qtomat(q):
    """[..., 4, B] -> [..., 3, 3, B] (normalizing first, like quat.to_mat)."""
    q = qnormalize(q)
    w, x, y, z = qparts(q)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-2)
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-2)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-2)
    return jnp.stack([r0, r1, r2], axis=-3)


def qerror(curr, des):
    """Orientation error (quat.quat_error port): [..., 3, B]."""
    wc, vc = curr[..., :1, :], curr[..., 1:, :]
    wd, vd = des[..., :1, :], des[..., 1:, :]
    return wc * vd - wd * vc - vcross(vd, vc)


def qintegrate(q, omega, dt):
    """Body-local exponential-map integration (quat.integrate port)."""
    angle = jnp.sqrt((omega * omega).sum(axis=-2, keepdims=True))
    half = 0.5 * dt * angle
    k = jnp.where(angle > 1e-9, jnp.sin(half) / jnp.maximum(angle, 1e-9),
                  0.5 * dt)
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-2)
    return qnormalize(qmul(q, dq))


# ---------------------------------------------------------------------------
# small-SPD linear algebra, batch-minor (ops/linalg.py port)
# ---------------------------------------------------------------------------

def chol_bm(A):
    """Unrolled Cholesky of [n, n, B] SPD matrices -> lower [n, n, B]."""
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    z = jnp.zeros_like(A[0, 0])
    return jnp.stack([jnp.stack([L[i][j] if j <= i else z
                                 for j in range(n)], axis=0)
                      for i in range(n)], axis=0)


def chol_solve_vec_bm(L, b):
    """Solve (L L^T) x = b for b [n, B] given chol factor L [n, n, B]."""
    n = L.shape[0]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i, k] * y[k]
        y[i] = s / L[i, i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k, i] * x[k]
        x[i] = s / L[i, i]
    return jnp.stack(x, axis=0)


def inv_spd_bm(A):
    """[n, n, B] SPD inverse via Cholesky + substitution against I."""
    n = A.shape[0]
    L = chol_bm(A)
    cols = [chol_solve_vec_bm(
        L, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype)[:, j, None], A.shape[1:]))
        for j in range(n)]
    X = jnp.stack(cols, axis=1)            # [n, n, B]
    return 0.5 * (X + jnp.swapaxes(X, 0, 1))


def clamped_spd_solve_bm(A, b, lo):
    """ops/linalg.clamped_spd_solve port: Tikhonov + one refinement step."""
    n = A.shape[0]
    L = chol_bm(A + lo * jnp.eye(n, dtype=A.dtype)[..., None])
    x0 = chol_solve_vec_bm(L, b)
    return x0 + lo * chol_solve_vec_bm(L, x0)


# ---------------------------------------------------------------------------
# chain kinematics + dynamics, batch-minor (robot/chain.py port)
# ---------------------------------------------------------------------------

def _fk_doubling_meta(chain):
    nb = chain.nb
    par = np.where(chain.parent < 0, nb, chain.parent)
    par = np.append(par, nb).astype(np.int32)
    levels = []
    while np.any(par[:nb] != nb):
        levels.append(par.copy())
        par = par[par]
    return levels


def fk_bm(chain, q):
    """q [nv, B] -> (xpos [nb, 3, B], xquat [nb, 4, B]). chain.fk port."""
    dtype = q.dtype
    nb = chain.nb
    B = q.shape[-1]
    bq = jnp.asarray(chain.body_quat, dtype)[..., None]      # [nb,4,1]
    bp = jnp.asarray(chain.body_pos, dtype)[..., None]
    axis = jnp.asarray(chain.joint_axis, dtype)[..., None]
    anchor = jnp.asarray(chain.joint_pos, dtype)[..., None]
    is_hinge = jnp.asarray(chain.joint_type == HINGE, dtype)[:, None]  # [nb,1]
    is_slide = jnp.asarray(chain.joint_type == SLIDE, dtype)[:, None]
    qdof = q[np.maximum(chain.body_dof, 0)]                  # [nb, B]

    theta = is_hinge * qdof
    jq = qfrom_axis_angle(jnp.broadcast_to(axis, (nb, 3, B)), theta)
    lq = qmul(jnp.broadcast_to(bq, (nb, 4, B)), jq)
    lp = (bp + qrot(bq, jnp.broadcast_to(anchor, (nb, 3, B)))
          - qrot(lq, jnp.broadcast_to(anchor, (nb, 3, B)))
          + qrot(bq, jnp.broadcast_to(axis, (nb, 3, B)))
          * (is_slide * qdof)[:, None, :])

    ident = jnp.concatenate([jnp.ones((1, 1, B), dtype),
                             jnp.zeros((1, 3, B), dtype)], axis=1)
    xq = jnp.concatenate([lq, ident])
    xp = jnp.concatenate([lp, jnp.zeros((1, 3, B), dtype)])
    for par in _fk_doubling_meta(chain):
        pq, pp = xq[par], xp[par]
        xq = qmul(pq, xq)
        xp = pp + qrot(pq, xp)
    return xp[:nb], xq[:nb]


def _dof_frames_bm(chain, xpos, xquat):
    dtype = xpos.dtype
    bi = chain.dof_body
    qb, pb = xquat[bi], xpos[bi]
    nv = len(bi)
    B = xpos.shape[-1]
    jaxis = jnp.broadcast_to(
        jnp.asarray(chain.joint_axis[bi], dtype)[..., None], (nv, 3, B))
    jpos = jnp.broadcast_to(
        jnp.asarray(chain.joint_pos[bi], dtype)[..., None], (nv, 3, B))
    axes = qrot(qb, jaxis)
    anchors = pb + qrot(qb, jpos)
    return axes, anchors


def point_jacobian_bm(chain, body, fk_cache):
    """[6, nv, B] geometric Jacobian of body-frame origin (chain port)."""
    xpos, xquat = fk_cache
    dtype = xpos.dtype
    point = xpos[body]                                        # [3, B]
    axes, anchors = _dof_frames_bm(chain, xpos, xquat)        # [nv,3,B]
    mask = jnp.asarray(chain.ancestor_mask[body], dtype)[:, None, None]
    is_hinge = jnp.asarray(
        (chain.joint_type[chain.dof_body] == HINGE).astype(np.float64),
        dtype)[:, None, None]
    jp_h = vcross(axes, point[None] - anchors)                # [nv,3,B]
    jp = (mask * (is_hinge * jp_h + (1 - is_hinge) * axes))[..., :]
    jr = mask * is_hinge * axes
    return jnp.concatenate([jnp.swapaxes(jp, 0, 1),
                            jnp.swapaxes(jr, 0, 1)], axis=0)  # [6, nv, B]


def _body_jacobians_bm(chain, q):
    """COM Jacobians [nb, 3, nv, B] (+ fk data), chain._body_jacobians port."""
    xpos, xquat = fk_bm(chain, q)
    dtype = q.dtype
    nb, B = chain.nb, q.shape[-1]
    com = jnp.broadcast_to(
        jnp.asarray(chain.com, dtype)[..., None], (nb, 3, B))
    coms = xpos + qrot(xquat, com)
    axes, anchors = _dof_frames_bm(chain, xpos, xquat)        # [nv,3,B]
    mask = jnp.asarray(chain.ancestor_mask, dtype)[:, :, None, None]
    is_hinge = jnp.asarray(
        (chain.joint_type[chain.dof_body] == HINGE).astype(np.float64),
        dtype)[:, None, None]
    diff = coms[:, None] - anchors[None]                      # [nb,nv,3,B]
    jp_h = vcross(jnp.broadcast_to(axes[None], diff.shape), diff)
    jp = mask * (is_hinge[None] * jp_h + (1 - is_hinge)[None] * axes[None])
    jr = mask * is_hinge[None] * axes[None]                   # [nb,nv,3,B]
    return (jnp.swapaxes(jp, 1, 2), jnp.swapaxes(jr, 1, 2),
            (xpos, xquat, coms))


def _world_inertias_bm(chain, xquat):
    R = qtomat(xquat)                                         # [nb,3,3,B]
    I_b = jnp.asarray(chain.inertia, xquat.dtype)             # [nb,3,3]
    return jnp.einsum("bijn,bjk,blkn->biln", R, I_b, R)


def dynamics_bm(chain, q, qd, gravity=(0.0, 0.0, -9.81)):
    """chain.dynamics port: ((xpos, xquat), M [nv,nv,B], bias [nv,B])."""
    dtype = q.dtype
    g = jnp.asarray(gravity, dtype)
    m = jnp.asarray(chain.mass, dtype)

    def jac_pose(qq):
        jp, jr, (xpos, xquat, coms) = _body_jacobians_bm(chain, qq)
        return jp, jr, xpos, xquat

    (jp, jr, xpos, xquat), (djp, djr, _, _) = jax.jvp(jac_pose, (q,), (qd,))
    Iw = _world_inertias_bm(chain, xquat)
    M = (jnp.einsum("bikn,b,biln->kln", jp, m, jp)
         + jnp.einsum("bikn,bijn,bjln->kln", jr, Iw, jr))
    w = jnp.einsum("bikn,kn->bin", jr, qd)
    a_bias = jnp.einsum("bikn,kn->bin", djp, qd)
    alpha_bias = jnp.einsum("bikn,kn->bin", djr, qd)
    f_lin = m[:, None, None] * (a_bias - g[None, :, None])
    f_ang = jnp.einsum("bijn,bjn->bin", Iw, alpha_bias) + vcross(
        w, jnp.einsum("bijn,bjn->bin", Iw, w))
    bias = (jnp.einsum("bikn,bin->kn", jp, f_lin)
            + jnp.einsum("bikn,bin->kn", jr, f_ang))
    return (xpos, xquat), M, bias


def model_feedforward_bm(ctrl_chain, q_des, qd_des, qdd_des):
    """joint_pd.model_feedforward port: M(q_des) qdd + C(q_des, qd_des)."""
    _, M, cor = dynamics_bm(ctrl_chain, q_des, qd_des,
                            gravity=(0.0, 0.0, 0.0))
    return jnp.einsum("ijn,jn->in", M, qdd_des) + cor


# ---------------------------------------------------------------------------
# cartesian DLS-IK impedance controller (control/cartesian.py port)
# ---------------------------------------------------------------------------

def cartesian_step_bm(ctrl_chain, gains, q_virt, old_des_vel, des_pos,
                      des_quat, dt):
    """control/cartesian.step port on [7, B] / [3, B] / [4, B] arrays.

    Returns (q_virt', old_des_vel', q_des, qd_des, qdd_des)."""
    from d3il_tpu.robot.panda import JOINT_POS_MIN, JOINT_POS_MAX
    dtype = q_virt.dtype
    ee = ctrl_chain.body_index("panda_grasptarget")
    jnt_lo = jnp.asarray(JOINT_POS_MIN, dtype)[:, None]
    jnt_hi = jnp.asarray(JOINT_POS_MAX, dtype)[:, None]
    pgain = jnp.asarray(np.concatenate([gains.pgain_pos, gains.pgain_quat]),
                        dtype)[:, None]
    W = jnp.asarray(gains.W, dtype)[:, None]
    rest = jnp.asarray(gains.rest_posture, dtype)[:, None]
    pnull = jnp.asarray(gains.pgain_null, dtype)[:, None]

    q = q_virt
    des_quat = qnormalize(des_quat)
    fk0 = fk_bm(ctrl_chain, q)   # shared: iteration 1 + convergence gate

    def ik_iter(q, dq_in, fk_cache=None):
        if fk_cache is None:
            fk_cache = fk_bm(ctrl_chain, q)
        xpos, xquat = fk_cache
        cur_pos, cur_quat = xpos[ee], xquat[ee]
        flip = jnp.where(
            ((cur_quat - dq_in) ** 2).sum(0) > ((cur_quat + dq_in) ** 2).sum(0),
            -1.0, 1.0)
        dq = dq_in * flip[None]
        pos_err = jnp.clip(des_pos - cur_pos, -0.01, 0.01)
        quat_err = jnp.clip(qerror(cur_quat, dq), -0.1, 0.1)
        target = pgain * jnp.concatenate([pos_err, quat_err])  # [6, B]
        J = point_jacobian_bm(ctrl_chain, ee, fk_cache)[:, :7]  # [6,7,B]
        Jw = J * W[None]
        A = (jnp.einsum("ikn,jkn->ijn", Jw, J)
             + gains.J_reg * jnp.eye(6, dtype=dtype)[..., None])
        qdev_rest = jnp.clip(rest - q, -0.2, 0.2)
        qd_null = pnull * qdev_rest
        rhs = target - jnp.einsum("ikn,kn->in", J, qd_null)
        y = clamped_spd_solve_bm(A, rhs, gains.min_svd_values)
        qd_d = W * jnp.einsum("ikn,in->kn", J, y) + qd_null
        nrm = jnp.sqrt((qd_d * qd_d).sum(0))
        qd_d = jnp.where(nrm[None] > 3.0,
                         qd_d * 3.0 / jnp.maximum(nrm[None], 1e-9), qd_d)
        return jnp.clip(q + gains.learning_rate * qd_d, jnt_lo, jnt_hi), dq

    dq = des_quat
    for it in range(gains.num_iter):
        q, dq = ik_iter(q, dq, fk0 if it == 0 else None)

    # convergence gate (cartesian.py:105-121); fk(q_virt) == iteration 1's fk
    xpos_f, xquat_f = fk0
    pos_err_raw = des_pos - xpos_f[ee]
    cq = xquat_f[ee]
    flip_f = jnp.where(((cq - des_quat) ** 2).sum(0)
                       > ((cq + des_quat) ** 2).sum(0), -1.0, 1.0)
    quat_err_raw = qerror(cq, des_quat * flip_f[None])
    converged = ((jnp.sqrt((pos_err_raw ** 2).sum(0)) < 5e-4)
                 & (jnp.sqrt((quat_err_raw ** 2).sum(0)) < 5e-3))
    q = jnp.where(converged[None], q_virt, q)

    qd_des = (q - q_virt) / dt
    ddg = jnp.asarray(gains.ddgain, dtype)[:, None]
    qdd_des = jnp.clip(ddg * (qd_des - old_des_vel) / dt, -25.0, 25.0)
    return q, qd_des, q, qd_des, qdd_des


# ---------------------------------------------------------------------------
# narrow phase (vmapped per-env colliders + transposes; see module docstring)
# ---------------------------------------------------------------------------

def narrow_phase_bm(scene, xpos_bm, xquat_bm, free_pos_bm, free_quat_bm):
    """Contacts in batch-minor layout via the per-env colliders.

    The collider math is small relative to the solve; it runs batch-major
    under vmap and only the (tiny) outputs are transposed. Returns
    (pts [ncon,3,B], normal [ncon,3,B], depth [ncon,B])."""
    from d3il_tpu.engine import step as estep

    xp = jnp.moveaxis(xpos_bm, -1, 0)       # [B, nb, 3]
    xq = jnp.moveaxis(xquat_bm, -1, 0)
    fp = jnp.moveaxis(free_pos_bm, -1, 0)   # [B, nf, 3]
    fq = jnp.moveaxis(free_quat_bm, -1, 0)

    def one(xpi, xqi, fpi, fqi):
        state = estep.SceneState(
            q=jnp.zeros(scene.robot.nv, xpi.dtype), qd=None, free_pos=fpi,
            free_quat=fqi, free_linvel=None, free_angvel=None, warm=None)
        c, _ = estep._contact_rows(scene, state, (xpi, xqi))
        return c.pos, c.normal, c.depth

    pos, nrm, dep = jax.vmap(one)(xp, xq, fp, fq)
    return (jnp.moveaxis(pos, 0, -1), jnp.moveaxis(nrm, 0, -1),
            jnp.moveaxis(dep, 0, -1))


# ---------------------------------------------------------------------------
# one physics substep (engine/step.py port, dynamic + kinematic)
# ---------------------------------------------------------------------------

from typing import NamedTuple


class _SceneBM(NamedTuple):
    """Batch-minor scene state bundle (pytree: scan carry)."""
    q: jax.Array
    qd: jax.Array
    free_pos: jax.Array
    free_quat: jax.Array
    free_linvel: jax.Array
    free_angvel: jax.Array
    warm: jax.Array


def scene_to_bm(sc):
    """Batch-major SceneState [B, ...] -> _SceneBM with trailing batch."""
    mv = lambda x: jnp.moveaxis(x, 0, -1)
    return _SceneBM(mv(sc.q), mv(sc.qd), mv(sc.free_pos), mv(sc.free_quat),
                    mv(sc.free_linvel), mv(sc.free_angvel), mv(sc.warm))


def scene_from_bm(sb, cls):
    mv = lambda x: jnp.moveaxis(x, -1, 0)
    return cls(q=mv(sb.q), qd=mv(sb.qd), free_pos=mv(sb.free_pos),
               free_quat=mv(sb.free_quat), free_linvel=mv(sb.free_linvel),
               free_angvel=mv(sb.free_angvel), warm=mv(sb.warm))


def _contact_phase_bm(scene, meta, pts, normal, depth, axes, anchors,
                      Minv_arm, v_all, a_smooth, free_pos, free_quat, warm):
    from d3il_tpu.engine import contact_kernel
    interpret = jax.default_backend() != "tpu"
    return contact_kernel.phase_batched_bm(
        meta, pts, normal, depth, axes, anchors, Minv_arm, v_all, a_smooth,
        free_pos, free_quat, warm, interpret=interpret)


# Pallas dynamics kernels (engine/dyn_kernel.py) replace the jnp dynamics /
# PD / Minv stages below. None: auto (on everywhere; interpret off-TPU).
# False: force the plain-jnp stages (golden tests compare the two).
_USE_DYN_KERNEL = None


def set_dyn_kernel(flag):
    global _USE_DYN_KERNEL
    assert flag in (None, True, False)
    _USE_DYN_KERNEL = flag


def _dyn_kernel_on():
    return True if _USE_DYN_KERNEL is None else _USE_DYN_KERNEL


def physics_substep_bm(params, meta, sb: _SceneBM, q_des, qd_des, tau_model,
                       set_width, grasp_flag):
    """envs.common.physics_substep + engine.step port, batch-minor.

    q_des/qd_des/tau_model [7, B]; set_width/grasp_flag [B]."""
    scene = params.scene
    robot = scene.robot
    dtype = sb.q.dtype
    B = sb.q.shape[-1]
    nv_r = robot.nv
    nf = scene.n_free
    h = scene.dt
    g = jnp.asarray(scene.gravity, dtype)
    D = jnp.asarray(robot.joint_damping, dtype)
    use_kernel = _dyn_kernel_on() and not params.kinematic
    qd_pre = axes = anchors = None

    if params.kinematic:
        # beamed arm (engine/step.py kinematic branch + common kin substep)
        w = jnp.clip(jnp.broadcast_to(set_width[None], (2, B)),
                     sb.q[7:] - 0.2 * h, sb.q[7:] + 0.2 * h)
        q_new = jnp.concatenate([q_des, w])
        qd_new = (q_new - sb.q) / h
        sb = _SceneBM(q_new, qd_new, sb.free_pos, sb.free_quat,
                      sb.free_linvel, sb.free_angvel, sb.warm)
        fk_cache = fk_bm(robot, sb.q)
        Minv_arm = jnp.zeros((nv_r, nv_r, B), dtype)
        a_arm = jnp.zeros((nv_r, B), dtype)
        tau_c = bias = None
        M_arm = None
    elif use_kernel:
        from d3il_tpu.engine import dyn_kernel
        interpret = jax.default_backend() != "tpu"
        (xpos_k, xquat_k, axes, anchors, Minv_arm, qd_pre,
         a_arm) = dyn_kernel.arm_stage_bm(
            scene, params.pd_gains, sb.q, sb.qd, q_des, qd_des, tau_model,
            set_width, grasp_flag, interpret=interpret)
        fk_cache = (xpos_k, xquat_k)
        M_arm = tau_c = bias = None
    else:
        fk_cache, M_arm, bias = dynamics_bm(robot, sb.q, sb.qd, scene.gravity)
        pg = jnp.asarray(params.pd_gains.pgain, dtype)[:, None]
        dg = jnp.asarray(params.pd_gains.dgain, dtype)[:, None]
        tau_pd = pg * (q_des - sb.q[:7]) + dg * (qd_des - sb.qd[:7])
        fing = finger_forces_bm(sb.q[7:], sb.qd[7:], set_width, grasp_flag)
        ctrl = jnp.concatenate([tau_pd + tau_model + bias[:7], fing])
        fr = jnp.asarray(scene.forcerange, dtype)
        tau_c = jnp.clip(ctrl, fr[:, :1], fr[:, 1:2])
        f_arm = tau_c - bias
        Minv_arm = inv_spd_bm(M_arm + h * jnp.diag(D)[..., None])
        a_arm = jnp.einsum("ijn,jn->in", Minv_arm, f_arm)

    # free-body smooth dynamics
    m_f = jnp.asarray(scene.free_mass, dtype)[:, None, None]
    I_f = jnp.asarray(scene.free_inertia, dtype)[..., None]   # [nf,3,1]
    gyro = vcross(sb.free_angvel, I_f * sb.free_angvel)
    f_free_ang = -gyro

    pts, normal, depth = narrow_phase_bm(scene, *fk_cache, sb.free_pos,
                                         sb.free_quat)
    v_free = jnp.concatenate([sb.free_linvel, sb.free_angvel],
                             axis=1).reshape(6 * nf, B)
    v_all = jnp.concatenate([sb.q * 0 + sb.qd, v_free])       # [nv, B]
    a_free = jnp.concatenate(
        [jnp.broadcast_to(g[None, :, None], (nf, 3, B)), f_free_ang / I_f],
        axis=1).reshape(6 * nf, B)
    a_smooth = jnp.concatenate([a_arm, a_free])

    if axes is None:
        axes, anchors = _dof_frames_bm(robot, *fk_cache)
    f, qfrc = _contact_phase_bm(scene, meta, pts, normal, depth, axes,
                                anchors, Minv_arm, v_all, a_smooth,
                                sb.free_pos, sb.free_quat, sb.warm)

    if params.kinematic:
        q_out, qd_out = sb.q, sb.qd
    else:
        if qd_pre is not None:
            # kernel path: qd_pre = (M+hD)^-1 (M qd + h (tau - bias));
            # contacts add h (M+hD)^-1 J' f
            qd_out = qd_pre + h * jnp.einsum("ijn,jn->in", Minv_arm,
                                             qfrc[:nv_r])
        else:
            rhs = (jnp.einsum("ijn,jn->in", M_arm, sb.qd)
                   + h * (tau_c - bias + qfrc[:nv_r]))
            qd_out = jnp.einsum("ijn,jn->in", Minv_arm, rhs)
        q_new = sb.q + h * qd_out
        lo = jnp.asarray(robot.joint_range[:, 0], dtype)[:, None]
        hi = jnp.asarray(robot.joint_range[:, 1], dtype)[:, None]
        q_out = jnp.clip(q_new, lo, hi)
        qd_out = jnp.where((q_new < lo) | (q_new > hi), 0.0, qd_out)

    fcon = qfrc[nv_r:].reshape(nf, 6, B)
    linvel = sb.free_linvel + h * (g[None, :, None] + fcon[:, :3] / m_f)
    angvel = sb.free_angvel + h * ((f_free_ang + fcon[:, 3:]) / I_f)
    pos = sb.free_pos + h * linvel
    quat = qintegrate(sb.free_quat, angvel, h)
    return _SceneBM(q_out, qd_out, pos, quat, linvel, angvel, f)


def finger_forces_bm(fing_pos, fing_vel, set_width, grasp_flag):
    """control/gripper.finger_forces port: [2, B] positions/velocities."""
    from d3il_tpu.control.gripper import PGAIN, DGAIN
    mean_pos = fing_pos.mean(axis=0, keepdims=True)
    force = PGAIN * (mean_pos - fing_pos)
    wide = (mean_pos[0] - set_width) > 0.005
    brake = 200.0 * jnp.maximum(-(fing_vel + 0.2), 0.0)
    grasp = jnp.minimum(-20.0 + brake, 0.0)
    close_servo = DGAIN * (-0.2 - fing_vel)
    pd = jnp.clip(PGAIN * (set_width[None] - fing_pos) - DGAIN * fing_vel,
                  -5.0, 5.0)
    branch_wide = jnp.where(grasp_flag[None], grasp, close_servo)
    force2 = jnp.where(wide[None], branch_wide, pd)
    return force + force2


# ---------------------------------------------------------------------------
# whole-substep window (envs/common.run_substeps port)
# ---------------------------------------------------------------------------

def run_substeps_bm(params, sc, cs, des_pos, des_quat, set_width, grasp_flag):
    """Batched run_substeps: batch-major pytrees in/out, batch-minor inside.

    sc: SceneState [B, ...]; cs: CartImpedanceState [B, 7]; des_pos [B, 3];
    des_quat [B, 4]; set_width/grasp_flag [B]."""
    from d3il_tpu.engine import contact as contact_mod
    from d3il_tpu.engine import step as estep

    meta = _meta_for(params.scene)
    sb = scene_to_bm(sc)
    q_virt = jnp.moveaxis(cs.q_virt, 0, -1)
    old_vel = jnp.moveaxis(cs.old_des_vel, 0, -1)
    des_pos_bm = jnp.moveaxis(des_pos, 0, -1)
    des_quat_bm = jnp.moveaxis(des_quat, 0, -1)
    n_sub = params.n_substeps
    B = sb.q.shape[-1]

    # 1) hoisted IK trajectory + feedforward: one Pallas kernel for the
    #    whole window (engine/dyn_kernel.ik_window_bm); jnp scan fallback
    use_ik_kernel = _dyn_kernel_on()
    if use_ik_kernel:
        from d3il_tpu.engine import dyn_kernel
        (q_virt, old_vel, q_des_w, qd_des_w,
         tau_model_kernel) = dyn_kernel.ik_window_bm(
            params.ctrl_chain, params.cart_gains, n_sub, params.dt,
            q_virt, old_vel, des_pos_bm, des_quat_bm,
            interpret=jax.default_backend() != "tpu")
        qdd_des_w = None
    else:
        tau_model_kernel = None

        def ik_body(carry, _):
            qv, ov = carry
            qv, ov, q_des, qd_des, qdd_des = cartesian_step_bm(
                params.ctrl_chain, params.cart_gains, qv, ov, des_pos_bm,
                des_quat_bm, params.dt)
            return (qv, ov), (q_des, qd_des, qdd_des)

        (q_virt, old_vel), (q_des_w, qd_des_w, qdd_des_w) = jax.lax.scan(
            ik_body, (q_virt, old_vel), None, length=n_sub)
    # window tensors [n_sub, 7, B]

    if params.kinematic:
        def kin_body(sb, q_d):
            sb = physics_substep_bm(params, meta, sb, q_d, None, None,
                                    set_width, grasp_flag)
            return sb, None
        sb, _ = jax.lax.scan(kin_body, sb, q_des_w)
    else:
        # 2) model feedforward over the whole window: already produced by
        #    the IK window kernel; jnp fallback folds the window dim into
        #    the batch (one call instead of n_substeps sequential ones)
        if tau_model_kernel is not None:
            tau_model_w = tau_model_kernel
        else:
            fold = lambda x: jnp.moveaxis(x, 0, 1).reshape(7, n_sub * B)
            tau_model_w = jnp.moveaxis(
                model_feedforward_bm(params.ctrl_chain, fold(q_des_w),
                                     fold(qd_des_w), fold(qdd_des_w))
                .reshape(7, n_sub, B), 1, 0)                  # [n_sub,7,B]

        def body(sb, inp):
            q_d, qd_d, tau_m = inp
            sb = physics_substep_bm(params, meta, sb, q_d, qd_d, tau_m,
                                    set_width, grasp_flag)
            return sb, None

        sb, _ = jax.lax.scan(body, sb, (q_des_w, qd_des_w, tau_model_w))

    sc_out = scene_from_bm(sb, estep.SceneState)
    cs_out = type(cs)(q_virt=jnp.moveaxis(q_virt, -1, 0),
                      old_des_vel=jnp.moveaxis(old_vel, -1, 0))
    return sc_out, cs_out


_META_CACHE: dict = {}


def _meta_for(scene):
    from d3il_tpu.engine import contact as contact_mod
    # keyed by id but pinning the scene in the value: an identity check
    # guards against CPython id reuse handing out another scene's metadata
    key = id(scene)
    hit = _META_CACHE.get(key)
    if hit is None or hit[0] is not scene:
        hit = (scene, contact_mod.build_meta(scene))
        _META_CACHE[key] = hit
    return hit[1]


def supported(params) -> bool:
    """bm path requires a VMEM-legal contact kernel tile and free bodies."""
    from d3il_tpu.engine import contact_kernel
    if not params.scene.pairs or params.scene.n_free == 0:
        return False
    return contact_kernel.pick_tile(_meta_for(params.scene)) >= 128
