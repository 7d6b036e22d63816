"""Scalarized (structure-of-arrays) robot dynamics for Pallas TPU kernels.

The batch-minor jnp pipeline (engine/substep_bm.py) is bandwidth-bound: XLA
materializes the [13,3,9,9,B] einsum intermediates of the Jacobian-based
mass-matrix/bias contractions in HBM (docs/PERF.md round-4 attribution).
This module re-expresses the entire arm dynamics chain as *scalar component*
recursions — every quantity is one array holding only the batch dimension
(a full (8, 128) VPU tile inside a kernel), every loop over bodies/dofs is a
static Python unroll, and every chain constant (body offsets, axes, inertias)
is a Python float that folds at trace time. Inside a Pallas kernel nothing
ever leaves VMEM.

Algorithms (replacing robot/chain.py's jvp-through-Jacobians formulation with
the classical recursions — same model, same outputs, golden-tested in
tests/test_dyn_scalar.py):

  * FK: sequential parent->child compose (13 bodies).
  * Bias forces: RNEA — world-frame velocity/acceleration propagation with
    root acceleration -g, then a leaf->root force backward pass
    (equivalent to chain.bias_forces = C(q,qd) qd + g(q), i.e. MuJoCo
    qfrc_bias / pinocchio rnea(q, v, 0)).
  * Feedforward: the same RNEA with qdd != 0 and g = 0 gives
    M(q) qdd + C(q, qd) qd directly (joint_pd.model_feedforward).
  * Mass matrix: CRBA via backward-accumulated composite bodies
    (m_s, integral of m c, second moment about the world origin).
  * Small SPD solves: unrolled scalar Cholesky.

Every function takes/returns plain Python structures (tuples for vec3/quat,
dicts for matrices) whose leaves are floats or arrays of ONE uniform shape —
[8, 128] tiles inside kernels, [] / [B] under test. Mixing floats and arrays
is intentional: constant subexpressions (fixed-tail transforms, the root's
zero velocity) fold to floats in Python before any array op is emitted.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from d3il_tpu.robot.chain import FIXED, HINGE, SLIDE


# ---------------------------------------------------------------------------
# dispatching scalar helpers (float -> math, array -> jnp)
# ---------------------------------------------------------------------------

def _isf(x):
    return isinstance(x, (int, float))


def _sin(x):
    return math.sin(x) if _isf(x) else jnp.sin(x)


def _cos(x):
    return math.cos(x) if _isf(x) else jnp.cos(x)


def _sqrt(x):
    return math.sqrt(x) if _isf(x) else jnp.sqrt(x)


def v3(x=0.0, y=0.0, z=0.0):
    return (x, y, z)


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def qmul(p, q):
    w0, x0, y0, z0 = p
    w1, x1, y1, z1 = q
    return (w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1)


def qrot(q, v):
    """Rotate vec3 by quaternion (2-cross form, matches ops/quat.rotate)."""
    qv = (q[1], q[2], q[3])
    t = vscale(vcross(qv, v), 2.0)
    return vadd(vadd(v, vscale(t, q[0])), vcross(qv, t))


def qnormalize(q, eps=1e-12):
    n = _sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    if _isf(n):
        n = max(n, eps)
    else:
        n = jnp.maximum(n, eps)
    return (q[0] / n, q[1] / n, q[2] / n, q[3] / n)


def qtomat(q):
    """quat -> 3x3 rotation as nested tuples (rows)."""
    w, x, y, z = q
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
            (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
            (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)))


def mat_vec(R, v):
    return (vdot(R[0], v), vdot(R[1], v), vdot(R[2], v))


def mat_tvec(R, v):
    """R^T v."""
    return (R[0][0] * v[0] + R[1][0] * v[1] + R[2][0] * v[2],
            R[0][1] * v[0] + R[1][1] * v[1] + R[2][1] * v[2],
            R[0][2] * v[0] + R[1][2] * v[1] + R[2][2] * v[2])


def rot_inertia(R, I):
    """R I R^T for symmetric 3x3 I (nested-tuple rows)."""
    # A = I R^T  (I symmetric)
    A = tuple(tuple(I[i][0] * R[j][0] + I[i][1] * R[j][1] + I[i][2] * R[j][2]
                    for j in range(3)) for i in range(3))
    return tuple(tuple(R[i][0] * A[0][j] + R[i][1] * A[1][j] + R[i][2] * A[2][j]
                       for j in range(3)) for i in range(3))


# ---------------------------------------------------------------------------
# forward kinematics (robot/chain.fk port, sequential compose)
# ---------------------------------------------------------------------------

def fk_s(chain, q):
    """q: list[nv] of scalars. Returns (xpos, xquat): lists over bodies of
    vec3 / quat tuples. Chain constants enter as Python floats and fold."""
    xpos, xquat = [], []
    for b in range(chain.nb):
        bq = tuple(float(v) for v in chain.body_quat[b])
        bp = tuple(float(v) for v in chain.body_pos[b])
        jt = int(chain.joint_type[b])
        if jt == HINGE:
            axis = tuple(float(v) for v in chain.joint_axis[b])
            anchor = tuple(float(v) for v in chain.joint_pos[b])
            theta = q[int(chain.body_dof[b])]
            half = theta * 0.5
            c, s = _cos(half), _sin(half)
            jq = (c, axis[0] * s, axis[1] * s, axis[2] * s)
            lq = qmul(bq, jq)
            # bp + R(bq) anchor is constant; R(lq) anchor is runtime
            const = vadd(bp, qrot(bq, anchor))
            lp = vsub(const, qrot(lq, anchor))
        elif jt == SLIDE:
            axis = tuple(float(v) for v in chain.joint_axis[b])
            d = q[int(chain.body_dof[b])]
            lq = bq
            lp = vadd(bp, vscale(qrot(bq, axis), d))
        else:
            lq, lp = bq, bp
        p = int(chain.parent[b])
        if p < 0:
            xquat.append(lq)
            xpos.append(lp)
        else:
            pq, pp = xquat[p], xpos[p]
            xquat.append(qmul(pq, lq))
            xpos.append(vadd(pp, qrot(pq, lp)))
    return xpos, xquat


def dof_frames_s(chain, xpos, xquat):
    """World axis + anchor point of every dof (chain._dof_frames port)."""
    axes, anchors = [], []
    for d in range(chain.nv):
        b = int(chain.dof_body[d])
        axis = tuple(float(v) for v in chain.joint_axis[b])
        jpos = tuple(float(v) for v in chain.joint_pos[b])
        axes.append(qrot(xquat[b], axis))
        anchors.append(vadd(xpos[b], qrot(xquat[b], jpos)))
    return axes, anchors


# ---------------------------------------------------------------------------
# RNEA: bias forces / inverse dynamics
# ---------------------------------------------------------------------------

def _body_kinematics(chain, xpos, xquat, q, qd, qdd, gravity):
    """World-frame velocity/acceleration propagation.

    Root linear acceleration is set to -gravity (the standard RNEA trick), so
    the downstream force pass yields C(q,qd) qd + g(q) for qdd = 0 — exactly
    chain.bias_forces — and M qdd + C qd for gravity = 0, qdd != 0.

    Returns per-body (omega, alpha, a_com) plus world coms and inertias.
    """
    g = tuple(float(v) for v in gravity)
    omega, alpha, v_o, a_o = [], [], [], []
    coms, Iw = [], []
    for b in range(chain.nb):
        p = int(chain.parent[b])
        if p < 0:
            w_p, al_p = v3(), v3()
            vo_p, ao_p = v3(), (-g[0], -g[1], -g[2])
            o_p = v3()
        else:
            w_p, al_p, vo_p, ao_p = omega[p], alpha[p], v_o[p], a_o[p]
            o_p = xpos[p]
        o_b = xpos[b]
        jt = int(chain.joint_type[b])
        if jt == HINGE:
            d = int(chain.body_dof[b])
            axis = qrot(xquat[b], tuple(float(v) for v in chain.joint_axis[b]))
            jpos = tuple(float(v) for v in chain.joint_pos[b])
            r = vadd(o_b, qrot(xquat[b], jpos))           # world anchor
            w_b = vadd(w_p, vscale(axis, qd[d]))
            al_b = vadd(al_p, vscale(vcross(w_p, axis), qd[d]))
            if qdd is not None:
                al_b = vadd(al_b, vscale(axis, qdd[d]))
            dr = vsub(r, o_p)
            v_r = vadd(vo_p, vcross(w_p, dr))
            a_r = vadd(ao_p, vadd(vcross(al_p, dr),
                                  vcross(w_p, vcross(w_p, dr))))
            do = vsub(o_b, r)
            vo_b = vadd(v_r, vcross(w_b, do))
            ao_b = vadd(a_r, vadd(vcross(al_b, do),
                                  vcross(w_b, vcross(w_b, do))))
        elif jt == SLIDE:
            d = int(chain.body_dof[b])
            axis = qrot(xquat[b], tuple(float(v) for v in chain.joint_axis[b]))
            w_b, al_b = w_p, al_p
            do = vsub(o_b, o_p)
            vo_b = vadd(vadd(vo_p, vcross(w_p, do)), vscale(axis, qd[d]))
            ao_b = vadd(ao_p, vadd(vcross(al_p, do),
                                   vcross(w_p, vadd(vcross(w_p, do),
                                                    vscale(axis, 2.0 * qd[d])))))
            if qdd is not None:
                ao_b = vadd(ao_b, vscale(axis, qdd[d]))
        else:
            w_b, al_b = w_p, al_p
            do = vsub(o_b, o_p)
            vo_b = vadd(vo_p, vcross(w_p, do))
            ao_b = vadd(ao_p, vadd(vcross(al_p, do),
                                   vcross(w_p, vcross(w_p, do))))
        omega.append(w_b)
        alpha.append(al_b)
        v_o.append(vo_b)
        a_o.append(ao_b)
        com_l = tuple(float(v) for v in chain.com[b])
        coms.append(vadd(o_b, qrot(xquat[b], com_l)))
        R = qtomat(xquat[b])
        I_l = tuple(tuple(float(chain.inertia[b][i][j]) for j in range(3))
                    for i in range(3))
        Iw.append(rot_inertia(R, I_l))
    return omega, alpha, a_o, coms, Iw


def rnea_s(chain, xpos, xquat, q, qd, qdd=None, gravity=(0.0, 0.0, -9.81)):
    """Inverse dynamics tau [nv]: M qdd + C(q,qd) qd + g(q).

    qdd=None means zero (-> bias forces, chain.bias_forces semantics);
    gravity=(0,0,0) with qdd -> joint_pd.model_feedforward semantics.
    """
    omega, alpha, a_o, coms, Iw = _body_kinematics(
        chain, xpos, xquat, q, qd, qdd, gravity)
    nb = chain.nb
    # per-body spatial force: f at com, moment about world origin
    F = [None] * nb
    N0 = [None] * nb
    for b in range(nb):
        o_b = xpos[b]
        dc = vsub(coms[b], o_b)
        a_c = vadd(a_o[b], vadd(vcross(alpha[b], dc),
                                vcross(omega[b], vcross(omega[b], dc))))
        m = float(chain.mass[b])
        f = vscale(a_c, m)
        n = vadd(mat_vec(Iw[b], alpha[b]),
                 vcross(omega[b], mat_vec(Iw[b], omega[b])))
        F[b] = f
        N0[b] = vadd(n, vcross(coms[b], f))
    # backward accumulate (children before parents: reversed body order)
    for b in range(nb - 1, 0, -1):
        p = int(chain.parent[b])
        F[p] = vadd(F[p], F[b])
        N0[p] = vadd(N0[p], N0[b])
    axes, anchors = dof_frames_s(chain, xpos, xquat)
    tau = []
    for d in range(chain.nv):
        b = int(chain.dof_body[d])
        if int(chain.joint_type[b]) == HINGE:
            n_r = vsub(N0[b], vcross(anchors[d], F[b]))
            tau.append(vdot(axes[d], n_r))
        else:
            tau.append(vdot(axes[d], F[b]))
    return tau


# ---------------------------------------------------------------------------
# CRBA: mass matrix via composite bodies
# ---------------------------------------------------------------------------

def _ancestor_pairs(chain):
    """Static list of (i, j) dof pairs with i on j's path to root, i <= j."""
    pairs = []
    for j in range(chain.nv):
        bj = int(chain.dof_body[j])
        for i in range(j + 1):
            if chain.ancestor_mask[bj, i] > 0:
                pairs.append((i, j))
    return pairs


def crba_s(chain, xpos, xquat, coms=None, Iw=None):
    """Joint-space inertia matrix as dict {(i, j): val} for i <= j.

    Composite per body: (m_s, h_s = sum m c, I0_s = sum about-origin second
    moments). For a unit qdd of dof j the subtree exerts F = a_j x (h - m r)
    (hinge) / m a_j (slide) and moment-about-origin N0 = I0 a_j - h x (a_j x
    r) (hinge) / h x a_j (slide); M[i][j] = S_i . (F, N0).
    """
    if coms is None or Iw is None:
        coms, Iw = [], []
        for b in range(chain.nb):
            com_l = tuple(float(v) for v in chain.com[b])
            coms.append(vadd(xpos[b], qrot(xquat[b], com_l)))
            R = qtomat(xquat[b])
            I_l = tuple(tuple(float(chain.inertia[b][i][j]) for j in range(3))
                        for i in range(3))
            Iw.append(rot_inertia(R, I_l))
    nb = chain.nb
    m_s = [float(chain.mass[b]) for b in range(nb)]
    h_s = [vscale(coms[b], float(chain.mass[b])) for b in range(nb)]
    # about-origin second moment: Iw + m (|c|^2 E - c c^T)
    I0 = []
    for b in range(nb):
        c = coms[b]
        m = float(chain.mass[b])
        c2 = vdot(c, c)
        I0.append(tuple(tuple(
            Iw[b][i][j] + m * ((c2 if i == j else 0.0) - c[i] * c[j])
            for j in range(3)) for i in range(3)))
    for b in range(nb - 1, 0, -1):
        p = int(chain.parent[b])
        m_s[p] = m_s[p] + m_s[b]
        h_s[p] = vadd(h_s[p], h_s[b])
        I0[p] = tuple(tuple(I0[p][i][j] + I0[b][i][j] for j in range(3))
                      for i in range(3))
    axes, anchors = dof_frames_s(chain, xpos, xquat)
    # per-dof composite force from unit qdd
    Fj, N0j = [], []
    for j in range(chain.nv):
        b = int(chain.dof_body[j])
        a = axes[j]
        if int(chain.joint_type[b]) == HINGE:
            r = anchors[j]
            F = vcross(a, vsub(h_s[b], vscale(r, m_s[b])))
            N = vsub(mat_vec(I0[b], a), vcross(h_s[b], vcross(a, r)))
        else:
            F = vscale(a, m_s[b])
            N = vcross(h_s[b], a)
        Fj.append(F)
        N0j.append(N)
    M = {}
    for (i, j) in _ancestor_pairs(chain):
        bi = int(chain.dof_body[i])
        if int(chain.joint_type[bi]) == HINGE:
            n_ri = vsub(N0j[j], vcross(anchors[i], Fj[j]))
            M[(i, j)] = vdot(axes[i], n_ri)
        else:
            M[(i, j)] = vdot(axes[i], Fj[j])
    return M


def dynamics_s(chain, q, qd, gravity=(0.0, 0.0, -9.81)):
    """Scalarized chain.dynamics: (xpos, xquat, M dict, bias list)."""
    xpos, xquat = fk_s(chain, q)
    omega, alpha, a_o, coms, Iw = _body_kinematics(
        chain, xpos, xquat, q, qd, None, gravity)
    # bias backward pass (inline of rnea_s tail, reusing kinematics)
    nb = chain.nb
    F = [None] * nb
    N0 = [None] * nb
    for b in range(nb):
        dc = vsub(coms[b], xpos[b])
        a_c = vadd(a_o[b], vadd(vcross(alpha[b], dc),
                                vcross(omega[b], vcross(omega[b], dc))))
        m = float(chain.mass[b])
        f = vscale(a_c, m)
        n = vadd(mat_vec(Iw[b], alpha[b]),
                 vcross(omega[b], mat_vec(Iw[b], omega[b])))
        F[b] = f
        N0[b] = vadd(n, vcross(coms[b], f))
    for b in range(nb - 1, 0, -1):
        p = int(chain.parent[b])
        F[p] = vadd(F[p], F[b])
        N0[p] = vadd(N0[p], N0[b])
    axes, anchors = dof_frames_s(chain, xpos, xquat)
    bias = []
    for d in range(chain.nv):
        b = int(chain.dof_body[d])
        if int(chain.joint_type[b]) == HINGE:
            bias.append(vdot(axes[d], vsub(N0[b],
                                           vcross(anchors[d], F[b]))))
        else:
            bias.append(vdot(axes[d], F[b]))
    M = crba_s(chain, xpos, xquat, coms, Iw)
    return xpos, xquat, axes, anchors, M, bias


# ---------------------------------------------------------------------------
# small scalar linear algebra
# ---------------------------------------------------------------------------

def chol_solve_s(M, b, n, reg=0.0):
    """Solve (A + reg I) x = b for symmetric A given as dict {(i,j): v, i<=j}
    and b list[n]. Unrolled Cholesky + substitution; floats fold."""
    def A(i, j):
        key = (i, j) if i <= j else (j, i)
        return M.get(key, 0.0)

    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for i in range(n):
        for j in range(i + 1):
            s = A(j, i) + (reg if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                if _isf(s):
                    L[i][j] = math.sqrt(max(s, 1e-12))
                else:
                    L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
                inv_diag[i] = 1.0 / L[i][j]
            else:
                L[i][j] = s * inv_diag[j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_diag[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_diag[i]
    return x


def spd_inverse_s(M, n, reg=0.0):
    """Full inverse of A (+ reg I) as dict {(i,j): v, i<=j} via n solves
    against unit vectors (symmetrized)."""
    cols = []
    for j in range(n):
        e = [1.0 if i == j else 0.0 for i in range(n)]
        cols.append(chol_solve_s(M, e, n, reg))
    out = {}
    for i in range(n):
        for j in range(i, n):
            out[(i, j)] = 0.5 * (cols[j][i] + cols[i][j])
    return out


def matvec_sym_s(M, x, n):
    """A x for symmetric dict A."""
    out = []
    for i in range(n):
        s = 0.0
        for j in range(n):
            key = (i, j) if i <= j else (j, i)
            s = s + M.get(key, 0.0) * x[j]
        out.append(s)
    return out
