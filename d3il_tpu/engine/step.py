"""One physics step: smooth dynamics + contacts + semi-implicit Euler.

The pipeline per 1 ms step (dt, integrator and constraint semantics match the
reference scenes: base.xml options, MjScene._sim_step -> mj_step):

  1. robot FK; world poses of all geoms
  2. narrow-phase over the static pair list -> fixed-size contact set
  3. smooth dynamics:  arm (9x9 mass matrix + bias via d3il_tpu.robot.chain),
     free boxes (diagonal spatial inertia, gyroscopic term, gravity)
  4. contact Jacobians against [arm dofs | per-box (v_world, omega_body)]
  5. dual block-PGS solve of the MuJoCo soft-constraint model (solver.py)
  6. velocity update with implicit joint damping (MuJoCo eulerdamp:
     (M + h D) v' = M v + h f_total), then position integration; free-body
     quaternions advance by the exact local exponential map.

State layout (SceneState) is a flat pytree of arrays so the whole step vmaps
over env batches and shards over device meshes.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.engine import collision
from d3il_tpu.engine import solver as solver_mod
from d3il_tpu.engine.model import (BOX, CAPSULE, CYLINDER, PLANE, SPHERE,
                                   SceneModel)
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod


class SceneState(NamedTuple):
    q: jax.Array          # [9] robot joint positions
    qd: jax.Array         # [9]
    free_pos: jax.Array   # [nf, 3]
    free_quat: jax.Array  # [nf, 4]
    free_linvel: jax.Array   # [nf, 3] world frame
    free_angvel: jax.Array   # [nf, 3] body-local frame (MuJoCo free-joint dofs)


def init_state(scene: SceneModel, q=None, free_pos=None, free_quat=None,
               dtype=jnp.float32) -> SceneState:
    nf = scene.n_free
    if q is None:
        q = jnp.zeros(scene.robot.nv, dtype)
    if free_pos is None:
        free_pos = jnp.zeros((nf, 3), dtype)
    if free_quat is None:
        free_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (nf, 1))
    return SceneState(
        q=jnp.asarray(q, dtype), qd=jnp.zeros_like(jnp.asarray(q, dtype)),
        free_pos=jnp.asarray(free_pos, dtype),
        free_quat=jnp.asarray(free_quat, dtype),
        free_linvel=jnp.zeros((nf, 3), dtype),
        free_angvel=jnp.zeros((nf, 3), dtype))


def _geom_world_pose(scene: SceneModel, g, xpos, xquat, state: SceneState):
    """World pose of a geom (robot-attached, free-body, or static)."""
    dtype = state.q.dtype
    gpos = jnp.asarray(np.asarray(g.pos, np.float64), dtype)
    gquat = jnp.asarray(np.asarray(g.quat, np.float64), dtype)
    if g.free_idx >= 0:
        bp, bq = state.free_pos[g.free_idx], state.free_quat[g.free_idx]
    elif g.body >= 0:
        bp, bq = xpos[g.body], xquat[g.body]
    else:
        return gpos, gquat
    return bp + quat_ops.rotate(bq, gpos), quat_ops.mul(bq, gquat)


def _narrow_phase(scene: SceneModel, pair, pa, qa, pb, qb):
    ta, tb = pair.geom_a.gtype, pair.geom_b.gtype
    sa = jnp.asarray(np.asarray(pair.geom_a.size, np.float64), pa.dtype)
    sb = jnp.asarray(np.asarray(pair.geom_b.size, np.float64), pa.dtype)

    def plane_normal(q):
        return quat_ops.rotate(q, jnp.array([0.0, 0.0, 1.0], pa.dtype))

    if (ta, tb) == (BOX, PLANE):
        return collision.box_plane(pa, qa, sa[:3], pb, plane_normal(qb))
    if (ta, tb) == (BOX, BOX):
        return collision.box_box(pa, qa, sa[:3], pb, qb, sb[:3])
    if (ta, tb) == (CAPSULE, BOX):
        return collision.capsule_box(pa, qa, sa[0], sa[1], pb, qb, sb[:3])
    if (ta, tb) == (CAPSULE, PLANE):
        return collision.capsule_plane(pa, qa, sa[0], sa[1], pb, plane_normal(qb))
    if (ta, tb) == (CAPSULE, CAPSULE):
        return collision.capsule_capsule(pa, qa, sa[0], sa[1], pb, qb, sb[0], sb[1])
    if (ta, tb) == (SPHERE, PLANE):
        return collision.sphere_plane(pa, sa[0], pb, plane_normal(qb))
    if (ta, tb) == (SPHERE, BOX):
        return collision.sphere_box(pa, sa[0], pb, qb, sb[:3])
    if (ta, tb) == (SPHERE, SPHERE):
        c = collision.capsule_capsule(pa, qa, sa[0], 0.0, pb, qb, sb[0], 0.0)
        return c
    raise ValueError(f"unhandled pair {(ta, tb)}")


def _contact_rows(scene: SceneModel, state: SceneState, fk_cache):
    """Run all colliders; return contacts + per-contact static params + the
    (geom_a, geom_b) attachment info flattened to fixed arrays."""
    xpos, xquat = fk_cache
    all_c, metas = [], []
    for pair in scene.pairs:
        pa, qa = _geom_world_pose(scene, pair.geom_a, xpos, xquat, state)
        pb, qb = _geom_world_pose(scene, pair.geom_b, xpos, xquat, state)
        c = _narrow_phase(scene, pair, pa, qa, pb, qb)
        k = c.depth.shape[0]
        all_c.append(c)
        metas.extend([pair] * k)
    contacts = collision._stack(*all_c)
    return contacts, metas


def _point_jac_free(point, com_w, quat):
    """[3, 6] Jacobian of a world point on a free body wrt (v_world, omega_body)."""
    R = quat_ops.to_mat(quat)          # body->world
    r = point - com_w
    # columns for omega_body_j: (R e_j) x r
    Jw = jnp.stack([jnp.cross(R[:, j], r) for j in range(3)], axis=1)  # [3,3]
    return jnp.concatenate([jnp.eye(3, dtype=point.dtype), Jw], axis=1)


def make_step_fn(scene: SceneModel, kinematic_robot: bool = False):
    """Build the jitted single-step function step(state, ctrl) -> state.

    kinematic_robot=True: the arm follows an externally-set joint trajectory
    (the reference's neglect_dynamics mode, IKControllers.py:317-319) and acts
    as an infinite-mass collider for the free bodies; `ctrl` is then the
    desired [q (nv_r), qd (nv_r)] instead of torques. This is also the
    high-throughput path for demonstration generation.
    """
    robot = scene.robot
    nv_r = robot.nv
    nf = scene.n_free
    nv = nv_r + 6 * nf
    h = scene.dt

    def step(state: SceneState, ctrl: jax.Array) -> SceneState:
        dtype = state.q.dtype
        g = jnp.asarray(scene.gravity, dtype)
        D = jnp.asarray(robot.joint_damping, dtype)

        if kinematic_robot:
            # arm pose comes from the controller; infinite-mass collider
            state = state._replace(q=ctrl[:nv_r], qd=ctrl[nv_r:2 * nv_r])
            fk_cache = chain_mod.fk(robot, state.q)
            Minv_arm = jnp.zeros((nv_r, nv_r), dtype)
            a_smooth_arm = jnp.zeros(nv_r, dtype)
        else:
            # ---- smooth dynamics: robot ----
            fk_cache = chain_mod.fk(robot, state.q)
            M_arm = chain_mod.mass_matrix(robot, state.q)
            bias_arm = chain_mod.bias_forces(robot, state.q, state.qd, scene.gravity)
            fr = jnp.asarray(scene.forcerange, dtype)
            tau = jnp.clip(ctrl, fr[:, 0], fr[:, 1])
            # joint-limit containment for fingers is handled by the range clamp
            # at integration; smooth force excludes damping (implicit later)
            f_arm = tau - bias_arm
            M_chol = jax.scipy.linalg.cho_factor(
                M_arm + h * jnp.diag(D))  # used for both smooth + integration
            Minv_arm = jax.scipy.linalg.cho_solve(M_chol, jnp.eye(nv_r, dtype=dtype))

        # ---- smooth dynamics: free boxes ----
        m_f = jnp.asarray(scene.free_mass, dtype)              # [nf]
        I_f = jnp.asarray(scene.free_inertia, dtype)           # [nf,3] body diag
        gyro = jnp.cross(state.free_angvel, I_f * state.free_angvel)  # body frame
        f_free_lin = m_f[:, None] * g[None, :]                 # gravity
        f_free_ang = -gyro

        # ---- contacts ----
        if not scene.pairs:
            if kinematic_robot:
                if nf:
                    linvel_new = state.free_linvel + h * g[None]
                    angvel_new = state.free_angvel + h * (f_free_ang / I_f)
                    return state._replace(
                        free_pos=state.free_pos + h * linvel_new,
                        free_quat=quat_ops.integrate(state.free_quat, angvel_new, h),
                        free_linvel=linvel_new, free_angvel=angvel_new)
                return state
            # contact-free scene: smooth dynamics only
            rhs = M_arm @ state.qd + h * (tau - bias_arm)
            qd_new = jax.scipy.linalg.cho_solve(M_chol, rhs)
            q_new = state.q + h * qd_new
            lo = jnp.asarray(robot.joint_range[:, 0], dtype)
            hi = jnp.asarray(robot.joint_range[:, 1], dtype)
            q_clamped = jnp.clip(q_new, lo, hi)
            qd_new = jnp.where((q_new < lo) | (q_new > hi), 0.0, qd_new)
            if nf:
                linvel_new = state.free_linvel + h * g[None]
                angvel_new = state.free_angvel + h * (f_free_ang / I_f)
                return SceneState(
                    q=q_clamped, qd=qd_new,
                    free_pos=state.free_pos + h * linvel_new,
                    free_quat=quat_ops.integrate(state.free_quat, angvel_new, h),
                    free_linvel=linvel_new, free_angvel=angvel_new)
            return state._replace(q=q_clamped, qd=qd_new)

        contacts, metas = _contact_rows(scene, state, fk_cache)
        ncon = contacts.depth.shape[0]
        com_w = state.free_pos  # box com == frame origin

        # contact frames
        n = contacts.normal
        # tangents: deterministic frame
        ref = jnp.where(jnp.abs(n[:, 2:3]) < 0.9,
                        jnp.tile(jnp.array([0.0, 0, 1], dtype), (ncon, 1)),
                        jnp.tile(jnp.array([1.0, 0, 0], dtype), (ncon, 1)))
        t1 = jnp.cross(n, ref)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=1, keepdims=True), 1e-9)
        t2 = jnp.cross(n, t1)
        frames = jnp.stack([n, t1, t2], axis=1)  # [nc, 3(dirs), 3(xyz)]

        # Jacobians [nc, 3, nv]
        def geom_jac(geom, point):
            J = jnp.zeros((3, nv), dtype)
            if geom.free_idx >= 0:
                jf = _point_jac_free(point, com_w[geom.free_idx],
                                     state.free_quat[geom.free_idx])
                J = J.at[:, nv_r + 6 * geom.free_idx: nv_r + 6 * (geom.free_idx + 1)].set(jf)
            elif geom.body >= 0:
                jr = chain_mod.point_jacobian(
                    robot, state.q, geom.body, fk_cache=fk_cache)
                xp, _ = fk_cache
                jp, jw = jr[:3], jr[3:]
                # shift from body origin to contact point: v_p = v_o + w x r
                r = point - xp[geom.body]
                jp_point = jp + jnp.cross(jw.T, r).T
                J = J.at[:, :nv_r].set(jp_point)
            return J

        rows_J = []
        for idx, pair in enumerate(metas):
            p = contacts.pos[idx]
            Ja = geom_jac(pair.geom_a, p)
            Jb = geom_jac(pair.geom_b, p)
            rows_J.append(frames[idx] @ (Ja - Jb))  # [3, nv]
        J = jnp.stack(rows_J)  # [nc, 3, nv]

        # ---- relative velocity & smooth accelerations ----
        v_all = jnp.concatenate(
            [state.qd] + [jnp.concatenate([state.free_linvel[i], state.free_angvel[i]])
                          for i in range(nf)]) if nf else state.qd
        if not kinematic_robot:
            a_smooth_arm = jax.scipy.linalg.cho_solve(M_chol, f_arm)  # (M+hD)^-1
        a_free = [jnp.concatenate([g, (f_free_ang[i]) / I_f[i]]) for i in range(nf)]
        a_smooth = jnp.concatenate([a_smooth_arm] + a_free) if nf else a_smooth_arm

        # ---- constraint model ----
        active = contacts.depth > 0.0
        mu = jnp.array([p.friction for p in metas], dtype)
        aref_rows = []
        R_rows = []
        # M^-1 J^T blockwise
        MinvJT = jnp.zeros((nv, ncon, 3), dtype)
        MinvJT = MinvJT.at[:nv_r].set(
            jnp.einsum("ij,ckj->ick", Minv_arm, J[:, :, :nv_r]))
        for i in range(nf):
            sl = slice(nv_r + 6 * i, nv_r + 6 * i + 3)
            MinvJT = MinvJT.at[sl].set(
                jnp.einsum("ckj->jck", J[:, :, sl]) / m_f[i])
            sl2 = slice(nv_r + 6 * i + 3, nv_r + 6 * i + 6)
            MinvJT = MinvJT.at[sl2].set(
                jnp.einsum("ckj->jck", J[:, :, sl2]) / I_f[i][:, None, None])
        A = jnp.einsum("cki,idl->ckdl", J, MinvJT)  # [nc,3,nc,3]

        vel = jnp.einsum("cki,i->ck", J, v_all)       # [nc,3]
        a0 = jnp.einsum("cki,i->ck", J, a_smooth)     # [nc,3]

        for idx, pair in enumerate(metas):
            r = -contacts.depth[idx]  # violation (negative when penetrating)
            k, b, d = solver_mod.kbi(
                jnp.asarray(pair.solref, dtype), jnp.asarray(pair.solimp, dtype), r)
            aref_n = -b * vel[idx, 0] - k * d * r
            aref_t = -b * vel[idx, 1:]  # friction rows: zero position term
            aref_rows.append(jnp.concatenate([aref_n[None], aref_t]))
            diagA = jnp.stack([A[idx, kk, idx, kk] for kk in range(3)])
            Rr = (1 - d) / jnp.maximum(d, 1e-6) * diagA
            # impratio: frictional impedance / normal impedance (option impratio=3
            # in the reference base.xml) -> smaller regularizer on friction rows
            Rr = Rr.at[1:].set(Rr[1:] / scene.impratio)
            R_rows.append(Rr)
        aref = jnp.stack(aref_rows)
        Rreg = jnp.stack(R_rows)
        A = A.at[jnp.arange(ncon)[:, None], jnp.arange(3)[None, :],
                 jnp.arange(ncon)[:, None], jnp.arange(3)[None, :]].add(Rreg)

        b0 = a0 - aref
        f = solver_mod.solve_contacts(A, b0, mu, active, scene.solver_iters)

        # ---- constraint forces back to generalized coords ----
        qfrc_con = jnp.einsum("cki,ck->i", J, f)

        # ---- integrate ----
        if kinematic_robot:
            q_new, qd_new = state.q, state.qd
        else:
            # arm: (M + hD) v' = M v + h (tau - bias + qfrc_con_arm)
            rhs = M_arm @ state.qd + h * (tau - bias_arm + qfrc_con[:nv_r])
            qd_new = jax.scipy.linalg.cho_solve(M_chol, rhs)
            q_new = state.q + h * qd_new
            # joint range clamp (hard stop; proper limit constraints TODO)
            lo = jnp.asarray(robot.joint_range[:, 0], dtype)
            hi = jnp.asarray(robot.joint_range[:, 1], dtype)
            q_clamped = jnp.clip(q_new, lo, hi)
            qd_new = jnp.where((q_new < lo) | (q_new > hi), 0.0, qd_new)
            q_new = q_clamped

        if nf:
            fcon_free = qfrc_con[nv_r:].reshape(nf, 6)
            linvel_new = state.free_linvel + h * (g[None] + fcon_free[:, :3] / m_f[:, None])
            angvel_new = state.free_angvel + h * ((f_free_ang + fcon_free[:, 3:]) / I_f)
            pos_new = state.free_pos + h * linvel_new
            quat_new = quat_ops.integrate(state.free_quat, angvel_new, h)
        else:
            linvel_new, angvel_new = state.free_linvel, state.free_angvel
            pos_new, quat_new = state.free_pos, state.free_quat

        return SceneState(q=q_new, qd=qd_new, free_pos=pos_new,
                          free_quat=quat_new, free_linvel=linvel_new,
                          free_angvel=angvel_new)

    return step
