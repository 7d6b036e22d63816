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
from d3il_tpu.engine import contact as contact_mod
from d3il_tpu.engine.model import (BOX, CAPSULE, CYLINDER, PLANE, SPHERE,
                                   SceneModel)
from d3il_tpu.ops import linalg as linalg_ops
from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.robot import chain as chain_mod


class SceneState(NamedTuple):
    q: jax.Array          # [9] robot joint positions
    qd: jax.Array         # [9]
    free_pos: jax.Array   # [nf, 3]
    free_quat: jax.Array  # [nf, 4]
    free_linvel: jax.Array   # [nf, 3] world frame
    free_angvel: jax.Array   # [nf, 3] body-local frame (MuJoCo free-joint dofs)
    warm: jax.Array          # [ncon, 3] contact-force warm start (MuJoCo
                             # warm-starts mj_step's solver the same way)


def init_state(scene: SceneModel, q=None, free_pos=None, free_quat=None,
               dtype=jnp.float32) -> SceneState:
    nf = scene.n_free
    if q is None:
        q = jnp.zeros(scene.robot.nv, dtype)
    if free_pos is None:
        free_pos = jnp.zeros((nf, 3), dtype)
    if free_quat is None:
        free_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (nf, 1))
    ncon = sum(p.max_points for p in scene.pairs)
    return SceneState(
        q=jnp.asarray(q, dtype), qd=jnp.zeros_like(jnp.asarray(q, dtype)),
        free_pos=jnp.asarray(free_pos, dtype),
        free_quat=jnp.asarray(free_quat, dtype),
        free_linvel=jnp.zeros((nf, 3), dtype),
        free_angvel=jnp.zeros((nf, 3), dtype),
        warm=jnp.zeros((ncon, 3), dtype))


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
    contact_phase = contact_mod.make_contact_phase(scene) if scene.pairs \
        else None

    def step(state: SceneState, ctrl: jax.Array,
             dyn=None) -> SceneState:
        """dyn: optional precomputed (fk_cache, M_arm, bias_arm) from
        chain.dynamics(robot, q, qd, scene.gravity) at the pre-step state —
        lets the caller share one dynamics evaluation between gravity
        compensation and the engine instead of re-deriving it here."""
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
            if dyn is None:
                dyn = chain_mod.dynamics(robot, state.q, state.qd,
                                         scene.gravity)
            fk_cache, M_arm, bias_arm = dyn
            fr = jnp.asarray(scene.forcerange, dtype)
            tau = jnp.clip(ctrl, fr[:, 0], fr[:, 1])
            # joint-limit containment for fingers is handled by the range clamp
            # at integration; smooth force excludes damping (implicit later)
            f_arm = tau - bias_arm
            # closed-form blocked inverse (ops/linalg): XLA's cho_factor is an
            # iterative primitive costing ~0.7 ms per call on TPU; the 9x9
            # mass matrix inverts in a few fused 3x3 ops and is reused for
            # the smooth acceleration, the Delassus assembly and integration
            Minv_arm = linalg_ops.inv_spd(M_arm + h * jnp.diag(D))

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
            qd_new = Minv_arm @ rhs
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
                    free_linvel=linvel_new, free_angvel=angvel_new,
                    warm=state.warm)
            return state._replace(q=q_clamped, qd=qd_new)

        contacts, _metas = _contact_rows(scene, state, fk_cache)

        # ---- relative velocity & smooth accelerations ----
        v_free = (jnp.concatenate([state.free_linvel, state.free_angvel],
                                  axis=1).reshape(-1) if nf else
                  jnp.zeros(0, dtype))
        v_all = jnp.concatenate([state.qd, v_free])
        if not kinematic_robot:
            a_smooth_arm = Minv_arm @ f_arm  # (M+hD)^-1 f
        a_free_v = (jnp.concatenate(
            [jnp.broadcast_to(g, (nf, 3)), f_free_ang / I_f], axis=1).reshape(-1)
            if nf else jnp.zeros(0, dtype))
        a_smooth = jnp.concatenate([a_smooth_arm, a_free_v])

        # ---- constraint phase (contact.py; Pallas kernel when batched) ----
        axes, anchors = chain_mod._dof_frames(robot, *fk_cache)
        f, qfrc_con = contact_phase(
            contacts.pos, contacts.normal, contacts.depth, axes, anchors,
            Minv_arm, v_all, a_smooth, state.free_pos, state.free_quat,
            state.warm)

        # ---- integrate ----
        if kinematic_robot:
            q_new, qd_new = state.q, state.qd
        else:
            # arm: (M + hD) v' = M v + h (tau - bias + qfrc_con_arm)
            rhs = M_arm @ state.qd + h * (tau - bias_arm + qfrc_con[:nv_r])
            qd_new = Minv_arm @ rhs
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
                          free_angvel=angvel_new, warm=f)

    return step
