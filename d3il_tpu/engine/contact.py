"""Contact constraint phase: Jacobians -> Delassus operator -> cone QP -> forces.

This is the hot core of every physics substep (engine/step.py calls it 35x per
env step). It is factored out of `make_step_fn` so two implementations can
share one interface:

  * `phase_single` — per-env jnp reference (matrix-free APGD, mathematically
    identical to the dense solver in engine/solver.py: the Delassus matvec
    A y = J M^-1 J' y + R y is evaluated as two [n, nv] contractions instead
    of materializing A, which is both fewer FLOPs for n > nv and the form the
    TPU kernel wants),
  * `engine/contact_kernel.py` — a batch-minor Pallas TPU kernel registered
    as the `jax.custom_batching.custom_vmap` rule, so `jax.vmap(step)` over an
    env batch transparently executes the kernel while the per-env API (and
    every existing golden test against C MuJoCo) keeps the jnp path.

Why a kernel at all: under plain vmap every intermediate here is a
[B, ncon, 3, nv]-shaped array whose minor dims (3 / 21 / 54) pad to the TPU's
(8, 128) tile, so the phase was ~20x bandwidth-inflated and dominated the
substep (measured 2.5 ms of a 4.6 ms substep at B=1024). The kernel lays
every tensor out batch-minor ([..., B] with B on the 128-lane axis), making
all the small-matrix algebra perfectly tiled elementwise/reduction work.

Replaces the same functionality as MuJoCo's mj_step constraint pipeline
(reference sims/mj_beta/MjScene.py:110) — soft-constraint model per
solimp/solref (see engine/solver.py for the formulation).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.engine import solver as solver_mod
from d3il_tpu.ops import quat as quat_ops


class ContactMeta(NamedTuple):
    """Static (host NumPy) per-scene constraint-row metadata."""

    ncon: int
    nv_r: int
    nf: int
    nv: int
    mask_rob: np.ndarray      # [ncon, nv_r] signed robot-dof mask (A side - B side)
    is_hinge: np.ndarray      # [nv_r]
    onehot_a: np.ndarray      # [ncon, nf] free-body selector, side A (0 rows if not free)
    onehot_b: np.ndarray      # [ncon, nf]
    inv_free: np.ndarray      # [nf, 6] (1/m x3, 1/I x3); [0, 6] if nf == 0
    k_row: np.ndarray         # [ncon] constraint stiffness (static part of kbi)
    b_row: np.ndarray         # [ncon] constraint damping
    solimp: np.ndarray        # [ncon, 5]
    mu: np.ndarray            # [ncon]
    impratio: float
    n_iters: int


def build_meta(scene) -> ContactMeta:
    """Flatten scene.pairs into per-row static arrays (same row order as
    engine/step.py's narrow phase: pair-major, max_points each)."""
    robot = scene.robot
    nv_r = robot.nv
    nf = scene.n_free
    rows_a, rows_b, solref, solimp, mu = [], [], [], [], []
    for pair in scene.pairs:
        for _ in range(pair.max_points):
            rows_a.append(pair.geom_a)
            rows_b.append(pair.geom_b)
            solref.append(pair.solref)
            solimp.append(pair.solimp)
            mu.append(pair.friction)
    ncon = len(mu)

    def side(geoms):
        is_rob = np.array([1.0 if (g.body >= 0 and g.free_idx < 0) else 0.0
                           for g in geoms])
        body = np.array([max(g.body, 0) for g in geoms], np.int32)
        mask = is_rob[:, None] * robot.ancestor_mask[body]       # [ncon, nv_r]
        onehot = np.zeros((ncon, max(nf, 0)))
        for r, g in enumerate(geoms):
            if g.free_idx >= 0:
                onehot[r, g.free_idx] = 1.0
        return mask, onehot

    mask_a, oh_a = side(rows_a)
    mask_b, oh_b = side(rows_b)
    solref = np.asarray(solref, np.float64)
    solimp_arr = np.asarray(solimp, np.float64)
    # static part of solver.kbi: k, b depend only on solref/solimp constants
    dmax = solimp_arr[:, 1]
    tc, dr = solref[:, 0], solref[:, 1]
    b_row = 2.0 / np.maximum(dmax * tc, 1e-12)
    k_row = 1.0 / np.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    if nf:
        inv_free = np.concatenate(
            [np.repeat(1.0 / scene.free_mass[:, None], 3, axis=1),
             1.0 / scene.free_inertia], axis=1)                  # [nf, 6]
    else:
        inv_free = np.zeros((0, 6))
    is_hinge = (robot.joint_type[robot.dof_body] == 1).astype(np.float64)
    return ContactMeta(
        ncon=ncon, nv_r=nv_r, nf=nf, nv=nv_r + 6 * nf,
        mask_rob=(mask_a - mask_b), is_hinge=is_hinge,
        onehot_a=oh_a, onehot_b=oh_b, inv_free=inv_free,
        k_row=k_row, b_row=b_row, solimp=solimp_arr,
        mu=np.asarray(mu, np.float64),
        impratio=float(scene.impratio), n_iters=int(scene.solver_iters))


def _frames(normal):
    """Contact frames from normals: [..., ncon, 3(dirs), 3(xyz)]."""
    n = normal
    dtype = n.dtype
    big = jnp.abs(n[..., 2:3]) < 0.9
    ref = jnp.where(big, jnp.array([0.0, 0, 1], dtype), jnp.array([1.0, 0, 0], dtype))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def build_rows(meta: ContactMeta, pts, normal, axes, anchors, free_pos,
               free_quat):
    """Constraint Jacobian rows J [3*ncon, nv] in the contact frames.

    pts/normal: [ncon, 3]; axes/anchors: [nv_r, 3] world dof frames;
    free_pos [nf, 3], free_quat [nf, 4].
    """
    dtype = pts.dtype
    ncon, nv_r, nf = meta.ncon, meta.nv_r, meta.nf
    frames = _frames(normal)                                     # [ncon,3,3]
    is_h = jnp.asarray(meta.is_hinge, dtype)
    mask = jnp.asarray(meta.mask_rob, dtype)

    # robot columns: same contact point on both sides -> one signed mask
    diff = pts[:, None, :] - anchors[None, :, :]                 # [ncon,nv_r,3]
    base = (is_h[None, :, None] * jnp.cross(
        jnp.broadcast_to(axes[None], diff.shape), diff)
        + (1.0 - is_h)[None, :, None] * axes[None])              # [ncon,nv_r,3]
    base = mask[:, :, None] * base
    J_rob = jnp.einsum("rdc,rkc->rdk", frames, base)             # [ncon,3,nv_r]

    if nf:
        Rb = quat_ops.to_mat(free_quat)                          # [nf,3,3]

        def side(onehot):
            oh = jnp.asarray(onehot, dtype)                      # [ncon,nf]
            pos_sel = oh @ free_pos                              # [ncon,3]
            Rb_sel = jnp.einsum("rf,fij->rij", oh, Rb)           # [ncon,3,3]
            rvec = pts - pos_sel
            # omega_body columns: Rb[:, j] x r
            Jw = jnp.cross(Rb_sel.transpose(0, 2, 1), rvec[:, None, :])
            Jw = Jw.transpose(0, 2, 1)                           # [ncon,3,3]
            isf = oh.sum(axis=1)                                 # [ncon]
            Jlin = isf[:, None, None] * frames                   # [ncon,3,3]
            Jang = jnp.einsum("rdc,rcj->rdj", frames, Jw)        # [ncon,3,3]
            return jnp.concatenate([Jlin, Jang], axis=2), oh     # [ncon,3,6]

        J6a, oh_a = side(meta.onehot_a)
        J6b, oh_b = side(meta.onehot_b)
        # scatter each side's 6 columns into its free body's slot
        J_free = (oh_a[:, None, :, None] * J6a[:, :, None, :]
                  - oh_b[:, None, :, None] * J6b[:, :, None, :]).reshape(
            ncon, 3, 6 * nf)
        J = jnp.concatenate([J_rob, J_free], axis=2)
    else:
        J = J_rob
    return J.reshape(3 * ncon, meta.nv)


def phase_core(meta: ContactMeta, Jf, depth, Minv_arm, v_all, a_smooth, warm):
    """Soft-constraint cone QP given assembled rows Jf [n, nv].

    Matrix-free preconditioned APGD — same scheme as
    solver.solve_contacts (see its docstring), with A y evaluated as
    Jf (M^-1 Jf' y) + R y. Returns (f [ncon, 3], qfrc [nv]).
    """
    dtype = Jf.dtype
    ncon, nv_r = meta.ncon, meta.nv_r
    n = 3 * ncon

    MinvJT_arm = Jf[:, :nv_r] @ Minv_arm                         # [n, nv_r]
    if meta.nf:
        inv_flat = jnp.asarray(meta.inv_free.reshape(-1), dtype)
        MinvJT = jnp.concatenate(
            [MinvJT_arm, Jf[:, nv_r:] * inv_flat[None, :]], axis=1)
    else:
        MinvJT = MinvJT_arm

    vel = (Jf @ v_all).reshape(ncon, 3)
    a0 = (Jf @ a_smooth).reshape(ncon, 3)

    # impedance + reference acceleration (solver.kbi with static k, b)
    r_vio = -depth
    d_imp = solver_mod.impedance(
        tuple(jnp.asarray(meta.solimp[:, i], dtype) for i in range(5)), r_vio)
    k_r = jnp.asarray(meta.k_row, dtype)
    b_r = jnp.asarray(meta.b_row, dtype)
    aref = jnp.concatenate([
        (-b_r * vel[:, 0] - k_r * d_imp * r_vio)[:, None],
        -b_r[:, None] * vel[:, 1:]], axis=1)                     # [ncon,3]

    diagA = (Jf * MinvJT).sum(axis=1).reshape(ncon, 3)
    Rr = (1 - d_imp)[:, None] / jnp.maximum(d_imp, 1e-6)[:, None] * diagA
    Rreg = Rr.at[:, 1:].set(Rr[:, 1:] / meta.impratio)
    Rflat = Rreg.reshape(n)
    b0 = (a0 - aref).reshape(n)

    active = depth > 0.0
    mu = jnp.asarray(meta.mu, dtype)

    # block-diagonal circular-cone-preserving scaling (solver.solve_contacts)
    dA = (diagA + Rreg).reshape(ncon, 3)
    sn = jnp.maximum(dA[:, 0], 1e-10)
    st = jnp.maximum(0.5 * (dA[:, 1] + dA[:, 2]), 1e-10)
    s = jnp.stack([sn, st, st], axis=1).reshape(n)
    s_half = jnp.sqrt(s)
    mu_s = mu * jnp.sqrt(st / sn)
    mask = jnp.repeat(active, 3).astype(dtype)
    inv_sh = mask / s_half
    bh = b0 * inv_sh

    def matvec(y):
        x = inv_sh * y
        t = MinvJT.T @ x                                         # [nv]
        u = Jf @ t + Rflat * x
        return inv_sh * u

    v = jnp.ones(n, dtype)
    def power(_, v):
        v = matvec(v)
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    v = jax.lax.fori_loop(0, 6, power, v)
    # The Rayleigh quotient only ever UNDER-estimates lambda_max; a 1.78x
    # underestimate was observed for an 8-contact two-finger squeeze (slow
    # power-iteration convergence on its near-degenerate spectrum), and a
    # too-large step makes APGD diverge (solved forces ~1800 N, grasped box
    # ejected at 1e4 rad/s). The 1.5 safety factor costs ~sqrt(1.5) extra
    # iterations of accuracy but makes the step provably safe for spectra
    # within 50% of the estimate.
    L = 1.5 * jnp.maximum(v @ matvec(v), 1.0)
    step = 1.0 / L

    def proj(fh):
        return solver_mod._project_cone_rows(
            fh.reshape(ncon, 3), mu_s, active).reshape(n)

    fh = proj(warm.reshape(n) * s_half * mask)
    theta = jnp.ones((), dtype)

    def body(_, carry):
        fh, y, theta = carry
        g = matvec(y) + bh
        f_new = proj(y - step * g)
        df = f_new - fh
        restart = jnp.sum(g * df) > 0.0
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (jnp.sqrt(theta ** 4 + 4 * theta ** 2) - theta ** 2)
        beta = theta * (1 - theta) / (theta ** 2 + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        return f_new, f_new + beta * df, theta_new

    fh, _, _ = jax.lax.fori_loop(0, meta.n_iters, body, (fh, fh, theta))
    f_flat = fh / s_half * mask
    qfrc = Jf.T @ f_flat
    return f_flat.reshape(ncon, 3), qfrc


def phase_single(meta: ContactMeta, pts, normal, depth, axes, anchors,
                 Minv_arm, v_all, a_smooth, free_pos, free_quat, warm):
    """Per-env reference implementation (see module docstring)."""
    Jf = build_rows(meta, pts, normal, axes, anchors, free_pos, free_quat)
    return phase_core(meta, Jf, depth, Minv_arm, v_all, a_smooth, warm)


# --- implementation selection -------------------------------------------------
# None: pallas on TPU for batched calls, jnp otherwise.
# "jnp" / "pallas": force (pallas uses interpret mode off-TPU — for tests).
_FORCE_IMPL = None


def set_impl(impl):
    global _FORCE_IMPL
    assert impl in (None, "jnp", "pallas")
    _FORCE_IMPL = impl


def make_contact_phase(scene):
    """Contact phase for `scene`, batch-aware.

    Returns fn(pts, normal, depth, axes, anchors, Minv_arm, v_all, a_smooth,
    free_pos, free_quat, warm) -> (f [ncon,3], qfrc [nv]); under jax.vmap the
    Pallas TPU kernel handles the whole batch (custom_vmap rule)."""
    meta = build_meta(scene)
    single = functools.partial(phase_single, meta)

    wrapped = jax.custom_batching.custom_vmap(single)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        from d3il_tpu.engine import contact_kernel
        args = [a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)]
        impl = _FORCE_IMPL
        if impl is None:
            # Pallas needs a VMEM-legal >=128-lane tile (sub-128 tiles still
            # occupy 128 VMEM lanes, so they can never fit a scene the full
            # tile can't — pick_tile returns 0 for those). Big scenes
            # (sorting_4/6, inserting) take the vmapped jnp path, which runs
            # clean at full eval batch now that the APGD step is safe (the
            # round-3 UNAVAILABLE device faults traced to the diverging
            # solver, not to the jnp lowering).
            tile = contact_kernel.pick_tile(meta)
            use_pallas = (jax.default_backend() == "tpu"
                          and axis_size >= 64 and tile >= 128)
            impl = "pallas" if use_pallas else "jnp"
        if impl == "pallas":
            outs = contact_kernel.phase_batched(
                meta, *args, interpret=jax.default_backend() != "tpu")
        else:
            outs = jax.vmap(single)(*args)
        return outs, (True, True)

    return wrapped
