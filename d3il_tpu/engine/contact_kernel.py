"""Batch-minor Pallas TPU kernel for the contact phase (see engine/contact.py).

Layout: every tensor is [..., B] with the env batch on the 128-lane axis, so
the per-env small-matrix algebra (constraint rows [n, nv], Delassus matvecs,
cone projections) becomes perfectly-tiled VPU work: a [n, nv, Bt] multiply is
n x ceil(nv/8) full (8, 128) vector ops with zero padding waste, versus the
batch-major vmap form where the same math pads 3/21-wide minor dims to 128
lanes (~20x bandwidth inflation, measured as the dominant cost of the physics
substep).

The kernel runs the whole phase per batch tile entirely in VMEM:
  contact frames -> constraint Jacobian rows -> M^-1 J' -> impedance model ->
  preconditioned matrix-free APGD (power-iteration step size, Nesterov +
  adaptive restart) -> contact forces f and generalized forces J' f.

Static per-scene row metadata (ancestor masks, free-body selectors, solimp
constants) is passed as small batch-invariant VMEM inputs — Pallas kernels
may not capture array constants.

Grid: (ceil(B / Bt),) over batch tiles; tiles never interact. Bt adapts to
the scene's constraint count so VMEM stays bounded (pick_tile).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # working-set target per tile (bytes)


def pick_tile(meta) -> int:
    """Largest batch tile (lane count) keeping the working set in VMEM.

    Returns 0 when no tile fits: VMEM lane tiles are (x, 128), so a sub-128
    batch tile still occupies 128 lanes of VMEM — shrinking bt below 128
    saves nothing (measured: a bt=16 sorting_6 kernel still allocated 30.8 MB
    scoped VMEM). Scenes whose working set exceeds the budget at bt=128 use
    the jnp path at a reduced eval batch instead."""
    n = 3 * meta.ncon
    floats = (3 * n * meta.nv                      # Jf, MinvJT, matvec temp
              + 5 * meta.ncon * max(meta.nv_r, 6) * 3   # row-assembly temps
              + 12 * n)                            # flat vectors
    for bt in (512, 256, 128):
        if floats * 4 * bt <= _VMEM_BUDGET:
            return bt
    return 0


def _b2(x, shape):
    """Mosaic-safe broadcast_to: expand the lane (minor-most) dim first,
    then sublanes/major dims in a second op — Mosaic has no fused
    "broadcast in both sublanes and lanes" (vector.broadcast rejects
    e.g. [n,1,1] -> [n,3,128])."""
    if x.shape == tuple(shape):
        return x
    if x.ndim < len(shape):
        x = x.reshape((1,) * (len(shape) - x.ndim) + x.shape)
    if x.shape[-1] != shape[-1] and x.shape[-2] != shape[-2]:
        # Expand sublanes by explicit concatenation: a plain two-step
        # broadcast (or a *1.0 multiply) gets canonicalized back into one
        # both-minor-dims vector.broadcast, which Mosaic rejects.
        if x.shape[-2] != 1:
            raise NotImplementedError(
                "_b2 can only expand a unit sublane dim by concatenation "
                f"(Mosaic restriction), got {x.shape} -> {tuple(shape)}")
        # chunked concat keeps each concatenate <= 8 operands (Mosaic limit);
        # pick reps dividing the remaining factor so progress is guaranteed
        # (greedy min(8, target//cur) stalls on e.g. target 12: 1->8, 12//8=1)
        while x.shape[-2] < shape[-2]:
            rem = shape[-2] // x.shape[-2]
            reps = next((r for r in range(min(8, rem), 1, -1) if rem % r == 0),
                        None)
            if reps is None or shape[-2] % x.shape[-2] != 0:
                raise NotImplementedError(
                    f"_b2 cannot reach sublane count {shape[-2]} from "
                    f"{x.shape[-2]} by <=8-way concatenation")
            x = jnp.concatenate([x] * reps, axis=-2)
    return jnp.broadcast_to(x, shape)


def _ix(a, i, axis):
    """Static squeezing index: lowers as slice+squeeze. Mixing an integer
    index with None in one bracket routes through jnp's gather path, which
    Mosaic only supports in 2D — never do `a[:, None, :, i]` in a kernel."""
    return jax.lax.index_in_dim(a, i, axis, keepdims=False)


def _cross(a, b, axis):
    """Cross product of [..., 3, ...] stacked arrays along `axis`."""
    ax, ay, az = (jax.lax.index_in_dim(a, i, axis, keepdims=False)
                  for i in range(3))
    bx, by, bz = (jax.lax.index_in_dim(b, i, axis, keepdims=False)
                  for i in range(3))
    return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx],
                     axis=axis)


def _quat_to_mat_bm(q):
    """[nf, 4, B] wxyz quaternions -> [nf, 3, 3, B] rotation matrices."""
    w, x, y, z = (_ix(q, i, 1) for i in range(4))
    r = [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
         [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
         [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]]
    return jnp.stack([jnp.stack(row, axis=1) for row in r], axis=1)


# row_const columns (static per constraint row)
_K, _B, _MU, _D0, _DW, _WIDTH, _MID, _AC, _BC = range(9)


def _row_const(meta) -> np.ndarray:
    """[ncon, 9] static row constants (kbi + impedance-sigmoid coefficients;
    assumes solimp power == 2, the MuJoCo default used by every scene)."""
    si = meta.solimp
    assert np.all(si[:, 4] == 2.0), "impedance power != 2 unsupported in kernel"
    mid = si[:, 3]
    return np.stack([
        meta.k_row, meta.b_row, meta.mu, si[:, 0], si[:, 1],
        np.maximum(si[:, 2], 1e-12), mid, 1.0 / mid, 1.0 / (1.0 - mid)],
        axis=1).astype(np.float32)


def _make_kernel(meta):
    ncon, nv_r, nf, nv = meta.ncon, meta.nv_r, meta.nf, meta.nv
    n = 3 * ncon
    dtype = jnp.float32
    IMPRATIO = float(meta.impratio)
    N_ITERS = int(meta.n_iters)

    def kernel(pts_r, nrm_r, dep_r, axes_r, anch_r, minv_r, v_r, asm_r,
               fpos_r, fquat_r, warm_r, rowc_r, mask_r, ish_r, oha3_r, ohb3_r,
               oha4_r, ohb4_r, invf_r, fout_r, qout_r):
        # Static metadata arrives pre-shaped to its final rank (see
        # _static_inputs): Mosaic rejects shape casts that move a 2D
        # vector's minor dims into major positions (e.g. [ncon, nv_r] ->
        # [ncon, nv_r, 1, 1]), so the kernel must never unsqueeze them.
        pts = pts_r[...]                                   # [ncon, 3, Bt]
        bt = pts.shape[-1]
        nrm = nrm_r[...]
        dep = dep_r[...]                                   # [ncon, Bt]
        axes = axes_r[...]                                 # [nv_r, 3, Bt]
        anch = anch_r[...]
        Minv = minv_r[...]                                 # [nv_r, nv_r, Bt]
        v_all = v_r[...]                                   # [nv, Bt]
        a_sm = asm_r[...]
        rowc = rowc_r[...]                                 # [ncon, 9]
        mask_rob = mask_r[...]                             # [ncon, nv_r, 1, 1]
        is_h = ish_r[...]                                  # [1, nv_r, 1, 1]

        # ---- contact frames (n, t1, t2) ----
        nx, ny, nz = _ix(nrm, 0, 1), _ix(nrm, 1, 1), _ix(nrm, 2, 1)       # [ncon, Bt]
        big = jnp.abs(nz) < 0.9
        rx = jnp.where(big, 0.0, 1.0).astype(dtype)
        rz = jnp.where(big, 1.0, 0.0).astype(dtype)
        t1x = ny * rz
        t1y = nz * rx - nx * rz
        t1z = -ny * rx
        t1n = jnp.maximum(jnp.sqrt(t1x * t1x + t1y * t1y + t1z * t1z), 1e-9)
        t1x, t1y, t1z = t1x / t1n, t1y / t1n, t1z / t1n
        t2x = ny * t1z - nz * t1y
        t2y = nz * t1x - nx * t1z
        t2z = nx * t1y - ny * t1x
        frames = jnp.stack([
            jnp.stack([nx, ny, nz], axis=1),
            jnp.stack([t1x, t1y, t1z], axis=1),
            jnp.stack([t2x, t2y, t2z], axis=1)], axis=1)   # [ncon,3d,3c,Bt]

        # ---- robot columns (one signed ancestor mask, same point both sides)
        diff = pts[:, None] - anch[None]                   # [ncon,nv_r,3,Bt]
        axb = jnp.broadcast_to(axes[None], diff.shape)
        cr = _cross(axb, diff, axis=2)
        ish = _b2(is_h, cr.shape)
        base = ish * cr + (1.0 - ish) * axb
        base = _b2(mask_rob, base.shape) * base            # [ncon,nv_r,3,Bt]
        J_rob = sum(_ix(frames, c, 2)[:, :, None] * _ix(base, c, 2)[:, None]
                    for c in range(3))                     # [ncon,3,nv_r,Bt]

        # ---- free-body columns ----
        if nf:
            fpos = fpos_r[...]                             # [nf, 3, Bt]
            Rb = _quat_to_mat_bm(fquat_r[...])             # [nf, 3, 3, Bt]
            oh_a3 = oha3_r[...]                            # [ncon, nf, 1]
            oh_b3 = ohb3_r[...]
            oh_a4 = oha4_r[...]                            # [ncon, nf, 1, 1]
            oh_b4 = ohb4_r[...]
            invf = invf_r[...]                             # [1, 1, 6nf, 1]

            def sel(oh, f):  # static slice of the pre-shaped onehots
                return jax.lax.slice_in_dim(oh, f, f + 1, axis=1)

            def side(oh3, oh4):
                sh3 = (ncon, 3, bt)
                sh4 = (ncon, 3, 3, bt)
                pos_sel = sum(_b2(sel(oh3, f), sh3)
                              * _b2(_ix(fpos, f, 0)[None], sh3)
                              for f in range(nf))          # [ncon,3,Bt]
                Rb_sel = sum(_b2(sel(oh4, f), sh4)
                             * _b2(_ix(Rb, f, 0)[None], sh4)
                             for f in range(nf))           # [ncon,3,3,Bt]
                rvec = pts - pos_sel
                # omega_body columns: Rb[:, j] x r
                Jw = jnp.stack([_cross(_ix(Rb_sel, j, 2), rvec, axis=1)
                                for j in range(3)], axis=2)  # [ncon,3c,3j,Bt]
                isf = oh4.sum(axis=1, keepdims=True)       # [ncon,1,1,1]
                Jlin = _b2(isf, sh4) * frames              # [ncon,3d,3,Bt]
                Jang = sum(_ix(frames, c, 2)[:, :, None]
                           * _ix(Jw, c, 1)[:, None]
                           for c in range(3))              # [ncon,3d,3,Bt]
                return jnp.concatenate([Jlin, Jang], axis=2)  # [ncon,3,6,Bt]

            J6a = side(oh_a3, oh_a4)
            J6b = side(oh_b3, oh_b4)
            J_free = jnp.concatenate(
                [_b2(sel(oh_a4, f), J6a.shape) * J6a
                 - _b2(sel(oh_b4, f), J6b.shape) * J6b
                 for f in range(nf)], axis=2)              # [ncon,3,6nf,Bt]
            J = jnp.concatenate([J_rob, J_free], axis=2)
        else:
            J = J_rob                                      # [ncon,3,nv,Bt]
        # Everything below stays in "row-triplet" 4D/3D layout
        # ([ncon, 3, ...]) — no [3*ncon] flattening: those reshapes merge an
        # unrolled dim into the sublane dim, which Mosaic lowers as >2D
        # gathers (unsupported) or relayout copies.

        # ---- M^-1 J' ----
        MJ_arm = sum(_ix(J, m, 2)[:, :, None] * _ix(Minv, m, 0)[None, None]
                     for m in range(nv_r))                 # [ncon,3,nv_r,Bt]
        if nf:
            MinvJT = jnp.concatenate(
                [MJ_arm, J[:, :, nv_r:] * invf], axis=2)
        else:
            MinvJT = MJ_arm                                # [ncon,3,nv,Bt]

        vel3 = (J * v_all[None, None]).sum(axis=2)         # [ncon,3,Bt]
        a03 = (J * a_sm[None, None]).sum(axis=2)
        diag3 = (J * MinvJT).sum(axis=2)

        # ---- impedance d(r) (solver.impedance, power == 2) ----
        r_vio = -dep                                       # [ncon, Bt]
        d0 = rowc[:, _D0:_D0 + 1]
        dw = rowc[:, _DW:_DW + 1]
        mid = rowc[:, _MID:_MID + 1]
        x = jnp.clip(jnp.abs(r_vio) / rowc[:, _WIDTH:_WIDTH + 1], 0.0, 1.0)
        y_lo = rowc[:, _AC:_AC + 1] * x * x
        om = 1.0 - x
        y_hi = 1.0 - rowc[:, _BC:_BC + 1] * om * om
        d_imp = d0 + jnp.where(x < mid, y_lo, y_hi) * (dw - d0)

        k_r = rowc[:, _K:_K + 1]
        b_r = rowc[:, _B:_B + 1]
        aref = jnp.stack([
            -b_r * _ix(vel3, 0, 1) - k_r * d_imp * r_vio,
            -b_r * _ix(vel3, 1, 1),
            -b_r * _ix(vel3, 2, 1)], axis=1)                    # [ncon,3,Bt]
        rr = (1 - d_imp) / jnp.maximum(d_imp, 1e-6)        # [ncon, Bt]
        Rreg = jnp.stack([rr * _ix(diag3, 0, 1),
                          rr * _ix(diag3, 1, 1) / IMPRATIO,
                          rr * _ix(diag3, 2, 1) / IMPRATIO], axis=1)
        b0 = a03 - aref                                    # [ncon,3,Bt]

        active = dep > 0.0                                 # [ncon, Bt]
        dA3 = diag3 + Rreg
        sn = jnp.maximum(_ix(dA3, 0, 1), 1e-10)
        st = jnp.maximum(0.5 * (_ix(dA3, 1, 1) + _ix(dA3, 2, 1)), 1e-10)
        s_half = jnp.sqrt(jnp.stack([sn, st, st], axis=1))  # [ncon,3,Bt]
        mu_s = rowc[:, _MU:_MU + 1] * jnp.sqrt(st / sn)    # [ncon, Bt]
        act = jnp.where(active, 1.0, 0.0).astype(dtype)
        mask = jnp.broadcast_to(act[:, None], (ncon, 3, bt))
        inv_sh = mask / s_half
        bh = b0 * inv_sh

        def matvec(yv):                                    # [ncon,3,Bt]
            xx = inv_sh * yv
            t = (MinvJT * xx[:, :, None]).sum(axis=(0, 1))  # [nv, Bt]
            u = (J * t[None, None]).sum(axis=2)            # [ncon,3,Bt]
            return inv_sh * (u + Rreg * xx)

        v = jnp.ones((ncon, 3, bt), dtype)
        def power_it(_, v):
            v = matvec(v)
            nrm = jnp.sqrt((v * v).sum(axis=(0, 1)))[None, None]
            return v / jnp.maximum(nrm, 1e-12)
        v = jax.lax.fori_loop(0, 6, power_it, v)
        # 1.5x safety: the Rayleigh quotient under-estimates lambda_max and a
        # too-large step diverges (see contact.phase_core)
        L = 1.5 * jnp.maximum((v * matvec(v)).sum(axis=(0, 1)), 1.0)[None]
        step = 1.0 / L

        def proj(f3):
            fn, ft1, ft2 = _ix(f3, 0, 1), _ix(f3, 1, 1), _ix(f3, 2, 1)
            t = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
            inside = t <= mu_s * fn
            below = mu_s * t <= -fn
            fn_p = (fn + mu_s * t) / (1.0 + mu_s * mu_s)
            scale = mu_s * fn_p / jnp.maximum(t, 1e-12)
            o_n = jnp.where(inside, fn, jnp.where(below, 0.0, fn_p))
            o_1 = jnp.where(inside, ft1, jnp.where(below, 0.0, ft1 * scale))
            o_2 = jnp.where(inside, ft2, jnp.where(below, 0.0, ft2 * scale))
            return jnp.stack([o_n, o_1, o_2], axis=1) * act[:, None]

        warm = warm_r[...]                                 # [ncon,3,Bt]
        fh0 = proj(warm * s_half * mask)
        theta0 = jnp.ones((1, bt), dtype)

        def body(_, carry):
            fh, yv, theta = carry
            g = matvec(yv) + bh
            f_new = proj(yv - step[:, None] * g)
            df = f_new - fh
            restart = ((g * df).sum(axis=(0, 1)) > 0.0)[None]  # [1,Bt]
            theta = jnp.where(restart, 1.0, theta)
            theta_new = 0.5 * (jnp.sqrt(theta ** 4 + 4 * theta ** 2)
                               - theta ** 2)
            beta = jnp.where(restart, 0.0,
                             theta * (1 - theta) / (theta ** 2 + theta_new))
            return f_new, f_new + beta[:, None] * df, theta_new

        fh, _, _ = jax.lax.fori_loop(0, N_ITERS, body, (fh0, fh0, theta0))
        f3 = fh / s_half * mask                            # [ncon,3,Bt]
        fout_r[...] = f3
        qout_r[...] = (J * f3[:, :, None]).sum(axis=(0, 1))  # [nv, Bt]

    return kernel


def _phase_batched_impl(meta, pts, normal, depth, axes, anchors, Minv_arm,
                        v_all, a_smooth, free_pos, free_quat, warm,
                        interpret):
    B = pts.shape[0]
    if meta.nf == 0:  # dummy placeholders (kernel ignores them)
        free_pos = jnp.zeros((B, 1, 3), jnp.float32)
        free_quat = jnp.zeros((B, 1, 4), jnp.float32)
    bm = [jnp.moveaxis(jnp.asarray(a, jnp.float32), 0, -1)
          for a in (pts, normal, depth, axes, anchors, Minv_arm,
                    v_all, a_smooth, free_pos, free_quat, warm)]
    f_bm, q_bm = phase_batched_bm(meta, *bm, interpret=interpret)
    f = jnp.moveaxis(f_bm, -1, 0)
    qfrc = jnp.moveaxis(q_bm, -1, 0)
    return f, qfrc


def phase_batched_bm(meta, pts, normal, depth, axes, anchors, Minv_arm,
                     v_all, a_smooth, free_pos, free_quat, warm,
                     interpret=False):
    """Batch-MINOR entry: every arg already [..., B]; returns
    (f [ncon, 3, B], qfrc [nv, B]). Used directly by engine/substep_bm so
    the whole-substep batch-minor pipeline never transposes per call."""
    B = pts.shape[-1]
    bt = pick_tile(meta)
    assert bt >= 128, "phase_batched requires a VMEM-legal tile (pick_tile)"
    B_pad = -(-B // bt) * bt
    nf = meta.nf

    def to_bm(x):
        x = jnp.asarray(x, jnp.float32)
        if B_pad != B:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, B_pad - B)]
            x = jnp.pad(x, pad)
        return x

    if nf == 0:
        free_pos = jnp.zeros((1, 3, B), jnp.float32)
        free_quat = jnp.zeros((1, 4, B), jnp.float32)
    batched = [to_bm(a) for a in (pts, normal, depth, axes, anchors, Minv_arm,
                                  v_all, a_smooth, free_pos, free_quat, warm)]
    oh_a = meta.onehot_a if nf else np.zeros((meta.ncon, 1))
    oh_b = meta.onehot_b if nf else np.zeros((meta.ncon, 1))
    inv_flat = meta.inv_free.reshape(-1) if nf else np.zeros(1)
    # Pre-shaped to final kernel rank: Mosaic can't unsqueeze minor dims, so
    # the onehots ship at both rank 3 and rank 4, derived from one local each.
    oh_a_arr = jnp.asarray(oh_a, jnp.float32)
    oh_b_arr = jnp.asarray(oh_b, jnp.float32)
    static = [
        jnp.asarray(_row_const(meta)),
        jnp.asarray(meta.mask_rob, jnp.float32)[:, :, None, None],
        jnp.asarray(meta.is_hinge, jnp.float32)[None, :, None, None],
        oh_a_arr[:, :, None],
        oh_b_arr[:, :, None],
        oh_a_arr[:, :, None, None],
        oh_b_arr[:, :, None, None],
        jnp.asarray(inv_flat, jnp.float32)[None, None, :, None],
    ]

    def bspec(x):
        s = x.shape[:-1]
        nd = len(s)
        return pl.BlockSpec(s + (bt,),
                            lambda i, _nd=nd: (0,) * _nd + (i,),
                            memory_space=pltpu.VMEM)

    def sspec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    ncon, nv = meta.ncon, meta.nv
    out_shapes = (jax.ShapeDtypeStruct((ncon, 3, B_pad), jnp.float32),
                  jax.ShapeDtypeStruct((nv, B_pad), jnp.float32))
    out_specs = (pl.BlockSpec((ncon, 3, bt), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((nv, bt), lambda i: (0, i),
                              memory_space=pltpu.VMEM))
    f_bm, q_bm = pl.pallas_call(
        _make_kernel(meta),
        grid=(B_pad // bt,),
        in_specs=[bspec(a) for a in batched] + [sspec(s) for s in static],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*batched, *static)
    return f_bm[..., :B], q_bm[..., :B]


def phase_batched(meta, *args, interpret=False):
    return _phase_batched_impl(meta, *args, interpret)
