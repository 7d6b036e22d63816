"""Soft-constraint contact solver (MuJoCo constraint model, dual block-PGS).

Implements MuJoCo's contact dynamics formulation:

  * per-contact impedance d(r) from solimp = (d0, dwidth, width, mid, power),
  * reference acceleration aref = -b v - k d(r) r with
      b = 2 / (dmax * timeconst),  k = 1 / (dmax^2 tc^2 dampratio^2)
    from solref = (timeconst, dampratio),
  * regularizer R_i = (1 - d_i)/d_i * A_ii,
  * dual problem  min_{f in cone}  1/2 f'(A + R)f + f'(b0)
    with A = J M^-1 J', b0 = J a_smooth - aref,

solved by fixed-iteration projected block Gauss-Seidel: each 3x3 contact
block is solved exactly and projected onto the friction cone (elliptic
projection). Fixed iteration counts and masking keep the whole solve inside
one XLA computation; `impratio` stiffens the frictional rows as in MuJoCo's
elliptic-cone model.

This replaces the reference's reliance on MuJoCo's built-in Newton solver
(mj_step via sims/mj_beta/MjScene.py:110) with a batched, vmap-first solver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def impedance(solimp, r):
    """MuJoCo solimp sigmoid: position-dependent impedance d(r) in (0,1)."""
    d0, dw, width, mid, power = solimp
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    # two-sided power sigmoid with midpoint
    a = 1.0 / mid ** (power - 1)
    b = 1.0 / (1.0 - mid) ** (power - 1)
    y_lo = a * x ** power
    y_hi = 1.0 - b * (1.0 - x) ** power
    y = jnp.where(x < mid, y_lo, y_hi)
    return d0 + y * (dw - d0)


def kbi(solref, solimp, r):
    """Stiffness k, damping b, impedance d for one constraint with violation r."""
    timeconst, dampratio = solref
    d = impedance(solimp, r)
    dmax = solimp[1]
    b = 2.0 / jnp.maximum(dmax * timeconst, 1e-12)
    k = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst
                          * dampratio * dampratio, 1e-12)
    return k, b, d


def _project_cone(f, mu):
    """Project (fn, ft1, ft2) onto the friction cone {||ft|| <= mu fn}."""
    fn, ft = f[0], f[1:]
    t = jnp.linalg.norm(ft)
    # region 1: inside cone
    inside = t <= mu * fn
    # region 2: polar cone (below) -> zero
    below = mu * t <= -fn
    # region 3: project to cone surface
    fn_p = (fn + mu * t) / (1.0 + mu * mu)
    scale = mu * fn_p / jnp.maximum(t, 1e-12)
    f_proj = jnp.concatenate([fn_p[None], ft * scale])
    out = jnp.where(inside, f, jnp.where(below, jnp.zeros_like(f), f_proj))
    return out


def _project_cone_rows(f, mu, active):
    """Vectorized elliptic friction-cone projection over contact rows.

    f: [nc, 3] (fn, ft1, ft2); mu: [nc]; active: [nc] bool -> [nc, 3].
    """
    fn, ft = f[:, 0], f[:, 1:]
    t = jnp.linalg.norm(ft, axis=1)
    inside = t <= mu * fn
    below = mu * t <= -fn
    fn_p = (fn + mu * t) / (1.0 + mu * mu)
    scale = mu * fn_p / jnp.maximum(t, 1e-12)
    f_proj = jnp.concatenate([fn_p[:, None], ft * scale[:, None]], axis=1)
    out = jnp.where(inside[:, None], f,
                    jnp.where(below[:, None], jnp.zeros_like(f), f_proj))
    return jnp.where(active[:, None], out, jnp.zeros_like(out))


def solve_contacts(A, b0, mu, active, n_iters: int, f0=None):
    """Preconditioned APGD on the dual contact QP
    min_{f in cone} 1/2 f'Af + f'b0.

    Accelerated projected gradient descent (Nesterov momentum + adaptive
    restart; the scheme production rigid-body engines use for cone QPs).
    Unlike the textbook projected block Gauss-Seidel — whose nc-sequential
    inner sweeps made the physics hot loop latency-bound — every iteration
    here is one batched matvec + an elementwise cone projection, so the
    whole solve is ~n_iters ops deep regardless of contact count and vmaps
    cleanly over env batches.

    Preconditioning: each contact block is scaled by diag(sn, st, st)^-1/2
    with sn/st the block's normal/mean-tangential diagonal. An equal scale
    on both tangential axes keeps the friction cone circular in the scaled
    variables (mu' = mu sqrt(st/sn)), so the projection stays closed-form
    while the Lipschitz spread — and hence the iteration count — drops.
    The step size comes from a short power iteration on the scaled matrix.

    A: [nc, 3, nc, 3] (dense, small nc), b0: [nc, 3], mu: [nc],
    active: [nc] bool, f0: optional warm start [nc, 3] (MuJoCo warm-starts
    its solver from the previous step's solution the same way).
    Returns contact forces f [nc, 3].
    """
    nc = b0.shape[0]
    n = nc * 3
    dtype = b0.dtype
    Af = A.reshape(n, n)
    act_flat = jnp.repeat(active, 3)

    # block-diagonal scaling, circular-cone preserving
    dA = jnp.diagonal(Af)                      # [n]
    d3 = dA.reshape(nc, 3)
    sn = jnp.maximum(d3[:, 0], 1e-10)
    st = jnp.maximum(0.5 * (d3[:, 1] + d3[:, 2]), 1e-10)
    s = jnp.stack([sn, st, st], axis=1).reshape(n)     # [n]
    s_half = jnp.sqrt(s)
    mu_s = mu * jnp.sqrt(st / sn)

    # scaled, masked system: Ah = S^-1/2 A S^-1/2, bh = S^-1/2 b
    mask = act_flat.astype(dtype)
    inv_sh = mask / s_half
    Ah = Af * (inv_sh[:, None] * inv_sh[None, :])
    bh = b0.reshape(n) * inv_sh

    # Lipschitz constant of the scaled system: short power iteration
    v = jnp.ones(n, dtype)
    def power(_, v):
        v = Ah @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    v = jax.lax.fori_loop(0, 6, power, v)
    # 1.5x safety on the Rayleigh quotient, which only under-estimates
    # lambda_max (see contact.phase_core: a 1.78x shortfall made APGD
    # diverge on a two-finger squeeze)
    L = 1.5 * jnp.maximum(v @ (Ah @ v), 1.0)  # scaled diag is 1 -> L >= 1
    step = 1.0 / L

    def proj(fh):
        return _project_cone_rows(fh.reshape(nc, 3), mu_s,
                                  active).reshape(n)

    fh = (jnp.zeros(n, dtype) if f0 is None
          else f0.reshape(n) * s_half * mask)
    fh = proj(fh)
    y = fh
    theta = jnp.ones((), dtype)

    def body(_, carry):
        fh, y, theta = carry
        g = Ah @ y + bh
        f_new = proj(y - step * g)
        # adaptive restart: kill momentum when the gradient opposes progress
        df = f_new - fh
        restart = jnp.sum(g * df) > 0.0
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (jnp.sqrt(theta ** 4 + 4 * theta ** 2) - theta ** 2)
        beta = theta * (1 - theta) / (theta ** 2 + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        y_new = f_new + beta * df
        return f_new, y_new, theta_new

    fh, _, _ = jax.lax.fori_loop(0, n_iters, body, (fh, y, theta))
    return (fh / s_half * mask).reshape(nc, 3)
