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


def solve_contacts(A, b0, mu, active, n_iters: int):
    """Projected block Gauss-Seidel on the dual contact QP.

    A: [nc, 3, nc, 3] (dense, small nc), b0: [nc, 3], mu: [nc],
    active: [nc] bool. Returns contact forces f [nc, 3].
    """
    nc = b0.shape[0]
    f = jnp.zeros_like(b0)
    Af = A.reshape(nc * 3, nc * 3)

    # block diagonal inverses (3x3), regularized
    diag = jnp.einsum("ckcl->ckl", A)  # [nc,3,3]
    eye = jnp.eye(3, dtype=b0.dtype)
    diag_inv = jnp.linalg.inv(diag + 1e-10 * eye[None])

    def sweep(_, f):
        def body(i, f):
            g = (Af @ f.reshape(-1)).reshape(nc, 3)[i] + b0[i]
            cand = f[i] - diag_inv[i] @ g
            cand = _project_cone(cand, mu[i])
            cand = jnp.where(active[i], cand, jnp.zeros_like(cand))
            return f.at[i].set(cand)
        return jax.lax.fori_loop(0, nc, body, f)

    return jax.lax.fori_loop(0, n_iters, sweep, f)
