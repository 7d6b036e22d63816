"""Closed-form batched small-matrix solvers for the physics/control hot loop.

XLA's generic `eigh` / `cho_factor` lower to iterative algorithms that cost
milliseconds per call on TPU for the tiny (3x3..9x9) systems the simulator
solves thousands of times per trajectory (measured: one batched [B,6,6] eigh
inside the IK scan = 7.5 ms — 790 of the 980 ms of a full Pushing env step).
These replacements are straight-line adjugate / Schur-complement formulas:
a handful of fused elementwise ops + 3x3 matmuls, which XLA fuses into the
surrounding computation at ~microsecond cost.

All functions operate on the last two axes and broadcast over leading batch
dimensions. Intended for well-conditioned SPD systems (mass matrices,
regularized Gram matrices); no pivoting.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 3, 3] matrices (adjugate / determinant)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    cof = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return cof * inv_det[..., None, None]


def inv6(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., 6, 6] SPD matrices via 3x3-block Schur complement."""
    P, Q = M[..., :3, :3], M[..., :3, 3:]
    R, S = M[..., 3:, :3], M[..., 3:, 3:]
    Pinv = inv3(P)
    Sc = S - R @ Pinv @ Q
    Scinv = inv3(Sc)
    PiQ = Pinv @ Q
    RPi = R @ Pinv
    TL = Pinv + PiQ @ Scinv @ RPi
    TR = -PiQ @ Scinv
    BL = -Scinv @ RPi
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Scinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inv9(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of [..., 9, 9] SPD matrices via 6+3 block Schur complement."""
    P, Q = M[..., :6, :6], M[..., :6, 6:]
    R, S = M[..., 6:, :6], M[..., 6:, 6:]
    Pinv = inv6(P)
    Sc = S - R @ Pinv @ Q
    Scinv = inv3(Sc)
    PiQ = Pinv @ Q
    RPi = R @ Pinv
    TL = Pinv + PiQ @ Scinv @ RPi
    TR = -PiQ @ Scinv
    BL = -Scinv @ RPi
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Scinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky factor L (lower) of [..., n, n] SPD matrices.

    Straight-line scalar DAG (n^3/6 fused multiply-adds + n sqrt/div) that
    XLA fuses like the adjugate formulas, but — unlike the nested-Schur
    block inverses above — is backward-stable: the Panda arm mass matrix
    near wrist-aligned configurations makes the [:3,:3] leading block of the
    Schur recursion nearly singular, and inv9's f32 error there reached
    ~15% with a 0.5 asymmetry, enough to pump energy into the gravity-free
    joints (sustained ~0.5 rad/s limit cycles under plain joint-PD hold)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    z = jnp.zeros_like(A[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else z for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def tri_solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Unrolled forward substitution: solve L Y = B, B [..., n, m]."""
    n = L.shape[-1]
    Y = [None] * n
    for i in range(n):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[..., i, k:k + 1] * Y[k]
        Y[i] = s / L[..., i, i:i + 1]
    return jnp.stack(Y, axis=-2)


def tri_solve_upper(U: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Unrolled back substitution: solve U X = B, U upper-triangular."""
    n = U.shape[-1]
    X = [None] * n
    for i in range(n - 1, -1, -1):
        s = B[..., i, :]
        for k in range(i + 1, n):
            s = s - U[..., i, k:k + 1] * X[k]
        X[i] = s / U[..., i, i:i + 1]
    return jnp.stack(X, axis=-2)


def chol_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) X = B given the Cholesky factor."""
    return tri_solve_upper(jnp.swapaxes(L, -1, -2), tri_solve_lower(L, B))


def inv_spd(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of small SPD matrices by Cholesky factor + substitution
    against I (backward-stable; explicitly symmetrized).

    The former nested-Schur adjugate inverses (inv6/inv9 above, kept for the
    tests that characterize them) lose up to 15% accuracy in f32 on Panda
    mass matrices near wrist-aligned configurations; substitution stays at
    the eps*cond floor (~1e-6 for cond ~1e2)."""
    n = M.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    X = chol_solve(chol(M), I)
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def clamped_spd_solve(A: jnp.ndarray, b: jnp.ndarray, lo: float) -> jnp.ndarray:
    """Approximate the eigenvalue-clamped solve V diag(1/max(w, lo)) V' b.

    Mirrors the reference IK controller's SVD clamp of the symmetric PSD
    system J W J' (IKControllers.py:230-234) without an eigendecomposition:
    one Tikhonov solve (A + lo I)^-1 b plus one step of iterative refinement,
    i.e. the spectral filter f(w) = (w + 2 lo) / (w + lo)^2. For w >> lo this
    is 1/w to second order; for w -> 0 it saturates near the clamp value 1/lo
    (within a factor 2), exactly the regularization role the clamp plays.
    The reference's upper clamp (1e2) never binds for this system
    (lambda_max(J W J') <= tr <= ~40 for a unit-weight Panda Jacobian) and is
    dropped.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    Ainv = inv_spd(A + lo * eye)
    x0 = jnp.einsum("...ij,...j->...i", Ainv, b)
    return x0 + lo * jnp.einsum("...ij,...j->...i", Ainv, x0)
