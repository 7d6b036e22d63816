"""Point-to-point quintic trajectories, closed form and batched.

The reference generates goto trajectories with a degree-5 B-spline through two
points with zero first/second derivatives at both ends
(TrajectoryTracking.py:250-258, `make_interp_spline(k=5, bc_type=...)`).
That interpolant is the unique quintic polynomial with those boundary
conditions, i.e. the classic smoothstep:

    s(u) = 10 u^3 - 15 u^4 + 6 u^5,     u = t / T in [0, 1]

so we evaluate it in closed form — no spline solve, fully vectorized, and
identical values to the reference's scipy construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quintic_blend(u: jax.Array) -> jax.Array:
    """Minimum-jerk blend s(u) with s(0)=0, s(1)=1, zero vel/acc at ends."""
    u = jnp.clip(u, 0.0, 1.0)
    return u * u * u * (10.0 + u * (-15.0 + 6.0 * u))


def quintic_blend_vel(u: jax.Array) -> jax.Array:
    """ds/du."""
    u = jnp.clip(u, 0.0, 1.0)
    return u * u * (30.0 + u * (-60.0 + 30.0 * u))


def p2p_trajectory(p0: jax.Array, p1: jax.Array, duration, dt) -> jax.Array:
    """Sample the quintic point-to-point trajectory.

    Returns positions of shape [n_steps + 1, dim] over t = 0..duration
    inclusive, matching the reference's `np.linspace(0, duration,
    int(duration/dt)+1)` time grid (TrajectoryTracking.py:240-244).
    """
    n = int(round(duration / dt)) + 1
    u = jnp.linspace(0.0, 1.0, n)
    s = quintic_blend(u)[:, None]
    return p0[None, :] + (p1 - p0)[None, :] * s


def p2p_eval(p0: jax.Array, p1: jax.Array, duration, t):
    """Evaluate position and velocity of the quintic p2p trajectory at time t.

    Fully traced (t may be a tracer); clamps beyond [0, duration].
    """
    u = jnp.clip(t / duration, 0.0, 1.0)
    s = quintic_blend(u)
    sd = quintic_blend_vel(u) / duration
    pos = p0 + (p1 - p0) * s
    vel = (p1 - p0) * sd
    return pos, vel
