"""Quintic p2p trajectory vs the reference's scipy B-spline construction."""
import numpy as np
import jax.numpy as jnp
from scipy.interpolate import make_interp_spline

from d3il_tpu.ops import spline


def test_matches_scipy_bspline():
    # reference: make_interp_spline(x=[0,T], y=[a,b], k=5, zero 1st/2nd derivs)
    # (TrajectoryTracking.py:250-258)
    duration, dt = 0.5, 1e-3
    a = np.array([0.1, -0.3, 1.2])
    b = np.array([0.9, 0.4, -0.5])
    ours = np.asarray(spline.p2p_trajectory(jnp.array(a), jnp.array(b), duration, dt))
    t = np.linspace(0, duration, int(duration / dt) + 1)
    for i in range(3):
        l, r = [(1, 0.0), (2, 0.0)], [(1, 0.0), (2, 0.0)]
        bs = make_interp_spline(x=[0, duration], y=[a[i], b[i]], bc_type=(l, r), k=5)
        np.testing.assert_allclose(ours[:, i], bs(t), atol=2e-6)  # f32 eval


def test_boundary_conditions():
    a, b = jnp.array([0.0]), jnp.array([1.0])
    p0, v0 = spline.p2p_eval(a, b, 1.0, 0.0)
    p1, v1 = spline.p2p_eval(a, b, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(p0), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p1), 1.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v0), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), 0.0, atol=1e-9)
