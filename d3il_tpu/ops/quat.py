"""Batched quaternion / rotation ops (wxyz convention), JAX-native.

Provides the rotation algebra used throughout the framework: the simulator
state, controllers and env observations all use scalar-first ``[w, x, y, z]``
quaternions, matching MuJoCo and the reference framework's convention
(reference: environments/d3il/d3il_sim/utils/geometric_transformation.py).

All functions broadcast over leading batch dimensions and are jit/vmap/grad
safe. Euler conventions follow the reference's extrinsic-XYZ ("rotation.py"
style) functions so that dataset yaw encodings (tan(yaw)) agree bitwise-ish.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize quaternion(s) along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def mul(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """Hamilton product q0 * q1 (wxyz).

    Matches `quat_mul` in the reference geometry utils
    (geometric_transformation.py:197).
    """
    w0, x0, y0, z0 = jnp.moveaxis(q0, -1, 0)
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    return jnp.stack(
        [
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ],
        axis=-1,
    )


def conj(q: jax.Array) -> jax.Array:
    """Quaternion conjugate."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., 1:]
    qw = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return rotate(conj(q), v)


def to_mat(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (normalizing first)."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_mat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> quaternion (wxyz), branch-free Shepperd.

    Uses the standard 4-candidate construction selected by the largest
    diagonal combination; safe under jit/vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick by the largest of (tr, m00, m11, m22).
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_error(curr: jax.Array, des: jax.Array) -> jax.Array:
    """Orientation error e such that e ~ axis*angle/2 between curr and des.

    Siciliano Eq. 3.91 form, identical in value to the reference's
    `get_quaternion_error` (geometric_transformation.py:14-46):
      e = w_c * v_d - w_d * v_c - v_d x v_c
    Returns shape [..., 3].
    """
    wc, vc = curr[..., :1], curr[..., 1:]
    wd, vd = des[..., :1], des[..., 1:]
    return wc * vd - wd * vc - jnp.cross(vd, vc)


def from_euler(euler: jax.Array) -> jax.Array:
    """Euler angles -> quaternion, matching the reference `euler2quat`.

    The reference uses the OpenAI-gym "rotations.py" convention
    (geometric_transformation.py:73-90). For a pure z rotation (yaw), this
    yields [cos(y/2), 0, 0, sin(y/2)].
    """
    ai, aj, ak = euler[..., 2] / 2, -euler[..., 1] / 2, euler[..., 0] / 2
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            cj * cc + sj * ss,       # w
            cj * cs - sj * sc,       # x
            -(cj * ss + sj * cc),    # y
            cj * sc - sj * cs,       # z
        ],
        axis=-1,
    )


def to_euler(q: jax.Array) -> jax.Array:
    """Quaternion -> Euler angles, matching the reference `quat2euler`
    (= `mat2euler(quat2mat(q))`, geometric_transformation.py:92-155).

    Returns [..., 3] with [-1] the yaw used in env observations.
    """
    m = to_mat(q)
    eps4 = 4.0 * jnp.finfo(m.dtype).eps
    cy = jnp.sqrt(m[..., 2, 2] ** 2 + m[..., 1, 2] ** 2)
    cond = cy > eps4
    e2 = jnp.where(
        cond,
        -jnp.arctan2(m[..., 0, 1], m[..., 0, 0]),
        -jnp.arctan2(-m[..., 1, 0], m[..., 1, 1]),
    )
    e1 = -jnp.arctan2(-m[..., 0, 2], cy)
    e0 = jnp.where(cond, -jnp.arctan2(m[..., 1, 2], m[..., 2, 2]), 0.0)
    return jnp.stack([e0, e1, e2], axis=-1)


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion."""
    half = angle / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate a body-local angular velocity over dt (MuJoCo mju_quatIntegrate
    semantics: exact exponential map, local frame).

    q_{t+1} = q_t * exp(0.5 * omega * dt).
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    half = 0.5 * dt * angle
    # sinc-safe axis*sin term
    k = jnp.where(angle > 1e-9, jnp.sin(half) / jnp.maximum(angle, 1e-9), 0.5 * dt)
    dq = jnp.concatenate([jnp.cos(half), omega * k], axis=-1)
    return normalize(mul(q, dq))
