"""Narrow-phase collision functions, vmap-safe and fixed-output-size.

Each collider returns a fixed number of candidate contacts (pos, normal,
depth); inactive slots carry depth < 0 and are masked in the solver. Normals
point from geom B into geom A (the force on A acts along +normal), matching
MuJoCo's convention of the contact frame normal pointing from geom1 to geom2
being irrelevant as long as Jacobian signs are consistent — here: normal is
the direction pushing A and B apart, applied +n on A and -n on B.

Colliders implemented (all the pairs the D3IL tasks need):
  box-plane, capsule-plane, sphere-plane, box-box (SAT + face clip),
  capsule-box (fixed-point closest-pair), capsule-capsule, sphere-box.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from d3il_tpu.ops import quat as quat_ops


class Contacts(NamedTuple):
    pos: jax.Array     # [k, 3]
    normal: jax.Array  # [k, 3] unit, pushes A away from B
    depth: jax.Array   # [k] penetration depth (>0 means touching)


def _stack(*contacts):
    return Contacts(
        pos=jnp.concatenate([c.pos for c in contacts]),
        normal=jnp.concatenate([c.normal for c in contacts]),
        depth=jnp.concatenate([c.depth for c in contacts]),
    )


_BOX_CORNERS = jnp.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)])


def box_plane(box_pos, box_quat, half_size, plane_pos, plane_normal):
    """Box (A) vs infinite plane (B). Up to 4 contacts: deepest corners."""
    corners = box_pos[None, :] + quat_ops.rotate(
        box_quat[None, :], _BOX_CORNERS.astype(box_pos.dtype) * half_size[None, :])
    depth = jnp.dot(plane_pos, plane_normal) - corners @ plane_normal  # [8]
    # take the 4 deepest corners
    idx = jnp.argsort(-depth)[:4]
    return Contacts(
        pos=corners[idx],
        normal=jnp.broadcast_to(plane_normal, (4, 3)),
        depth=depth[idx],
    )


def sphere_plane(pos, radius, plane_pos, plane_normal):
    d = jnp.dot(pos - plane_pos, plane_normal)
    depth = radius - d
    cpos = pos - plane_normal * (d - 0.5 * depth)
    return Contacts(pos=cpos[None], normal=plane_normal[None], depth=depth[None])


def capsule_plane(pos, quat, radius, half_len, plane_pos, plane_normal):
    """Capsule (A) vs plane: 2 contacts (both endpoints)."""
    axis = quat_ops.rotate(quat, jnp.array([0.0, 0.0, 1.0], pos.dtype))
    ends = jnp.stack([pos + half_len * axis, pos - half_len * axis])
    d = (ends - plane_pos[None]) @ plane_normal
    depth = radius - d
    cpos = ends - plane_normal[None] * (d - 0.5 * depth)[:, None]
    return Contacts(pos=cpos, normal=jnp.broadcast_to(plane_normal, (2, 3)),
                    depth=depth)


def sphere_box(sp_pos, radius, box_pos, box_quat, half_size):
    """Sphere (A) vs box (B): 1 contact."""
    # sphere center in box frame
    p = quat_ops.rotate_inv(box_quat, sp_pos - box_pos)
    c = jnp.clip(p, -half_size, half_size)
    delta = p - c
    dist_out = jnp.linalg.norm(delta)
    inside = dist_out < 1e-9
    # outside: normal from surface point to center; inside: push out of nearest face
    face_dist = half_size - jnp.abs(p)
    k = jnp.argmin(face_dist)
    n_in = jnp.zeros(3, p.dtype).at[k].set(jnp.sign(p[k]) + (p[k] == 0))
    n_out = delta / jnp.maximum(dist_out, 1e-9)
    n_local = jnp.where(inside, n_in, n_out)
    depth = jnp.where(inside, radius + face_dist[k], radius - dist_out)
    surf = jnp.where(inside, p, c)
    n_world = quat_ops.rotate(box_quat, n_local)
    cpos = quat_ops.rotate(box_quat, surf) + box_pos - 0.0 * n_world
    return Contacts(pos=cpos[None], normal=n_world[None], depth=depth[None])


def capsule_box(cap_pos, cap_quat, radius, half_len, box_pos, box_quat,
                half_size, iters: int = 4, n_seed: int = 9):
    """Capsule (A) vs box (B): up to 2 contacts.

    Witness points on the capsule core segment are found by sampling the
    penetration depth along the segment and keeping the two deepest samples,
    refined by a damped closest-point fixed-point iteration; then sphere-box
    at each witness. Depth-based seeding (rather than pure closest-point
    iteration) matters when the segment passes deep inside the box: a
    closest-point iteration converges to the box surface crossing, whose
    nearest face is the crossed (e.g. top) face, flipping the contact normal
    vertical — a rod pressed 2 cm into a box then pins it to the table
    instead of pushing it. The deepest interior sample sits at the box's
    mid-plane where the nearest face is the lateral one being pushed."""
    dtype = cap_pos.dtype
    axis_w = quat_ops.rotate(cap_quat, jnp.array([0.0, 0.0, 1.0], dtype))
    # segment in box frame
    p0 = quat_ops.rotate_inv(box_quat, cap_pos - half_len * axis_w - box_pos)
    p1 = quat_ops.rotate_inv(box_quat, cap_pos + half_len * axis_w - box_pos)
    seg = p1 - p0
    seg_len2 = jnp.maximum(jnp.dot(seg, seg), 1e-12)

    def closest_t(c):
        return jnp.clip(jnp.dot(c - p0, seg) / seg_len2, 0.0, 1.0)

    # depth estimate at n_seed samples along the segment
    ts0 = jnp.linspace(0.0, 1.0, n_seed, dtype=dtype)
    pts0 = p0[None] + ts0[:, None] * seg[None]
    cs0 = jnp.clip(pts0, -half_size, half_size)
    dist_out = jnp.linalg.norm(pts0 - cs0, axis=-1)
    inside = dist_out < 1e-9
    face_dist = jnp.min(half_size[None] - jnp.abs(pts0), axis=-1)
    score = jnp.where(inside, radius + face_dist, radius - dist_out)
    i1 = jnp.argmax(score)
    i2 = jnp.argmax(score.at[i1].set(-jnp.inf))
    ts = jnp.stack([ts0[i1], ts0[i2]])

    def body(_, ts):
        pts = p0[None] + ts[:, None] * seg[None]
        cs = jnp.clip(pts, -half_size, half_size)
        # interior witnesses are already depth-optimal seeds: keep them
        stay = jnp.all(pts == cs, axis=-1)
        return jnp.where(stay, ts, jax.vmap(closest_t)(cs))

    ts = jax.lax.fori_loop(0, iters, body, ts)
    pts = p0[None] + ts[:, None] * seg[None]  # witness points on segment, box frame

    def one(pt):
        world = quat_ops.rotate(box_quat, pt) + box_pos
        return sphere_box(world, radius, box_pos, box_quat, half_size)

    c = jax.vmap(one)(pts)
    return Contacts(pos=c.pos[:, 0], normal=c.normal[:, 0], depth=c.depth[:, 0])


def capsule_capsule(pos_a, quat_a, r_a, hl_a, pos_b, quat_b, r_b, hl_b):
    """Closest-point contact between two capsule core segments."""
    dtype = pos_a.dtype
    ua = quat_ops.rotate(quat_a, jnp.array([0.0, 0.0, 1.0], dtype))
    ub = quat_ops.rotate(quat_b, jnp.array([0.0, 0.0, 1.0], dtype))
    a0, a1 = pos_a - hl_a * ua, pos_a + hl_a * ua
    b0, b1 = pos_b - hl_b * ub, pos_b + hl_b * ub
    # closest points between segments (standard clamped solve)
    d1, d2, r = a1 - a0, b1 - b0, a0 - b0
    a, e, f = jnp.dot(d1, d1), jnp.dot(d2, d2), jnp.dot(d2, r)
    b, c = jnp.dot(d1, d2), jnp.dot(d1, r)
    denom = jnp.maximum(a * e - b * b, 1e-12)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    pa, pb = a0 + s * d1, b0 + t * d2
    delta = pa - pb
    dist = jnp.linalg.norm(delta)
    n = delta / jnp.maximum(dist, 1e-9)
    depth = r_a + r_b - dist
    cpos = pb + n * (r_b - 0.5 * depth)
    return Contacts(pos=cpos[None], normal=n[None], depth=depth[None])


# ---------------------------------------------------------------------------
# box-box: SAT with reference-face clipping (up to 4 contacts)
# ---------------------------------------------------------------------------

def _face_axes(R):
    return R.T  # rows are world-frame face normals of a box with rotation R


def box_box(pos_a, quat_a, half_a, pos_b, quat_b, half_b):
    """Box A vs box B via face-normal SAT (6 axes) + incident face clipping.

    Edge-edge axes are omitted: for the task geometry (flat boxes on a table
    pushed laterally) face contacts dominate; edge cases resolve via the
    nearby face manifold. Returns 4 contacts; inactive slots depth<0.
    """
    dtype = pos_a.dtype
    Ra = quat_ops.to_mat(quat_a)
    Rb = quat_ops.to_mat(quat_b)
    d = pos_b - pos_a

    # 6 candidate separating axes: A's 3 faces, B's 3 faces (world frame)
    axes = jnp.concatenate([Ra.T, Rb.T], axis=0)  # [6,3] unit rows

    # projection radii: r_A = sum_j |axis . (Ra e_j)| * half_a_j; note
    # (axis @ Ra)_j = axis . (Ra e_j) since Ra maps local -> world.
    proj_a = jnp.abs(axes @ Ra) @ half_a
    proj_b = jnp.abs(axes @ Rb) @ half_b
    sep = jnp.abs(axes @ d) - (proj_a + proj_b)  # [6] separation (<0 overlapping)

    # pick the axis of minimum penetration (max sep)
    best = jnp.argmax(sep)
    pen = -sep[best]
    axis = axes[best]
    # orient axis from A to B
    axis = axis * jnp.sign(jnp.dot(axis, d) + 1e-12)

    a_is_ref = best < 3
    # reference box (owns the face), incident box (gets clipped)
    R_ref = jnp.where(a_is_ref, Ra, Rb)
    R_inc = jnp.where(a_is_ref, Rb, Ra)
    p_ref = jnp.where(a_is_ref, pos_a, pos_b)
    p_inc = jnp.where(a_is_ref, pos_b, pos_a)
    h_ref = jnp.where(a_is_ref, half_a, half_b)
    h_inc = jnp.where(a_is_ref, half_b, half_a)
    # face normal of reference box pointing toward incident box
    n_ref = axis * jnp.where(a_is_ref, 1.0, -1.0)

    # express in reference frame
    n_local = R_ref.T @ n_ref  # ~ +-e_k
    k = jnp.argmax(jnp.abs(n_local))
    sign_k = jnp.sign(n_local[k])

    # incident face: the face of incident box most anti-parallel to n_ref
    n_inc_local = R_inc.T @ (-n_ref)
    ki = jnp.argmax(jnp.abs(n_inc_local))
    sign_ki = jnp.sign(n_inc_local[ki])

    # build the 4 corners of the incident face (in incident local frame)
    onehot_ki = jax.nn.one_hot(ki, 3, dtype=dtype)
    # two unit vectors orthogonal to axis ki: rotate the one-hot
    u1 = jnp.roll(onehot_ki, 1)
    u2 = jnp.roll(onehot_ki, 2)
    face_center_local = sign_ki * onehot_ki * h_inc
    hu1 = jnp.dot(u1, h_inc)
    hu2 = jnp.dot(u2, h_inc)
    corners_local = (face_center_local[None]
                     + jnp.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], dtype)
                     @ jnp.stack([u1 * hu1, u2 * hu2]))  # [4,3]
    corners_w = p_inc[None] + corners_local @ R_inc.T  # world

    # clip corners against the reference face's side planes (in ref frame)
    corners_ref = (corners_w - p_ref[None]) @ R_ref  # [4,3] in ref local frame
    onehot_k = jax.nn.one_hot(k, 3, dtype=dtype)
    t1 = jnp.roll(onehot_k, 1)
    t2 = jnp.roll(onehot_k, 2)
    lim1 = jnp.dot(t1, h_ref)
    lim2 = jnp.dot(t2, h_ref)
    c1 = jnp.clip(corners_ref @ t1, -lim1, lim1)
    c2 = jnp.clip(corners_ref @ t2, -lim2, lim2)
    ck = corners_ref @ onehot_k
    clipped_ref = c1[:, None] * t1[None] + c2[:, None] * t2[None] + ck[:, None] * onehot_k[None]

    # penetration of each clipped point beyond the reference face
    face_coord = sign_k * ck
    depth = jnp.dot(h_ref, onehot_k) - face_coord  # >0 below the face plane
    clipped_w = p_ref[None] + clipped_ref @ R_ref.T

    # normal pushing A away from B
    n_world = jnp.where(a_is_ref, -n_ref, n_ref)
    # invalid if SAT found separation
    depth = jnp.where(pen > 0, depth, -jnp.ones_like(depth))
    # points whose unclipped lateral coords were far outside are still fine
    # (clipped to the face boundary); depth handles activity.
    return Contacts(
        pos=clipped_w,
        normal=jnp.broadcast_to(n_world, (4, 3)),
        depth=depth,
    )
