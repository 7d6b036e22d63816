"""On-device batched camera renderer (ray-primitive rasterizer).

Replaces the reference's EGL/GLFW offscreen MuJoCo rendering
(d3il_sim/sims/mj_beta/mj_utils/mj_renderer.py + mj_render_singleton.py) —
nothing of the sort exists on TPU, so images are produced by a jitted
ray-caster: one ray per pixel, slab-test intersections against the scene's
primitive geoms (boxes, capsules as segment-distance, plane), z-buffered,
Lambert-shaded. 96x96x3 float32 in [0,1], matching the reference vision
pipeline's input format (dataset images at 96x96 / 255, CHW->HWC here).

Fully vectorized: [H*W rays] x [n_geoms] tested in one shot; vmap over env
batches renders thousands of cameras per step on the MXU/VPU.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.ops import quat as quat_ops

# reference cage cam (e.g. pushing.py:30-45): pos [1.05, 0, 1.2], 30deg tilt
BP_CAM_POS = np.array([1.05, 0.0, 1.2])
BP_CAM_QUAT = np.array([0.6830127, 0.1830127, 0.1830127, 0.683012])
BP_CAM_FOVY = 45.0
# inhand cam (panda_rod_invisible.xml 'rgbd': pos [0.1,0,0] euler [0,3.14,1.57], fovy 60)
INHAND_CAM_POS = np.array([0.1, 0.0, 0.0])
INHAND_CAM_EULER = np.array([0.0, 3.14, 1.57])
INHAND_CAM_FOVY = 60.0


class RenderGeom(NamedTuple):
    """Batched primitive set: boxes only (capsules approximated by boxes for
    rendering purposes; visual fidelity is secondary to information content)."""
    pos: jax.Array      # [G, 3]
    quat: jax.Array     # [G, 4]
    half: jax.Array     # [G, 3]
    color: jax.Array    # [G, 3]


def camera_rays(cam_pos, cam_quat, fovy_deg: float, res: int):
    """Ray origins/directions for a pinhole camera (MuJoCo convention:
    camera looks along -z of its frame, y up)."""
    fovy = jnp.deg2rad(fovy_deg)
    half = jnp.tan(fovy / 2)
    lin = jnp.linspace(-half, half, res)
    u, v = jnp.meshgrid(lin, -lin)              # x right, y down -> flip
    dirs_cam = jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)
    dirs = quat_ops.rotate(cam_quat[None, None], dirs_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(cam_pos, dirs.shape)
    return origins.reshape(-1, 3), dirs.reshape(-1, 3)


def _ray_box(o, d, pos, quat, half):
    """Slab test in box frame. o,d: [R,3]; box scalars. Returns (t, normal)."""
    ol = quat_ops.rotate_inv(quat[None], o - pos[None])
    dl = quat_ops.rotate_inv(quat[None], d)
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-9, jnp.sign(dl) * 1e-9 + 1e-12, dl)
    t1 = (-half[None] - ol) * inv
    t2 = (half[None] - ol) * inv
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near < t_far) & (t_far > 0)
    t = jnp.where(hit, jnp.maximum(t_near, 0.0), jnp.inf)
    # normal: axis of the entering slab
    axis = jnp.argmax(tmin, axis=-1)
    sign = -jnp.sign(jnp.take_along_axis(dl, axis[:, None], axis=-1))[:, 0]
    n_local = jax.nn.one_hot(axis, 3) * sign[:, None]
    n_world = quat_ops.rotate(quat[None], n_local)
    return t, n_world


def render_rgbds(geoms: RenderGeom, cam_pos, cam_quat, fovy: float,
                 res: int = 96, light_dir=(-0.3, 0.3, -0.9),
                 bg=(0.26, 0.58, 0.51), floor_z: float = -0.019,
                 floor_color=(0.8, 0.655, 0.45)):
    """Render one camera view with all channels (Camera.py:120-178 parity):
    returns (rgb [res,res,3] in [0,1], depth [res,res] ray distance in
    meters (inf where no hit), seg [res,res] int32 geom index, G = floor,
    -1 = background)."""
    o, d = camera_rays(cam_pos, cam_quat, fovy, res)
    R = o.shape[0]

    ts, ns = jax.vmap(lambda p, q, h: _ray_box(o, d, p, q, h),
                      out_axes=1)(geoms.pos, geoms.quat, geoms.half)
    # floor plane z = floor_z
    denom = d[:, 2]
    t_floor = (floor_z - o[:, 2]) / jnp.where(jnp.abs(denom) < 1e-9, -1e-9, denom)
    t_floor = jnp.where(t_floor > 0, t_floor, jnp.inf)

    t_all = jnp.concatenate([ts, t_floor[:, None]], axis=1)   # [R, G+1]
    best = jnp.argmin(t_all, axis=1)
    t_best = jnp.take_along_axis(t_all, best[:, None], axis=1)[:, 0]

    n_floor = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    n_all = jnp.concatenate([ns, n_floor[:, None]], axis=1)   # [R, G+1, 3]
    n_best = jnp.take_along_axis(n_all, best[:, None, None].repeat(3, -1),
                                 axis=1)[:, 0]
    colors = jnp.concatenate(
        [geoms.color, jnp.asarray(floor_color)[None]], axis=0)  # [G+1, 3]
    c_best = colors[best]

    ld = jnp.asarray(light_dir)
    ld = ld / jnp.linalg.norm(ld)
    lam = jnp.clip(-jnp.sum(n_best * ld[None], axis=-1), 0.0, 1.0)
    shade = 0.55 + 0.45 * lam
    img = c_best * shade[:, None]
    hit = jnp.isfinite(t_best)
    img = jnp.where(hit[:, None], img, jnp.asarray(bg)[None])
    seg = jnp.where(hit, best, -1).astype(jnp.int32)
    return (img.reshape(res, res, 3), t_best.reshape(res, res),
            seg.reshape(res, res))


def render(geoms: RenderGeom, cam_pos, cam_quat, fovy: float, res: int = 96,
           **kw):
    """RGB-only view -> [res, res, 3] float32 in [0,1] (XLA dead-code
    eliminates the unused depth/seg channels under jit)."""
    rgb, _, _ = render_rgbds(geoms, cam_pos, cam_quat, fovy, res, **kw)
    return rgb


def point_cloud(depth, cam_pos, cam_quat, fovy: float):
    """Depth image -> world-frame point cloud [res*res, 3]
    (Camera.calc_point_cloud, core/Camera.py:160-178: unproject via the
    pinhole intrinsics, here directly along the stored camera rays)."""
    res = depth.shape[0]
    o, d = camera_rays(cam_pos, cam_quat, fovy, res)
    t = depth.reshape(-1, 1)
    return o + jnp.where(jnp.isfinite(t), t, 0.0) * d


def scene_geoms(free_pos, free_quat, free_half, free_colors,
                static_pos, static_quat, static_half, static_colors,
                rod_pos=None, rod_quat=None):
    """Assemble RenderGeom arrays from env state + static scene constants.
    The rod is rendered as a thin box."""
    pos = [free_pos, jnp.asarray(static_pos, free_pos.dtype)]
    quat = [free_quat, jnp.asarray(static_quat, free_pos.dtype)]
    half = [jnp.asarray(free_half, free_pos.dtype),
            jnp.asarray(static_half, free_pos.dtype)]
    color = [jnp.asarray(free_colors, free_pos.dtype),
             jnp.asarray(static_colors, free_pos.dtype)]
    if rod_pos is not None:
        pos.append(rod_pos[None])
        quat.append(rod_quat[None])
        half.append(jnp.asarray([[0.01, 0.01, 0.14]], free_pos.dtype))
        color.append(jnp.asarray([[0.8, 0.8, 0.85]], free_pos.dtype))
    return RenderGeom(pos=jnp.concatenate(pos), quat=jnp.concatenate(quat),
                      half=jnp.concatenate(half), color=jnp.concatenate(color))
