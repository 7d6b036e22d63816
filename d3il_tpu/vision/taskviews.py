"""Per-task camera views: state observation -> rendered images + low-dim.

The reference vision pipeline stores bp-cam / inhand-cam JPEG streams next to
each demo and feeds them through MultiImageObsEncoder
(environments/dataset/sorting_dataset.py:218-416 image loading;
agents/models/vision/multi_image_obs_encoder.py:11). Because this framework
renders on device (vision/renderer.py), images are instead a deterministic
function of the state observation: each task's `render_obs(obs)` rebuilds
the visible scene (boxes from xy + tan-yaw channels, static fixtures from
scene constants, the rod at the current tcp) and rasterizes both cameras
inside the same jitted computation. The vision agents call it inside their
loss (training renders from logged states — no image dataset on disk) and
inside policy_apply (evaluation renders from live env state each policy
step, the stacking_vision_sim.py:128-167 semantics).

Layouts follow the policy/dataset observation convention (des-prefix concat):
the low-dim channel returned is the robot state prefix, matching the
reference vision agents' obs = (bp_img, inhand_img, robot_state)
(sorting.py:312-320).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from d3il_tpu.ops import quat as quat_ops
from d3il_tpu.vision import renderer as R

VISION_TASKS = ("avoiding", "pushing", "aligning", "sorting_2", "sorting_4",
                "sorting_6")

RED = (0.85, 0.12, 0.12)
GREEN = (0.12, 0.75, 0.12)
BLUE = (0.15, 0.25, 0.85)
PAD_RED = (1.0, 0.45, 0.45)
PAD_GREEN = (0.45, 1.0, 0.45)
PAD_BLUE = (0.5, 0.6, 1.0)
GREY = (0.55, 0.55, 0.6)


def _yaw_quat(tan_yaw):
    yaw = jnp.arctan(tan_yaw)
    return quat_ops.from_euler(jnp.array([0.0, 0.0, 1.0]) * yaw)


def _cams(geoms, rod_xy_or_pos, res):
    """Render the shared bp + inhand camera pair."""
    bp = R.render(geoms, jnp.asarray(R.BP_CAM_POS, jnp.float32),
                  jnp.asarray(R.BP_CAM_QUAT, jnp.float32), R.BP_CAM_FOVY,
                  res=res)
    p = rod_xy_or_pos
    ih_pos = jnp.concatenate([p[:2], jnp.array([0.45], p.dtype)])
    ih_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)  # looking -z
    ih = R.render(geoms, ih_pos, ih_quat, R.INHAND_CAM_FOVY, res=res)
    return bp, ih


def _unit_quats(n):
    return jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (n, 1))


def make_pushing_view(res: int = 96):
    """obs [10] = [des(2), cur(2), red xy+tan, green xy+tan]."""
    from d3il_tpu.envs import scenes
    t1 = np.asarray(scenes.PUSHING_TARGET_1, np.float32)
    t2 = np.asarray(scenes.PUSHING_TARGET_2, np.float32)
    statics_pos = np.stack([[t1[0], t1[1], -0.018], [t2[0], t2[1], -0.018]])

    def render_obs(obs):
        cur = obs[2:4]
        b1, y1 = obs[4:6], obs[6]
        b2, y2 = obs[7:9], obs[9]
        z = jnp.float32(0.011)
        free_pos = jnp.stack([
            jnp.concatenate([b1, z[None]]), jnp.concatenate([b2, z[None]])])
        free_quat = jnp.stack([_yaw_quat(y1), _yaw_quat(y2)])
        geoms = R.scene_geoms(
            free_pos, free_quat,
            free_half=[[0.03, 0.03, 0.03]] * 2, free_colors=[RED, GREEN],
            static_pos=statics_pos, static_quat=_unit_quats(2),
            static_half=[[0.05, 0.05, 0.002]] * 2,
            static_colors=[PAD_RED, PAD_GREEN],
            rod_pos=jnp.concatenate([cur, jnp.array([0.15], obs.dtype)]),
            rod_quat=jnp.array([1.0, 0, 0, 0]))
        bp, ih = _cams(geoms, cur, res)
        return bp, ih, obs[:4]

    return render_obs


def make_sorting_view(num_boxes: int, res: int = 96):
    """obs [4+3n] = [des(2), cur(2), red boxes (xy,tan)..., blue boxes...]."""
    from d3il_tpu.envs import sorting
    half = num_boxes // 2
    platform = np.array([[0.5, -0.1, 0.0]], np.float32)
    rz = sorting.RED_ZONE
    bz = sorting.BLUE_ZONE
    zones = np.array([
        [(rz[0, 0] + rz[1, 0]) / 2, (rz[0, 1] + rz[1, 1]) / 2, -0.018],
        [(bz[0, 0] + bz[1, 0]) / 2, (bz[0, 1] + bz[1, 1]) / 2, -0.018]],
        np.float32)
    zone_half = np.array([
        [(rz[1, 0] - rz[0, 0]) / 2, (rz[1, 1] - rz[0, 1]) / 2, 0.002],
        [(bz[1, 0] - bz[0, 0]) / 2, (bz[1, 1] - bz[0, 1]) / 2, 0.002]],
        np.float32)
    statics_pos = np.concatenate([platform, zones])
    statics_half = np.concatenate([[[0.3, 0.3, 0.1]], zone_half])
    statics_color = np.array([GREY, PAD_RED, PAD_BLUE], np.float32)

    def render_obs(obs):
        cur = obs[2:4]
        xs = obs[4:].reshape(num_boxes, 3)
        z = jnp.full((num_boxes, 1), 0.13, obs.dtype)
        free_pos = jnp.concatenate([xs[:, :2], z], axis=1)
        free_quat = jnp.stack([_yaw_quat(xs[i, 2]) for i in range(num_boxes)])
        colors = [RED] * half + [BLUE] * half
        geoms = R.scene_geoms(
            free_pos, free_quat,
            free_half=[[0.03, 0.03, 0.03]] * num_boxes, free_colors=colors,
            static_pos=statics_pos, static_quat=_unit_quats(3),
            static_half=statics_half, static_colors=statics_color,
            rod_pos=jnp.concatenate([cur, jnp.array([0.25], obs.dtype)]),
            rod_quat=jnp.array([1.0, 0, 0, 0]))
        bp, ih = _cams(geoms, cur, res)
        return bp, ih, obs[:4]

    return render_obs


def make_aligning_view(res: int = 96):
    """obs [20] = [des(3), cur(3), box pos+quat(7), target pos+quat(7)].
    The tray renders as its 5-geom composite (aligning scene: bottom plate +
    4 walls); the target as a flat outline pad."""
    # local offsets/halves of the tray composite (envs/aligning.py geoms)
    tray_off = np.array([[0, 0, 0], [0.05, 0, 0.0485], [0, 0.05, 0.0485],
                         [-0.05, 0, 0.0485], [0, -0.05, 0.0485]], np.float32)
    tray_half = np.array([[0.05, 0.05, 0.01], [0.005, 0.05, 0.045],
                          [0.05, 0.005, 0.045], [0.005, 0.05, 0.045],
                          [0.05, 0.005, 0.045]], np.float32)

    def render_obs(obs):
        cur = obs[3:6]
        box_p, box_q = obs[6:9], quat_ops.normalize(obs[9:13])
        tgt_p, tgt_q = obs[13:16], quat_ops.normalize(obs[16:20])
        off_w = quat_ops.rotate(box_q[None], jnp.asarray(tray_off))
        free_pos = box_p[None] + off_w
        free_quat = jnp.tile(box_q[None], (5, 1))
        geoms = R.scene_geoms(
            free_pos, free_quat, free_half=tray_half,
            free_colors=[[0.9, 0.5, 0.1]] * 5,
            static_pos=jnp.concatenate([tgt_p[:2], jnp.array([-0.018])])[None],
            static_quat=tgt_q[None],
            static_half=[[0.055, 0.055, 0.002]],
            static_colors=[PAD_GREEN],
            rod_pos=cur + jnp.array([0.0, 0.0, 0.15]),
            rod_quat=jnp.array([1.0, 0, 0, 0]))
        bp, ih = _cams(geoms, cur, res)
        return bp, ih, obs[:6]

    return render_obs


def make_avoiding_view(res: int = 96):
    """obs [4] = [des(2), cur(2)]; six static obstacles + goal line."""
    from d3il_tpu.envs import scenes
    mid, off, y1, dy = 0.5, 0.075, -0.1, 0.18
    obst = np.array([
        [mid, y1, 0.05], [mid - off, y1 + dy, 0.05], [mid + off, y1 + dy, 0.05],
        [mid - 2 * off, y1 + 2 * dy, 0.05], [mid, y1 + 2 * dy, 0.05],
        [mid + 2 * off, y1 + 2 * dy, 0.05]], np.float32)
    goal = np.array([[0.5, scenes.AVOIDING_GOAL_Y, -0.018]], np.float32)
    statics_pos = np.concatenate([obst, goal])
    statics_half = np.concatenate([
        np.tile([[0.027, 0.027, 0.09]], (6, 1)), [[0.25, 0.004, 0.002]]])
    statics_color = np.concatenate([
        np.tile([GREY], (6, 1)), [[0.2, 0.9, 0.2]]]).astype(np.float32)

    def render_obs(obs):
        cur = obs[2:4]
        free_pos = jnp.zeros((1, 3), obs.dtype) + jnp.array([0.0, 0.0, -9.0])
        geoms = R.scene_geoms(
            free_pos, _unit_quats(1), free_half=[[0.001] * 3],
            free_colors=[GREY],
            static_pos=statics_pos, static_quat=_unit_quats(7),
            static_half=statics_half, static_colors=statics_color,
            rod_pos=jnp.concatenate([cur, jnp.array([0.15], obs.dtype)]),
            rod_quat=jnp.array([1.0, 0, 0, 0]))
        bp, ih = _cams(geoms, cur, res)
        return bp, ih, obs[:4]

    return render_obs


def make_render_obs(task: str, res: int = 96):
    """Factory: task name -> render_obs(obs) -> (bp, inhand, low_dim)."""
    if task == "pushing":
        return make_pushing_view(res)
    if task == "aligning":
        return make_aligning_view(res)
    if task == "avoiding":
        return make_avoiding_view(res)
    if task.startswith("sorting"):
        return make_sorting_view(int(task.split("_")[1]), res)
    raise ValueError(f"no vision view for task {task!r} "
                     f"(supported: {VISION_TASKS})")


def low_dim_size(task: str) -> int:
    return {"aligning": 6}.get(task, 4)
