"""Device-side scripted experts: whole demo episodes as one `lax.scan`.

The host experts in `experts.py` are per-step Python state machines — fine
for one env, but demo generation then pays a host<->device round trip per
control step. These are the same state machines expressed as pure JAX
functions over explicit integer-phase state, so a full episode is a single
scan and a demo *batch* is one vmapped device call (thousands of env-steps
per dispatch instead of one).

The reference's demonstrations are human-teleoperated
(gamepad_control/record_data.py); these experts replace them with scripted
multimodal behavior matching the reference tasks' solution modes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from d3il_tpu.envs import scenes
from d3il_tpu.ops import quat as quat_ops


def _step_toward(cur, tgt, step):
    return cur + jnp.clip(tgt - cur, -step, step)


def _limit_lead(nxt, tcp, max_lead):
    """Cap how far the setpoint leads the physical tcp."""
    ahead = nxt - tcp
    d = jnp.linalg.norm(ahead)
    return jnp.where(d > max_lead, tcp + ahead / jnp.maximum(d, 1e-9) * max_lead,
                     nxt)


def _yaw_of(quat):
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------- avoiding

class AvoidingExpertState(NamedTuple):
    k: jax.Array  # waypoint index


def avoiding_waypoints(mode, rng: np.random.Generator) -> np.ndarray:
    """Host helper: the 6 corridor waypoints for a (g1,g2,g3) gate mode
    (same geometry as experts.AvoidingExpert)."""
    L1_X = {0: 0.42, 1: 0.58}
    L2_X = {0: 0.35, 1: 0.5, 2: 0.65}
    L3_X = {0: 0.27, 1: 0.425, 2: 0.575, 3: 0.73}
    g1, g2, g3 = mode
    j = lambda: rng.uniform(-0.012, 0.012)
    x1, x2, x3 = L1_X[g1] + j(), L2_X[g2] + j(), L3_X[g3] + j()
    return np.array([
        [x1, scenes.AVOIDING_L1_Y - 0.07],
        [x1, scenes.AVOIDING_L1_Y + 0.08],
        [x2, scenes.AVOIDING_L2_Y - 0.07],
        [x2, scenes.AVOIDING_L2_Y + 0.08],
        [x3, scenes.AVOIDING_L3_Y - 0.07],
        [x3, scenes.AVOIDING_GOAL_Y + 0.03],
    ], np.float32)


def avoiding_expert_step(st: AvoidingExpertState, des_xy, tcp_xy, waypoints):
    """Port of experts.AvoidingExpert.act (lag-band regulation)."""
    wp = waypoints[st.k]
    adv = (jnp.linalg.norm(wp - tcp_xy) < 0.03) & (st.k < waypoints.shape[0] - 1)
    k = st.k + adv.astype(st.k.dtype)
    wp = waypoints[k]
    lag = jnp.linalg.norm(des_xy - tcp_xy)
    step = jnp.where(lag < 0.035, 0.010, jnp.where(lag < 0.08, 0.005, 0.001))
    delta = _step_toward(des_xy, wp, step) - des_xy
    return AvoidingExpertState(k=k), delta


# ---------------------------------------------------------------- pushing

class PushExpertState(NamedTuple):
    stage: jax.Array   # which (box, target) pair
    phase: jax.Array   # 0 approach, 1 push
    # dynamic-mode progress watchdog: consecutive push steps without the box
    # nearing the target (breaks corner-contact deadlocks via re-approach)
    stall: jax.Array
    prev_d: jax.Array
    # dynamic-mode strike: 1 while executing a strike toward the SPATIALLY
    # FIXED point strike_end (computed at strike entry; a box-tracking cap
    # degenerates to the ~35 mm/s carried push the strike exists to escape)
    striking: jax.Array
    strike_end: jax.Array


def init_push_expert_state():
    return PushExpertState(stage=jnp.array(0, jnp.int32),
                           phase=jnp.array(0, jnp.int32),
                           stall=jnp.array(0, jnp.int32),
                           prev_d=jnp.array(1e3, jnp.float32),
                           striking=jnp.array(0, jnp.int32),
                           strike_end=jnp.zeros(2, jnp.float32))


PUSH_APPROACH = 0.065
PUSH_STOP = 0.032
# Commanded indentation while pushing: the rod surface sits 7 mm inside the
# box face (box half 0.03 + rod radius 0.01 = 0.04 contact distance). Deeper
# setpoints (the old 0.02 = 2 cm indent) bury the capsule core in the box,
# where the contact manifold degenerates to the top face and the push stalls.
PUSH_DEPTH = 0.033
# Under FULL DYNAMICS the commanded indent sets the push FORCE, not the
# geometry: the impedance spring exerts pgain_pos * (des - tcp) ~ 200 N/m,
# and the tcp stalls at the contact surface (box half 0.03 + rod 0.01), so
# indent 0.02 -> ~4 N of steady push vs box-table friction ~0.5 N. The
# kinematic value (7 mm) only yields ~1.4 N and pushes at a crawl.
PUSH_DEPTH_DYN = 0.020


def _route_around(des_xy, tcp_xy, approach_pt, obstacles, active,
                  block_r: float = 0.075, detour_r: float = 0.11,
                  app_step: float = 0.01, app_lead: float = 0.03,
                  bounds=None):
    """First active obstacle blocking the straight line -> detour point
    (experts.PushingExpert approach branch, vectorized over obstacles).

    app_step/app_lead pace the approach carrot. The impedance-tracked plant
    follows a moving setpoint with lag ~= v * 0.42 s (tools/
    diag_dynamic_push.py: free-space lag 77 mm at 183 mm/s, identical on the
    C-MuJoCo golden), so a lead cap L limits travel speed to ~L / 0.42 —
    dynamic mode must run much larger leads than kinematic mode (where
    tcp == des and the cap never binds)."""
    v = approach_pt - tcp_xy
    L = jnp.linalg.norm(v) + 1e-9
    w = v / L

    def check(carry, ob_act):
        found, target = carry
        ob, act = ob_act
        tproj_raw = jnp.dot(ob - tcp_xy, v) / (L * L)
        tproj = jnp.clip(tproj_raw, 0, 1)
        closest = tcp_xy + tproj * v
        # an obstacle only blocks when it lies AHEAD along the travel
        # direction — a just-passed box otherwise triggers a permanent
        # detour flip-flop that freezes the rod in place
        blocking = act & (tproj_raw > 0) \
            & (jnp.linalg.norm(closest - ob) < block_r) \
            & (jnp.linalg.norm(ob - tcp_xy) < L)
        perp = jnp.array([-w[1], w[0]])
        side = jnp.where(jnp.dot(tcp_xy - ob, perp) >= 0, 1.0, -1.0)
        detour = ob + perp * side * detour_r
        if bounds is not None:
            # a detour point outside the work area (platform edge) walks the
            # rod into a corner it can't route out of — flip sides instead
            lo, hi = bounds
            outside = ((detour < lo) | (detour > hi)).any()
            detour = jnp.where(outside, ob - perp * side * detour_r, detour)
        use = blocking & ~found
        return (found | blocking, jnp.where(use, detour, target)), None

    (found, target_pt), _ = jax.lax.scan(
        check, (jnp.array(False), approach_pt), (obstacles, active))
    nxt = _step_toward(des_xy, target_pt, app_step)
    # approach braking: at ~190 mm/s the tracking lag is ~80 mm, so an
    # uncontracted lead overshoots the approach point by a wide loop that
    # costs 1-2 s per cycle; shrink the lead as the rod closes in
    lead_eff = jnp.minimum(app_lead,
                           0.5 * jnp.linalg.norm(target_pt - tcp_xy) + 0.025)
    return _limit_lead(nxt, tcp_xy, lead_eff)


def pushing_expert_step(st: PushExpertState, des_xy, tcp_xy, boxes_xy,
                        seq_box, seq_tgt, push_depth=PUSH_DEPTH,
                        push_step=0.006, lead=0.04,
                        app_step=0.01, app_lead=0.03,
                        strike_depth=None, strike_lead=0.12,
                        strike_radius=0.16, near_r=0.015,
                        block_r=0.075, detour_r=0.11):
    """seq_box [2] int, seq_tgt [2,2]: per-mode (box, target) order.

    push_step/lead: how fast the setpoint carrot advances and how far it may
    run ahead of the physical tcp. Dynamic mode needs a faster carrot (the
    impedance-tracked plant pushes at ~0.8 mm/step with the kinematic
    values, overrunning the 400-step horizon)."""
    stage = jnp.minimum(st.stage, 1)
    b = seq_box[stage]
    tgt = seq_tgt[stage]
    bpos = boxes_xy[b]
    to_tgt = tgt - bpos
    d_tgt = jnp.linalg.norm(to_tgt)
    u = to_tgt / (d_tgt + 1e-9)

    stage_done = d_tgt < PUSH_STOP
    dyn = strike_depth is not None
    # Dynamic mode approaches DEEPER behind the box: the 5.5 cm on-line
    # run-up from the staging point doubles as an alignment creep before
    # first contact (tools/diag_push_ep.py: engaging with perp up to 4 cm —
    # larger than the 3 cm box half-size — corner-hits the box, which yaws
    # away while the rod slides past it, costing ~100 steps per slip cycle).
    app_back = (PUSH_APPROACH + 0.03) if dyn else PUSH_APPROACH
    approach_pt = bpos - u * app_back
    rel0 = tcp_xy - bpos
    along0 = jnp.dot(rel0, u)
    perp0 = jnp.linalg.norm(rel0 - along0 * u)
    if dyn:
        # engage only when genuinely behind the box AND on the push line
        # (-0.038: a rod already at the contact face may re-engage in place —
        # the endgame otherwise forces a full back-out + re-approach)
        behind = (along0 > -app_back - 0.045) & (along0 < -0.038)
        # tension gate |des-tcp|: engaging while the approach spring is
        # still stretched turns the catch into a ballistic strike that
        # launches the box tens of cm off line (diag ep0: 50 cm in one
        # 50-step chunk)
        near = behind & (perp0 < 0.016) \
            & (jnp.linalg.norm(des_xy - tcp_xy) < 0.045)
    else:
        behind = None
        near = (jnp.linalg.norm(approach_pt - tcp_xy) < near_r) \
            & (along0 < -0.05)   # rod genuinely behind the box
    entering = near & (st.phase == 0)
    phase = jnp.where(stage_done, 0, jnp.where(near, 1, st.phase))
    rel = tcp_xy - bpos
    along = jnp.dot(rel, u)
    perp = jnp.linalg.norm(rel - along * u)

    striking = st.striking
    strike_end = st.strike_end
    # rod out of pushing position (wrong side of the box / off the push
    # line, e.g. after the box slipped sideways): re-approach. The dynamic
    # carried push self-centers (line-anchored carrot), so it gets more
    # lateral room before a reset than the kinematic box-anchored carrot.
    if dyn:
        bad = (phase == 1) & ((along > 0.005) | (perp > 0.08))
    else:
        bad = (phase == 1) & ((along > -0.005) | (perp > 0.05))
    phase = jnp.where(bad & ~near, 0, phase)

    # route around EVERY box, including the target box itself — the straight
    # line to the approach point passes through it, and an unrouted approach
    # plows it away from the target (the |ob-tcp| < L term releases the
    # detour once the rod is closer to the approach point than to the box)
    others = jnp.ones(boxes_xy.shape[0], bool)
    # dyn: keep detour points reachable — a detour at the x~0.8 workspace
    # edge parks the carrot where the arm cannot follow and the blocking
    # predicate never releases (tools/diag_push_ep.py ep2: 200-step orbit)
    push_bounds = (jnp.array([0.33, -0.42]), jnp.array([0.76, 0.42])) \
        if dyn else None
    nxt_app = _route_around(des_xy, tcp_xy, approach_pt, boxes_xy, others,
                            block_r=block_r, detour_r=detour_r,
                            app_step=app_step, app_lead=app_lead,
                            bounds=push_bounds)
    if dyn:
        # already behind the box but off the push line: pull LATERALLY onto
        # the line at the current depth instead of chasing the staging
        # point — a static staging-point carrot makes the braked rod spiral
        # around the point without ever satisfying the alignment gate
        depth_c = jnp.clip(along0, -app_back - 0.02, -0.055)
        align_pt = bpos + u * depth_c
        nxt_align = _limit_lead(_step_toward(des_xy, align_pt, app_step),
                                tcp_xy, 0.045)
        nxt_app = jnp.where(behind & ~near, nxt_align, nxt_app)
    # Strike-chase vs precision push (dynamic mode): the impedance arm's
    # sustained slow push tops out at ~35-55 mm/s even on the C-MuJoCo golden
    # (tools/diag_dynamic_push.py depth sweep), which overruns the 400-step
    # horizon. Far from the target the carrot therefore drives THROUGH the
    # box (negative depth = run-through) with a large lead: a fast carried
    # push at 300+ mm/s whose free-skid overshoot is negligible (50 g box at
    # 0.5 m/s slides v^2/2{mu}g ~ 13 mm). Near the target it falls back to
    # the shallow-carrot precision push that parks the box inside the 0.05
    # success radius. strike_depth=None disables (kinematic mode).
    if strike_depth is None:
        # kinematic mode: classic box-anchored carrot at fixed indent
        push_pt = bpos - u * push_depth
        nxt_push = _limit_lead(_step_toward(des_xy, push_pt, push_step),
                               tcp_xy, lead)
    else:
        # Dynamic push: continuous line-anchored carried push. A box-anchored
        # carrot keeps only ~depth of spring tension and sustains ~35 mm/s
        # (tools/diag_dynamic_push.py depth sweep, identical on the C-MuJoCo
        # golden) — too slow for the 400-step horizon — while discrete
        # strikes deflect the box off-line at every impact (staircase box
        # paths). Here the carrot lives ON the line through the box center
        # toward the target, a fixed advance `strike_lead` AHEAD OF THE ROD
        # (constant spring tension through the catch-push cycle, automatic
        # lateral re-centering), and is capped at the SPATIAL park point
        # `strike_radius` short of the target so the box is never driven
        # past the success radius: box face contact at cap + 0.04 leaves the
        # box center ~(strike_radius - 0.04) short of the target center.
        # Slow catch, fast carry: at full strike_lead the contact-free
        # run-up tracks with a ~5 cm LATERAL sag (tools/diag_push_ep.py:
        # lag vector not collinear with the path at ~200 mm/s), so the rod
        # slides past the 3 cm-half box without ever catching it. Keep the
        # lead small (slow, accurate, on-line) until the rod reaches the box
        # face; once in contact the box itself is the lateral reference and
        # the full lead only sets push force.
        lead_eff = jnp.where(along < -0.052, 0.032, strike_lead)
        s_carrot = jnp.minimum(along + lead_eff, d_tgt - strike_radius)
        # Mirror the carrot across the push line: an on-line carrot pulls
        # the rod laterally with authority ~ perp while pulling forward
        # with ~ lead_eff, so at perp ~ 2-3 cm the rod slides around the
        # box corner faster than it recenters. Reflecting the carrot to
        # the line's other side doubles the lateral pull.
        perp_vec = rel - along * u
        nxt_push = bpos + u * s_carrot - perp_vec

    # progress watchdog (dynamic mode): pushing without the box nearing the
    # target for ~1.2 s means a corner-contact deadlock — force a fresh
    # approach from the current line
    progressing = d_tgt < st.prev_d - 5e-4
    # dyn endgame exemption: the strike_radius carrot cap throttles the box
    # below the 0.5 mm/step progress threshold as d_tgt -> PUSH_STOP, which
    # used to fire the watchdog and thrash approach/push until the horizon
    # ran out a few mm short of done
    count = (phase == 1) & ~progressing
    if dyn:
        count = count & (d_tgt > 0.09)
    stall = jnp.where(count, st.stall + 1, 0)
    # dyn: the on-line run-up from the staging point is ~15 contact-free
    # steps, so give the push a longer grace before declaring a deadlock
    stalled = stall > (50 if dyn else 35)
    phase = jnp.where(stalled, 0, phase)
    stall = jnp.where(stalled, 0, stall)

    nxt = jnp.where(phase == 1, nxt_push, nxt_app)
    new_stage = st.stage + stage_done.astype(st.stage.dtype)
    delta = jnp.where(stage_done | (st.stage >= 2), jnp.zeros(2),
                      nxt - des_xy)
    return PushExpertState(stage=jnp.minimum(new_stage, 2),
                           phase=jnp.where(stage_done, 0, phase),
                           stall=stall,
                           prev_d=jnp.where(stage_done, 1e3, d_tgt),
                           striking=jnp.where(stage_done, 0, striking),
                           strike_end=strike_end), delta


# ---------------------------------------------------------------- sorting

class SortingExpertState(NamedTuple):
    stage: jax.Array   # which box in `order`
    phase: jax.Array   # 0 approach_x, 1 push_x, 2 approach_y, 3 push_y
    prev_b: jax.Array  # box worked last step (phase resets when it changes)


SORT_DONE_Y = 0.215
SORT_RED_X = 0.4
SORT_BLUE_X = 0.625


def sorting_expert_step(st: SortingExpertState, des_xy, tcp_xy, boxes_pos,
                        order, half, push_depth=PUSH_DEPTH,
                        pstep_slow=0.006, pstep_fast=0.010,
                        lead_slow=0.04, lead_fast=0.05,
                        app_step=0.01, app_lead=0.03, near_r=0.015,
                        dyn=False, dyn_adv=0.09, x_ok_r=0.015,
                        block_r=0.075, detour_r=0.11):
    """Two-leg push per box: align x to the zone center, then eject toward
    (x_zone, 0.30) over the +y platform edge with continuous aim correction
    (an uncorrected straight +y push drifts laterally several cm).
    `order` [n] int permutation; boxes 0..half-1 red; boxes_pos [n,3]."""
    n = order.shape[0]
    boxes_xy = boxes_pos[:, :2]
    stage = jnp.minimum(st.stage, n - 1)
    b = order[stage]
    bp3 = boxes_pos[b]

    # box finished: pushed well past the edge, or already dropped off it
    # (z below the platform top; a box hanging ON the edge sits too low for
    # the rod to reach, so a drop also ends the stage)
    dropped = (bp3[2] < 0.06) & (bp3[1] > 0.15)
    ejected = bp3[1] > SORT_DONE_Y
    if dyn:
        # dynamic pushes can creep a box over the edge line while its x is
        # still out of band — keep working it until the x fits the zone
        ejected = ejected & (jnp.abs(jnp.where(
            b < half, SORT_RED_X, SORT_BLUE_X) - bp3[0]) < 0.09)
    box_done = ejected | dropped
    stage2 = jnp.minimum(st.stage + box_done.astype(st.stage.dtype), n)
    finished = stage2 >= n
    stage_c = jnp.minimum(stage2, n - 1)
    b = order[stage_c]
    bpos = boxes_xy[b]

    # if another live box sits in the push corridor ahead, eject it first —
    # pushing through it would plough it off at the wrong x
    active = (boxes_pos[:, 2] > 0.06) & (boxes_xy[:, 1] < SORT_DONE_Y)
    x_tgt_b = jnp.where(b < half, SORT_RED_X, SORT_BLUE_X)
    aim_b = jnp.array([1.0, 0.0]) * x_tgt_b + jnp.array([0.0, 1.0]) * 0.30
    u_b = (aim_b - bpos) / (jnp.linalg.norm(aim_b - bpos) + 1e-9)
    rel = boxes_xy - bpos
    proj = rel @ u_b
    perp = jnp.linalg.norm(rel - proj[:, None] * u_b[None], axis=-1)
    blocking = active.at[b].set(False) & (proj > 0.01) & (proj < 0.45) \
        & (perp < 0.085)
    b = jnp.where(blocking.any(), jnp.argmax(blocking).astype(b.dtype), b)
    bpos = boxes_xy[b]
    phase = jnp.where(box_done | (b != st.prev_b), 0, st.phase)

    x_tgt = jnp.where(b < half, SORT_RED_X, SORT_BLUE_X)
    dx = x_tgt - bpos[0]
    x_ok = jnp.abs(dx) < x_ok_r
    ux = jnp.array([1.0, 0.0]) * jnp.sign(dx)
    aim = jnp.array([1.0, 0.0]) * x_tgt + jnp.array([0.0, 1.0]) * 0.30
    to_aim = aim - bpos
    uy = to_aim / (jnp.linalg.norm(to_aim) + 1e-9)
    phase = jnp.where((phase == 0) & x_ok, 2, phase)
    phase = jnp.where((phase == 1) & x_ok, 2, phase)
    u = jnp.where(phase >= 2, uy, ux)

    approach_pt = bpos - u * PUSH_APPROACH
    near = jnp.linalg.norm(approach_pt - tcp_xy) < near_r
    in_approach = (phase == 0) | (phase == 2)
    phase = jnp.where(in_approach & near, phase + 1, phase)

    sort_bounds = (jnp.array([0.28, -0.28]), jnp.array([0.72, 0.28])) \
        if dyn else None
    nxt_app = _route_around(des_xy, tcp_xy, approach_pt, boxes_xy,
                            boxes_pos[:, 2] > 0.06,
                            block_r=block_r, detour_r=detour_r,
                            app_step=app_step, app_lead=app_lead,
                            bounds=sort_bounds)
    # speed through the edge so momentum carries the box clear of the lip
    near_edge = (phase == 3) & (bpos[1] > 0.12)
    pstep = jnp.where(near_edge, pstep_fast, pstep_slow)
    lead = jnp.where(near_edge, lead_fast, lead_slow)
    push_pt = bpos - u * push_depth
    nxt_push_kin = _limit_lead(_step_toward(des_xy, push_pt, pstep),
                               tcp_xy, lead)
    in_push = (phase == 1) | (phase == 3)
    if dyn:
        # dynamic mode: line-anchored carried push (see pushing_expert_step)
        # — carrot on the box->aim line, dyn_adv ahead of the rod. The y-leg
        # ejects over the platform edge, so its cap is deep (the zone is
        # 0.19 m long, overshoot is harmless); the x-leg parks the box over
        # the zone's x-band
        rel_b = tcp_xy - bpos
        along_b = jnp.dot(rel_b, u)
        dist_aim = jnp.where(phase >= 2,
                             jnp.linalg.norm(aim - bpos),
                             jnp.abs(dx))
        margin = jnp.where(phase >= 2, 0.02, 0.058)
        # slow catch far behind the box, full advance once at the face
        # (pushing_expert_step: full-lead run-ups track with a ~5 cm
        # lateral sag and corner-hit the box)
        adv_eff = jnp.where(along_b < -0.052, 0.032, dyn_adv)
        s_carrot = jnp.minimum(along_b + adv_eff, dist_aim - margin)
        # mirror the carrot across the push line to double lateral
        # re-centering authority (see pushing_expert_step)
        perp_vec_b = rel_b - along_b * u
        nxt_push = bpos + u * s_carrot - perp_vec_b
        # rod slipped past the box (box escaped sideways): the rod-anchored
        # carrot would run away to the aim point — drop back to approach
        slipped = in_push & (along_b > -0.005)
        phase = jnp.where(slipped, phase - 1, phase)
        in_push = in_push & ~slipped
    else:
        nxt_push = nxt_push_kin
    nxt = jnp.where(in_push, nxt_push, nxt_app)
    if dyn:
        # keep the carrot over the platform: a detour or runaway target off
        # the platform walks the rod where no box can follow
        nxt = jnp.clip(nxt, jnp.array([0.26, -0.30]),
                       jnp.array([0.74, 0.30]))
    delta = jnp.where(finished | box_done, jnp.zeros(2), nxt - des_xy)
    return SortingExpertState(stage=stage2, phase=phase, prev_b=b), delta


# ---------------------------------------------------------------- inserting

class InsertingExpertState(NamedTuple):
    stage: jax.Array   # index into `order` (0..2; 3 = finished)
    wp: jax.Array      # waypoint index along the current box's route
    phase: jax.Array   # 0 approach, 1 push, 2 retreat


# Per-target push routes (box i -> target i, gate_insertion.py targets at
# gate_insertion_objects.py:17-24). All boxes spawn below y<=0.05
# (CONTEXT_SPACES); the first leg threads the gap between the maze_3/maze_4
# diagonals on the centerline, the second stages before the chamber gate, the
# third is the slow gate insertion (left/right chambers admit the box through
# the lateral gap between maze_5/13 resp. maze_6/14 at y~0.276; the middle
# chamber opens from below between the maze_15/16 funnel walls).
INSERT_ROUTES = np.array([
    [[0.525, 0.11], [0.465, 0.276], [0.3575, 0.276]],   # left chamber
    [[0.525, 0.11], [0.525, 0.30], [0.525, 0.4535]],    # middle chamber
    [[0.525, 0.11], [0.585, 0.276], [0.6925, 0.276]],   # right chamber
], np.float32)

# Rod pull-back point after each insertion (the rod must back out of the
# gate before crossing to the next box, or it drags along the maze walls).
INSERT_RETREATS = np.array([
    [0.47, 0.23], [0.525, 0.30], [0.58, 0.23]], np.float32)


def inserting_expert_step(st: InsertingExpertState, des_xy, tcp_xy,
                          boxes_pos, visited, order, push_depth=PUSH_DEPTH):
    """One control step of the scripted inserting expert.

    order [3]: permutation of box indices (= insertion order, defining the
    behavior mode); visited [3] bool from the env state (box at target).
    Each box is pushed along INSERT_ROUTES[box] with continuous aim
    correction; the env's own visited flag ends a stage, so the gate walls
    (which stop the box inside the 1 cm success ball) do the fine placement."""
    routes = jnp.asarray(INSERT_ROUTES)
    retreats = jnp.asarray(INSERT_RETREATS)
    n = 3
    stage = jnp.minimum(st.stage, n - 1)
    b = order[stage]
    finished = st.stage >= n

    # current box placed -> back the rod out, then advance to the next box
    phase = jnp.where(visited[b] & (st.phase != 2), 2, st.phase)
    ret_pt = retreats[b]
    ret_done = (phase == 2) & (jnp.linalg.norm(tcp_xy - ret_pt) < 0.03)
    stage2 = jnp.minimum(st.stage + ret_done.astype(st.stage.dtype), n)
    wp_i = jnp.where(ret_done, 0, st.wp)
    phase = jnp.where(ret_done, 0, phase)
    stage_c = jnp.minimum(stage2, n - 1)
    b = order[stage_c]
    bpos = boxes_pos[b, :2]

    # waypoint advance (the final route point holds until `visited` flips).
    # Gate entry needs the box ON the gate axis: the chambers admit the
    # 5 cm box through 5.5-5.6 cm openings, so entering >8 mm off-axis jams
    # it on a wall corner. Hysteresis (advance <8 mm, restage >15 mm)
    # prevents staging flip-flop.
    wp = routes[b, wp_i]
    axis_off = jnp.where(b == 1, jnp.abs(bpos[0] - 0.525),
                         jnp.abs(bpos[1] - 0.276))
    near_wp = jnp.linalg.norm(bpos - wp) < 0.035
    adv = ((wp_i == 0) & near_wp) | \
          ((wp_i == 1) & near_wp & (axis_off < 0.008))
    wp_i = wp_i + adv.astype(wp_i.dtype)
    wp_i = jnp.where((wp_i == 2) & (axis_off > 0.015) & ~visited[b],
                     jnp.ones_like(wp_i), wp_i)
    phase = jnp.where(adv & (phase != 2), 0, phase)
    wp = routes[b, wp_i]

    to_wp = wp - bpos
    u = to_wp / (jnp.linalg.norm(to_wp) + 1e-9)
    approach_pt = bpos - u * PUSH_APPROACH
    near = jnp.linalg.norm(approach_pt - tcp_xy) < 0.015
    phase = jnp.where((phase == 0) & near, 1, phase)
    # rod fell out of pushing position (wrong side / too far off the push
    # line, e.g. after a direction change): re-approach
    rel = tcp_xy - bpos
    along = jnp.dot(rel, u)
    perp = jnp.linalg.norm(rel - along * u)
    bad = (phase == 1) & ((along > -0.005) | (perp > 0.05))
    phase = jnp.where(bad, 0, phase)

    final = wp_i >= 2
    pstep = jnp.where(final, 0.004, 0.006)
    lead = jnp.where(final, 0.03, 0.04)
    push_pt = bpos - u * push_depth
    nxt_push = _limit_lead(_step_toward(des_xy, push_pt, pstep), tcp_xy, lead)
    # avoid every unplaced box on approach, including the target box (see
    # pushing_expert_step: an unrouted approach plows the box off its route)
    others = ~visited
    nxt_app = _route_around(des_xy, tcp_xy, approach_pt, boxes_pos[:, :2],
                            others)
    nxt_ret = _limit_lead(_step_toward(des_xy, ret_pt, 0.008), tcp_xy, 0.05)

    nxt = jnp.where(phase == 2, nxt_ret,
                    jnp.where(phase == 1, nxt_push, nxt_app))
    # keep the rod inside the board area: a detour target outside it drags
    # boxes out of the maze for good
    nxt = jnp.clip(nxt, jnp.array([0.30, -0.27]), jnp.array([0.75, 0.47]))
    delta = jnp.where(finished, jnp.zeros(2), nxt - des_xy)
    return InsertingExpertState(stage=stage2, wp=wp_i, phase=phase), delta


# ---------------------------------------------------------------- aligning

class AligningExpertState(NamedTuple):
    phase: jax.Array    # 0 travel, 1 descend, 2 work
    rotating: jax.Array  # bool: in a rotation stint (hysteresis latch)
    wall: jax.Array     # latched wall index for the current rotate stint


ALIGN_R_IN = 0.040
ALIGN_R_OUT = 0.062
ALIGN_Z_HIGH = 0.25
# Working height: the rod tip (~tcp_z - 0.12) must engage the tray WALLS
# (tops at z~0.0935) without dragging on the bottom plate (top at ~0.021) —
# a plate-dragging rod turns every press into an unpredictable friction push
ALIGN_Z_LOW = 0.17


def aligning_expert_step(st: AligningExpertState, des_pos, tcp_pos,
                         tray_pos, tray_quat, tgt_pos, tgt_quat, mode):
    """mode 0: work from inside the tray; 1: from outside.

    Alternates a translate press (wall facing/behind the target direction)
    with a rotate press (wall pressed at a lateral offset from the tray
    center, so the contact-normal force torques the tray). The yaw error is
    NOT symmetry-folded: the env scores raw quaternion distance
    (aligning.py:22-30 rotation_distance), so a pi-flipped tray fails."""
    c = tray_pos[:2]
    yaw = _yaw_of(tray_quat)
    dyaw = _wrap(_yaw_of(tgt_quat) - yaw)
    dp = tgt_pos[:2] - c
    dpn = jnp.linalg.norm(dp)
    pos_ok = dpn < 0.012
    rot_ok = jnp.abs(dyaw) < 0.10
    inside = mode == 0

    entry = jnp.where(inside, c, c + jnp.array([0.0, -0.09]))
    at_entry = jnp.linalg.norm(des_pos[:2] - entry) <= 0.008
    low = des_pos[2] <= ALIGN_Z_LOW + 0.004
    phase = jnp.where(st.phase == 0, jnp.where(at_entry, 1, 0), st.phase)
    phase = jnp.where((phase == 1) & low, 2, phase)

    hover = jnp.concatenate([entry, jnp.array([ALIGN_Z_HIGH])])
    dive = jnp.concatenate([entry, jnp.array([ALIGN_Z_LOW])])
    d_travel = _step_toward(des_pos, hover, 0.01) - des_pos
    d_descend = _step_toward(des_pos, dive, 0.008) - des_pos

    ca, sa = jnp.cos(yaw), jnp.sin(yaw)
    Rm = jnp.array([[ca, -sa], [sa, ca]])
    c_ob = c[None]  # tray as a routing obstacle (outside mode)
    tray_active = jnp.array([~inside])

    # Work scheduling with hysteresis (a naive alternate-on-threshold loop
    # thrashes: every rotation press disturbs position, every reposition
    # takes 10+ steps of rod travel): rotate in long stints until the yaw
    # error is well inside tolerance, translate otherwise, and only re-enter
    # rotation when yaw drifts near the failure threshold again.
    rotating = jnp.where(st.rotating, jnp.abs(dyaw) > 0.05,
                         jnp.abs(dyaw) > 0.12)

    # --- translate: two axis-aligned legs in the TRAY frame, pressing the
    # wall CENTER (a face-center push is self-stabilizing and preserves yaw;
    # pushing along an arbitrary world direction engages a corner and spins
    # the tray). Pick the tray axis with the larger error component.
    dpl = Rm.T @ dp
    axis = jnp.argmax(jnp.abs(dpl))
    sgn_t = jnp.sign(dpl[axis])
    dir_local = jax.nn.one_hot(axis, 2) * sgn_t
    u_t = Rm @ dir_local
    rad = jnp.where(inside, ALIGN_R_IN, ALIGN_R_OUT)
    indent = jnp.where(dpn < 0.03, 0.004, 0.012)
    tstep = jnp.where(dpn < 0.05, 0.003, 0.006)
    contact = jnp.where(inside, c + u_t * rad, c - u_t * rad)
    goal2 = contact + u_t * indent
    # outside mode: if the rod ended up ahead of the tray (overshoot) or on
    # the wrong side for this leg, orbit around the tray instead of pushing
    # it further away
    ahead = jnp.dot(tcp_pos[:2] - c, u_t) > 0.02
    nxt_direct = _limit_lead(_step_toward(des_pos[:2], goal2, tstep),
                             tcp_pos[:2], 0.035)
    nxt_orbit = _route_around(des_pos[:2], tcp_pos[:2], goal2, c_ob,
                              tray_active, block_r=0.095, detour_r=0.14)
    nxt_t = jnp.where(~inside & ahead, nxt_orbit, nxt_direct)

    # --- rotate: press a wall at a lateral offset so the normal force
    # torques the tray. The pressed wall is chosen so the press's induced
    # TRANSLATION pushes the tray toward the target: a fixed-wall press is a
    # positive-feedback chase (the press point rides the tray as the press
    # shoves it, bulldozing it across the table), but a target-seeking wall
    # choice flips sides when the tray overshoots, so the drift is bounded
    # around the target while the torque accumulates.
    sgn = jnp.sign(dyaw)
    off = jnp.where(inside, 0.030, 0.040)
    wall_x = jnp.where(inside, 0.045 - 0.010 + 0.004,   # inner face - rod + indent
                       0.055 + 0.010 - 0.004)           # outer face + rod - indent
    e_loc = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    n_world = e_loc @ Rm.T                      # outward wall normals, world
    u_dp = dp / (dpn + 1e-9)
    push_sign = jnp.where(inside, 1.0, -1.0)    # press moves tray along ±n_k
    k_best = jnp.argmax(push_sign * (n_world @ u_dp))
    # latch the wall while it still pushes the tray TOWARD the target:
    # re-picking every step makes the outside rod orbit between walls and
    # never press, but holding a stale wall bulldozes the tray past the
    # target — release the latch once the held wall's push direction turns
    # away from the target
    held_push = push_sign * n_world[st.wall]
    stale = jnp.dot(held_push, u_dp) < -0.15
    k_wall = jnp.where(st.rotating & rotating & ~stale, st.wall, k_best)
    e_k = e_loc[k_wall]
    t_k = jnp.stack([-e_k[1], e_k[0]])
    o = jnp.where(inside, -sgn, sgn) * off
    press_local = e_k * wall_x + t_k * o
    press = c + Rm @ press_local
    nxt_r_direct = _limit_lead(_step_toward(des_pos[:2], press, 0.005),
                               tcp_pos[:2], 0.03)
    nxt_r_orbit = _route_around(des_pos[:2], tcp_pos[:2], press, c_ob,
                                tray_active, block_r=0.095, detour_r=0.14)
    # outside: orbit when the press point is on the far side of the tray
    blocked = jnp.dot(tcp_pos[:2] - c, (press - c)) < 0
    nxt_r = jnp.where(~inside & blocked, nxt_r_orbit, nxt_r_direct)

    nxt2 = jnp.where(rotating, nxt_r, nxt_t)
    d_work = jnp.concatenate([nxt2 - des_pos[:2], jnp.zeros(1)])
    d_work = jnp.where(pos_ok & rot_ok, jnp.zeros(3), d_work)

    delta = jnp.where(phase == 0, d_travel,
                      jnp.where(phase == 1, d_descend, d_work))
    return AligningExpertState(phase=phase, rotating=rotating,
                               wall=k_wall), delta


# ---------------------------------------------------------------- stacking

class StackingExpertState(NamedTuple):
    stage: jax.Array   # which box in the order (0..2; 3 = finished)
    phase: jax.Array   # 0 hover,1 descend,2 close,3 lift,4 carry,5 place,
    #                    6 open,7 retreat
    hold: jax.Array    # dwell counter for close/open
    q_des: jax.Array   # [7] joint setpoint the expert maintains


STACK_Z_HOVER = 0.22
# grasp height: tip-pad contact band centered on the resting box center
# (z ~ 0.011; tips sit ~9 mm below the grasptarget) — grasping higher leaves
# both contact rows above the box c.o.m. and the box pendulums out of the
# pinch during transport
STACK_Z_GRASP = 0.018
STACK_HOLD_CLOSE = 22   # > the env's 0.5 s close_fingers servo window, so
#                         the -20 N grasp force is engaged before lifting
STACK_HOLD_OPEN = 10


def _ik_toward(ctrl_chain, q, tgt_pos, tgt_quat, iters: int = 10,
               lr: float = 0.002, rate: float = 0.05):
    """Rate-limited DLS IK tracking: move q a bounded step toward the target
    EE pose (expert-side analogue of the impedance controller's virtual
    trajectory, with a faster learning rate for waypoint seeking)."""
    from d3il_tpu.robot import chain as chain_mod
    from d3il_tpu.robot.panda import JOINT_POS_MIN, JOINT_POS_MAX
    ee = ctrl_chain.body_index("panda_grasptarget")
    lo = jnp.asarray(JOINT_POS_MIN, q.dtype)
    hi = jnp.asarray(JOINT_POS_MAX, q.dtype)
    q0 = q

    def it(q, _):
        xpos, xquat = chain_mod.fk(ctrl_chain, q)
        cur_q = xquat[ee]
        flip = jnp.where(
            jnp.sum((cur_q - tgt_quat) ** 2) > jnp.sum((cur_q + tgt_quat) ** 2),
            -1.0, 1.0)
        dqt = tgt_quat * flip
        pos_err = jnp.clip(tgt_pos - xpos[ee], -0.02, 0.02)
        quat_err = jnp.clip(quat_ops.quat_error(cur_q, dqt), -0.1, 0.1)
        err = jnp.concatenate([pos_err * 200.0, quat_err * 30.0])
        J = chain_mod.point_jacobian(ctrl_chain, q, ee,
                                     fk_cache=(xpos, xquat))[:, :7]
        A = J @ J.T + 1e-6 * jnp.eye(6, dtype=q.dtype)
        qd = J.T @ jnp.linalg.solve(A, err)
        nrm = jnp.linalg.norm(qd)
        qd = jnp.where(nrm > 3.0, qd * 3.0 / jnp.maximum(nrm, 1e-9), qd)
        return jnp.clip(q + lr * qd, lo, hi), None

    q, _ = jax.lax.scan(it, q, None, length=iters)
    dq = q - q0
    n = jnp.linalg.norm(dq)
    return q0 + jnp.where(n > rate, dq * rate / jnp.maximum(n, 1e-9), dq)


def stacking_expert_step(ctrl_chain, st: StackingExpertState, box_pos,
                         box_quat, target_xy, order, tcp_pos=None,
                         width_meas=None):
    """One control step of the pick-and-place expert. Returns
    (state, action8 = [q_des, width_cmd]).

    tcp_pos: PHYSICAL grasptarget position — phase advance gates on the real
    arm, not the virtual IK pose (the PD-tracked plant lags the virtual
    trajectory by up to ~3 cm during fast descents, so gating on the virtual
    pose closed the fingers beside the box). width_meas: measured finger
    opening; a fully-closed gripper after the close dwell means the grasp
    missed, and the expert retries from hover instead of lifting air."""
    from d3il_tpu.robot import chain as chain_mod
    ee = ctrl_chain.body_index("panda_grasptarget")
    stage = jnp.minimum(st.stage, 2)
    b = order[stage]
    bp = box_pos[b]
    yaw = _yaw_of(box_quat[b])
    # fold grasp-yaw symmetry: square boxes (r,g) pi/2; blue (rectangular) pi.
    # Blue is 0.06 x 0.10 x 0.06: the fingers (max opening 0.08, separated
    # along gripper-y) must close across its 0.06 x-axis, so the gripper yaw
    # is the box yaw ROTATED 90 deg (gripper-y parallel to box-x); aligning
    # with box-y parks the pads on top of the 0.10-wide faces instead.
    yaw_sq = _wrap(yaw + jnp.pi / 4) % (jnp.pi / 2) - jnp.pi / 4
    yb = _wrap(yaw + jnp.pi / 2)
    yaw_bl = jnp.where(yb > jnp.pi / 2, yb - jnp.pi,
                       jnp.where(yb < -jnp.pi / 2, yb + jnp.pi, yb))
    gyaw = jnp.where(b == 2, yaw_bl, yaw_sq)
    h = gyaw / 2.0
    tgt_quat = jnp.array([0.0, 0.0, 0.0, 0.0]).at[1].set(jnp.cos(h)).at[2].set(
        jnp.sin(h))

    z_stack = 0.02 + 0.062 * stage.astype(bp.dtype)
    wp_tab = jnp.stack([
        jnp.array([bp[0], bp[1], STACK_Z_HOVER]),        # 0 hover
        jnp.array([bp[0], bp[1], STACK_Z_GRASP]),        # 1 descend
        jnp.array([bp[0], bp[1], STACK_Z_GRASP]),        # 2 close (dwell)
        jnp.array([bp[0], bp[1], STACK_Z_HOVER]),        # 3 lift
        jnp.array([target_xy[0], target_xy[1], STACK_Z_HOVER]),  # 4 carry
        jnp.array([target_xy[0], target_xy[1], z_stack]),        # 5 place
        jnp.array([target_xy[0], target_xy[1], z_stack]),        # 6 open
        jnp.array([target_xy[0], target_xy[1], STACK_Z_HOVER]),  # 7 retreat
    ])
    tol_tab = jnp.array([0.02, 0.006, 1.0, 0.02, 0.015, 0.006, 1.0, 0.02])
    wp = wp_tab[st.phase]
    tol = tol_tab[st.phase]

    wp_ik, rate = wp, jnp.asarray(0.05, wp.dtype)
    if tcp_pos is not None:
        # vertical pick/place approach: hold altitude while xy-off-center and
        # ramp the z-target down only as the gripper centers (a diagonal
        # descent reaches the box top before xy converges, a finger lands ON
        # the box, and friction deadlocks the lateral correction; a binary
        # descend/climb gate instead limit-cycles with the PD swing)
        des_ph = (st.phase == 1) | (st.phase == 5)
        xy_err = jnp.linalg.norm(tcp_pos[:2] - wp[:2])
        z_gate = jnp.maximum(
            wp[2], tcp_pos[2] - 0.8 * jnp.clip(0.012 - xy_err, 0.0, 0.012))
        z_gate = jnp.minimum(z_gate, jnp.asarray(STACK_Z_HOVER, wp.dtype))
        wp_ik = wp.at[2].set(jnp.where(des_ph, z_gate, wp[2]))
        # slow the virtual trajectory near the workpiece so the PD-tracked
        # plant stays within a few mm of it
        rate = jnp.where(des_ph & (tcp_pos[2] < 0.12), 0.02, 0.05)

    dwell = (st.phase == 2) | (st.phase == 6)
    q_new = _ik_toward(ctrl_chain, st.q_des, wp_ik, tgt_quat, rate=rate)
    q_des = jnp.where(dwell | (st.stage >= 3), st.q_des, q_new)

    if tcp_pos is None:
        tcp_pos = chain_mod.fk(ctrl_chain, q_des)[0][ee]
    reached = jnp.linalg.norm(tcp_pos - wp) < tol

    hold_lim = jnp.where(st.phase == 2, STACK_HOLD_CLOSE, STACK_HOLD_OPEN)
    hold = jnp.where(dwell, st.hold + 1, 0)
    advance = jnp.where(dwell, hold >= hold_lim, reached)
    advance = advance & (st.stage < 3)
    # missed grasp: after the close dwell the fingers are (nearly) fully
    # closed -> nothing between them; go back to hover over the box and retry
    missed = (width_meas < 0.02) if width_meas is not None else jnp.array(False)
    retry = advance & (st.phase == 2) & missed
    phase = jnp.where(advance, st.phase + 1, st.phase)
    phase = jnp.where(retry, 0, phase)
    wrap = phase > 7
    stage2 = st.stage + wrap.astype(st.stage.dtype)
    phase = jnp.where(wrap, 0, phase)

    # gripper: open through descend; closed from close..place; open after
    width = jnp.where((phase >= 2) & (phase <= 5), 0.0, 0.08)
    action = jnp.concatenate([q_des, jnp.array([0.0]).at[0].set(width)])
    return StackingExpertState(stage=stage2, phase=phase, hold=hold,
                               q_des=q_des), action


# ------------------------------------------------------------ batched runs
#
# Each runner is split into (init, chunk): `init` builds the episode carry,
# `chunk` advances CHUNK env steps under one jit. The host loops over chunks
# (long single device executions trip RPC limits on tunneled TPUs, and
# chunking also lets generation stop early once every lane is done).

CHUNK = 50

# Exploration noise injected into the EXECUTED setpoint during demo
# generation (and logged, so action labels include it). The experts compute
# fresh targets from state every step, so they correct the perturbations —
# which is exactly what makes the datasets contain recovery behavior. Clean
# scripted rollouts train policies with ~0 coverage off the nominal path:
# closed-loop they drift a few mm, lose the box, and never recover (human
# demos get this coverage for free from human motor noise).
DES_NOISE = 0.0015


class EpCarry(NamedTuple):
    env: object
    es: object
    des: jax.Array
    done: jax.Array
    key: jax.Array


def _freeze_env(done, new, old):
    return jax.tree_util.tree_map(lambda n, o: jnp.where(done, o, n), new, old)


def _chunk_fn(step_once, length):
    def chunk(carry):
        def body(c, _):
            c2, log, done = step_once(c)
            return c2, (log, done)
        carry, (logs, dones) = jax.lax.scan(body, carry, None, length=length)
        return carry, logs, dones
    return chunk


def make_avoiding_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import avoiding as env

    def init(key):
        state = env.reset(params)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = AvoidingExpertState(k=jnp.array(0, jnp.int32))
        return EpCarry(state, es0, tcp0[:2], jnp.array(False), key), tcp0[2:3]

    def step_once(cw):
        carry, (waypoints, fixed_z) = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        es2, delta = avoiding_expert_step(es, des, tcp[:2], waypoints)
        noise = jax.random.normal(kn, des.shape) * DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (jnp.concatenate([des2, fixed_z]), tcp)
        action = jnp.concatenate([des2, fixed_z,
                                  jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des2, done | res.done, key),
                (waypoints, fixed_z)), log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def make_pushing_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import pushing as env
    depth = PUSH_DEPTH if params.kinematic else PUSH_DEPTH_DYN

    def init(ctx, key):
        state = env.reset(params, ctx)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = init_push_expert_state()
        return EpCarry(state, es0, tcp0[:2], jnp.array(False), key), tcp0[2:3]

    def step_once(cw):
        carry, (seq_box, seq_tgt, fixed_z) = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        boxes = state.scene.free_pos[:, :2]
        if params.kinematic:
            kw = dict(push_step=0.006, lead=0.04, app_step=0.01,
                      app_lead=0.03)
        else:
            kw = dict(push_step=0.011, lead=0.05, app_step=0.011,
                      app_lead=0.11, strike_depth=-0.06, strike_lead=0.09,
                      strike_radius=0.058, near_r=0.045,
                      block_r=0.095, detour_r=0.13)
        es2, delta = pushing_expert_step(es, des, tcp[:2], boxes, seq_box,
                                         seq_tgt, push_depth=depth, **kw)
        noise = jax.random.normal(kn, des.shape) * DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (jnp.concatenate([des2, fixed_z]), tcp,
               state.scene.free_pos, state.scene.free_quat)
        action = jnp.concatenate([des2, fixed_z,
                                  jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des2, done | res.done, key),
                (seq_box, seq_tgt, fixed_z)), log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def make_sorting_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import sorting as env
    depth = PUSH_DEPTH if params.kinematic else PUSH_DEPTH_DYN
    half = params.num_boxes // 2

    def init(ctx, key):
        state = env.reset(params, ctx)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = SortingExpertState(stage=jnp.array(0, jnp.int32),
                                 phase=jnp.array(0, jnp.int32),
                                 prev_b=jnp.array(-1, jnp.int32))
        return EpCarry(state, es0, tcp0[:2], jnp.array(False), key), tcp0[2:3]

    if params.kinematic:
        sort_kw = dict(push_depth=depth)
    else:
        # dynamic pacing: the box-anchored carried push is stable up to
        # ~45 mm/s at depth 0.045 (tools/diag_dynamic_push.py depth sweep);
        # sorting's 700-step horizon and ~0.35 m per-box travel fit at that
        # speed with fast approaches
        sort_kw = dict(push_depth=0.045, pstep_slow=0.011, pstep_fast=0.011,
                       lead_slow=0.06, lead_fast=0.075, app_step=0.011,
                       app_lead=0.08, near_r=0.045, dyn=True, dyn_adv=0.09,
                       x_ok_r=0.03, block_r=0.105, detour_r=0.15)

    def step_once(cw):
        carry, (order, fixed_z) = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        es2, delta = sorting_expert_step(es, des, tcp[:2],
                                         state.scene.free_pos, order, half,
                                         **sort_kw)
        noise = jax.random.normal(kn, des.shape) * DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (jnp.concatenate([des2, fixed_z]), tcp,
               state.scene.free_pos, state.scene.free_quat)
        action = jnp.concatenate([des2, fixed_z,
                                  jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des2, done | res.done, key),
                (order, fixed_z)), log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def make_inserting_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import inserting as env
    depth = PUSH_DEPTH if params.kinematic else PUSH_DEPTH_DYN

    def init(ctx, key):
        state = env.reset(params, ctx)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = InsertingExpertState(stage=jnp.array(0, jnp.int32),
                                   wp=jnp.array(0, jnp.int32),
                                   phase=jnp.array(0, jnp.int32))
        return EpCarry(state, es0, tcp0[:2], jnp.array(False), key), tcp0[2:3]

    def step_once(cw):
        carry, (order, fixed_z) = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        es2, delta = inserting_expert_step(es, des, tcp[:2],
                                           state.scene.free_pos,
                                           state.visited, order,
                                           push_depth=depth)
        noise = jax.random.normal(kn, des.shape) * DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (jnp.concatenate([des2, fixed_z]), tcp,
               state.scene.free_pos, state.scene.free_quat)
        action = jnp.concatenate([des2, fixed_z,
                                  jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des2, done | res.done, key),
                (order, fixed_z)), log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def make_aligning_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import aligning as env

    def init(ctx, key):
        state = env.reset(params, ctx)
        tcp0, _ = params.tcp_pose(state.scene)
        es0 = AligningExpertState(phase=jnp.array(0, jnp.int32),
                                  rotating=jnp.array(False),
                                  wall=jnp.array(0, jnp.int32))
        return EpCarry(state, es0, tcp0, jnp.array(False), key)

    def step_once(cw):
        carry, mode = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp, _ = params.tcp_pose(state.scene)
        es2, delta = aligning_expert_step(
            es, des, tcp, state.scene.free_pos[0], state.scene.free_quat[0],
            state.target_pos, state.target_quat, mode)
        noise = jax.random.normal(kn, des.shape) * DES_NOISE
        des2 = jnp.where(done, des,
                         des + jnp.clip(delta + noise, -0.011, 0.011))
        log = (des2, tcp, state.scene.free_pos[0], state.scene.free_quat[0])
        action = jnp.concatenate([des2, jnp.array([0.0, 1.0, 0.0, 0.0])])
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des2, done | res.done, key), mode), \
            log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def make_stacking_runner(params, chunk_len: int = CHUNK):
    from d3il_tpu.envs import stacking as env
    chain = params.ctrl_chain

    def init(ctx, key):
        state = env.reset(params, ctx)
        es0 = StackingExpertState(
            stage=jnp.array(0, jnp.int32), phase=jnp.array(0, jnp.int32),
            hold=jnp.array(0, jnp.int32), q_des=state.scene.q[:7])
        return EpCarry(state, es0, jnp.zeros(0), jnp.array(False), key)

    def step_once(cw):
        carry, order = cw
        state, es, des, done, key = carry
        key, kn = jax.random.split(key)
        tcp_pos, _ = params.tcp_pose(state.scene)
        es2, action = stacking_expert_step(
            chain, es, state.scene.free_pos, state.scene.free_quat,
            state.target_xy, order, tcp_pos=tcp_pos,
            width_meas=state.scene.q[7] + state.scene.q[8])
        # executed joint setpoint carries the exploration noise; the logged
        # des_j_pos is the executed one (labels include the noise, states
        # cover its perturbations, the expert's next step corrects them)
        q_noise = jax.random.normal(kn, (7,)) * 0.002
        action = action.at[:7].add(jnp.where(done, 0.0, q_noise))
        width_meas = state.scene.q[7] + state.scene.q[8]
        log = (action[:7], width_meas, state.scene.free_pos,
               state.scene.free_quat)
        ns, res = env.step(params, state, action)
        state2 = _freeze_env(done, ns, state)
        es2 = _freeze_env(done, es2, es)
        return (EpCarry(state2, es2, des, done | res.done, key), order), \
            log, res.done

    return init, _chunk_fn(step_once, chunk_len)


def run_chunked(chunk_v, cw, max_steps: int, chunk_len: int = CHUNK):
    """Host driver: advance a prepared batched carry chunk-by-chunk until
    every lane is done (or max_steps), concatenating logs on host.

    cw: the vmapped (EpCarry, extras) tuple chunk_v consumes.
    Returns (final_cw, logs [B,T,...] numpy, dones [B,T] numpy)."""
    logs_parts, dones_parts = [], []
    steps = 0
    while steps < max_steps:
        cw, logs, dones = chunk_v(cw)
        logs_parts.append(jax.tree_util.tree_map(np.asarray, logs))
        d = np.asarray(dones)
        dones_parts.append(d)
        steps += chunk_len
        if d.any(axis=1).all():
            break
    logs = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=1), *logs_parts)
    dones = np.concatenate(dones_parts, axis=1)
    return cw, logs, dones
