"""Scripted expert policies for synthetic demonstration generation.

The reference datasets come from human gamepad teleoperation
(gamepad_control/record_data.py); the recorded pickles are distributed
out-of-repo. To keep this framework self-contained, these scripted experts
generate multimodal demonstrations with the same episode schema and the same
solution-mode diversity (gate choices / push orders), so the full
data -> train -> batched-eval loop runs end to end.

Experts are host-side state machines emitting absolute xy setpoints with
|delta| <= 0.01 per env step (the reference action clip, pushing.py:203-205).
"""
from __future__ import annotations

import numpy as np

from d3il_tpu.envs import scenes


def _step_toward(xy, tgt, step=0.01):
    return xy + np.clip(np.asarray(tgt) - xy, -step, step)


class AvoidingExpert:
    """Pick one of the 24 gate paths (2 x 3 x 4) and walk its waypoints."""

    # gate x-coordinates with clearance from the obstacles
    L1_X = {0: 0.42, 1: 0.58}
    L2_X = {0: 0.35, 1: 0.5, 2: 0.65}
    L3_X = {0: 0.27, 1: 0.425, 2: 0.575, 3: 0.73}

    def __init__(self, rng: np.random.Generator, mode: tuple | None = None):
        if mode is None:
            mode = (rng.integers(2), rng.integers(3), rng.integers(4))
        self.mode = mode
        self.rng = rng
        g1, g2, g3 = mode
        jitter = lambda: rng.uniform(-0.012, 0.012)
        # straight vertical corridors through each gate: corner turns happen
        # in the obstacle-free bands between levels, so the lagging tcp can
        # cut corners without clipping an obstacle
        x1 = self.L1_X[g1] + jitter()
        x2 = self.L2_X[g2] + jitter()
        x3 = self.L3_X[g3] + jitter()
        # corridors extend well past each gate so the underdamped arm's
        # corner overshoot (~3 cm) happens inside the obstacle-free bands
        self.waypoints = [
            np.array([x1, scenes.AVOIDING_L1_Y - 0.07]),
            np.array([x1, scenes.AVOIDING_L1_Y + 0.08]),
            np.array([x2, scenes.AVOIDING_L2_Y - 0.07]),
            np.array([x2, scenes.AVOIDING_L2_Y + 0.08]),
            np.array([x3, scenes.AVOIDING_L3_Y - 0.07]),
            np.array([x3, scenes.AVOIDING_GOAL_Y + 0.03]),
        ]
        self.k = 0

    def act(self, des_xy: np.ndarray, tcp_xy: np.ndarray) -> np.ndarray:
        # advance waypoints on the PHYSICAL tcp (the controller trails the
        # setpoint; switching on the setpoint would cut corners blindly)
        while (self.k < len(self.waypoints) - 1
               and np.linalg.norm(self.waypoints[self.k] - tcp_xy) < 0.03):
            self.k += 1
        # Lag-band regulation: the reference impedance controller is only
        # fast & smooth when the setpoint leads the arm by more than its IK
        # error clip (sustained saturation); with small leads its feedforward
        # spike train rectifies through the torque clamp into net drag. Keep
        # the lead inside a 3.5-8 cm band like a human teleoperator would.
        lag = np.linalg.norm(des_xy - tcp_xy)
        if lag < 0.035:
            step = _step_toward(des_xy, self.waypoints[self.k], 0.010) - des_xy
        elif lag < 0.08:
            step = _step_toward(des_xy, self.waypoints[self.k], 0.005) - des_xy
        else:
            step = _step_toward(des_xy, self.waypoints[self.k], 0.001) - des_xy
        return step


class PushingExpert:
    """Push both boxes to targets; order/assignment = one of 4 modes.

    mode 0: red->red then green->green; 1: green->green then red->red;
    2: red->green then green->red; 3: green->red then red->green
    (mode ids match pushing.py:341-377).
    """

    APPROACH = 0.065
    PUSH_STOP = 0.032

    def __init__(self, rng: np.random.Generator, mode: int | None = None):
        self.mode = int(rng.integers(4)) if mode is None else mode
        t1 = scenes.PUSHING_TARGET_1[:2]
        t2 = scenes.PUSHING_TARGET_2[:2]
        # (box index, target) sequence per mode
        seq = {0: [(0, t1), (1, t2)], 1: [(1, t2), (0, t1)],
               2: [(0, t2), (1, t1)], 3: [(1, t1), (0, t2)]}[self.mode]
        self.seq = seq
        self.stage = 0          # which (box, target) pair
        self.phase = "approach"
        self.rng = rng

    def act(self, des_xy: np.ndarray, tcp_xy: np.ndarray,
            box_xy: np.ndarray) -> np.ndarray:
        """des_xy: current setpoint; tcp_xy: physical EE; box_xy: [2,2]."""
        if self.stage >= len(self.seq):
            return np.zeros(2)
        b, tgt = self.seq[self.stage]
        bpos = box_xy[b]
        to_tgt = tgt - bpos
        d_tgt = np.linalg.norm(to_tgt)
        if d_tgt < self.PUSH_STOP:
            self.stage += 1
            self.phase = "approach"
            return np.zeros(2)
        u = to_tgt / (d_tgt + 1e-9)
        approach_pt = bpos - u * self.APPROACH

        if self.phase == "approach":
            if np.linalg.norm(approach_pt - tcp_xy) < 0.015:
                self.phase = "push"
            else:
                # route around the box if the straight line passes through it
                v = approach_pt - tcp_xy
                L = np.linalg.norm(v) + 1e-9
                tproj = np.clip(np.dot(bpos - tcp_xy, v) / (L * L), 0, 1)
                closest = tcp_xy + tproj * v
                target_pt = approach_pt
                if np.linalg.norm(closest - bpos) < 0.075:
                    perp = np.array([-u[1], u[0]])
                    side = np.sign(np.dot(tcp_xy - bpos, perp)) or 1.0
                    target_pt = bpos + perp * side * 0.11
                nxt = _step_toward(des_xy, target_pt)
                ahead = nxt - tcp_xy
                d = np.linalg.norm(ahead)
                if d > 0.03:
                    nxt = tcp_xy + ahead / d * 0.03
                return nxt - des_xy
        if self.phase == "push":
            # push through the box toward the target, tracking the box
            push_pt = bpos - u * 0.02
            nxt = _step_toward(des_xy, push_pt, 0.006)
            ahead = nxt - tcp_xy
            d = np.linalg.norm(ahead)
            if d > 0.04:
                nxt = tcp_xy + ahead / d * 0.04
            return nxt - des_xy
        return np.zeros(2)


class SortingExpert:
    """Push each box off the platform's +y edge into its color zone.

    Boxes slide on the raised platform (top z=0.1) and drop over the edge at
    y=0.2 into the zones (red x in (0.3,0.5), blue x in (0.525,0.725),
    y in (0.22,0.41); sorting.py:489-503). The rod's fixed rollout height only
    reaches platform boxes, so each push must aim the drop point. The mode is
    the color order of arrival; `order` is a permutation of box indices.
    """

    APPROACH = 0.065
    DONE_Y = 0.215   # box has left the platform edge (y=0.2) and dropped

    def __init__(self, rng: np.random.Generator, num_boxes: int,
                 order: list | None = None):
        self.n = num_boxes
        self.half = num_boxes // 2
        if order is None:
            order = list(rng.permutation(num_boxes))
        self.order = [int(i) for i in order]
        self.stage = 0
        self.phase = "approach"
        self.rng = rng

    def _target_for(self, b: int, bpos: np.ndarray) -> np.ndarray:
        lo, hi = ((0.33, 0.47) if b < self.half else (0.555, 0.695))
        return np.array([np.clip(bpos[0], lo, hi), 0.32])

    def act(self, des_xy, tcp_xy, box_xy):
        """box_xy [n,2] platform-frame box centers."""
        while (self.stage < self.n
               and box_xy[self.order[self.stage]][1] > self.DONE_Y):
            self.stage += 1
            self.phase = "approach"
        if self.stage >= self.n:
            return np.zeros(2)
        b = self.order[self.stage]
        bpos = box_xy[b]
        tgt = self._target_for(b, bpos)
        to_tgt = tgt - bpos
        u = to_tgt / (np.linalg.norm(to_tgt) + 1e-9)
        approach_pt = bpos - u * self.APPROACH

        if self.phase == "approach":
            if np.linalg.norm(approach_pt - tcp_xy) < 0.015:
                self.phase = "push"
            else:
                # route around any box blocking the straight line
                v = approach_pt - tcp_xy
                L = np.linalg.norm(v) + 1e-9
                target_pt = approach_pt
                for ob in range(self.n):
                    op = box_xy[ob]
                    if op[1] > self.DONE_Y:
                        continue
                    tproj = np.clip(np.dot(op - tcp_xy, v) / (L * L), 0, 1)
                    if np.linalg.norm(tcp_xy + tproj * v - op) < 0.075 \
                            and np.linalg.norm(op - tcp_xy) < L:
                        w = v / L
                        perp = np.array([-w[1], w[0]])
                        side = np.sign(np.dot(tcp_xy - op, perp)) or 1.0
                        target_pt = op + perp * side * 0.11
                        break
                nxt = _step_toward(des_xy, target_pt)
                ahead = nxt - tcp_xy
                d = np.linalg.norm(ahead)
                if d > 0.03:
                    nxt = tcp_xy + ahead / d * 0.03
                return nxt - des_xy
        if self.phase == "push":
            push_pt = bpos - u * 0.02
            nxt = _step_toward(des_xy, push_pt, 0.006)
            ahead = nxt - tcp_xy
            d = np.linalg.norm(ahead)
            if d > 0.04:
                nxt = tcp_xy + ahead / d * 0.04
            return nxt - des_xy
        return np.zeros(2)


def _wrap_angle(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


class AligningExpert:
    """Drive the open tray to a target pose (position + yaw), one of 2 modes.

    Inside mode (0): lower the rod into the tray; translate by pressing the
    inner wall facing the motion direction; rotate by seating the rod in an
    inner corner and sweeping it along an arc about the tray center.
    Outside mode (1): same contact strategy mirrored to the outer walls
    (press the trailing outer wall to translate; sweep an outer corner to
    rotate). Success thresholds: pos 0.018 m, yaw 0.048*pi
    (aligning.py:198-199).
    """

    R_IN = 0.040     # inner wall half-extent minus rod radius (0.05-0.01)
    R_OUT = 0.062    # outer wall half-extent plus rod radius + margin
    Z_HIGH = 0.25
    Z_LOW = 0.12     # rod tip inside the tray walls

    def __init__(self, rng: np.random.Generator, mode: int | None = None):
        self.mode = int(rng.integers(2)) if mode is None else int(mode)
        self.phase = "enter"
        self.rng = rng

    @staticmethod
    def _yaw(quat):
        w, x, y, z = quat
        return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))

    def act(self, des_pos, tcp_pos, tray_pos, tray_quat, tgt_pos, tgt_quat):
        """All args 3-dim / wxyz quats; returns delta-xyz (|.| <= 0.01)."""
        c = tray_pos[:2]
        yaw = self._yaw(tray_quat)
        tyaw = self._yaw(tgt_quat)
        dp = tgt_pos[:2] - c
        # the tray is 4-fold symmetric in geometry but the env scores the raw
        # quaternion; fold only the 2-fold (pi) symmetry the quat metric
        # cannot distinguish (|dot| in aligning.py:22-36)
        dyaw = _wrap_angle(tyaw - yaw)
        if dyaw > np.pi / 2:
            dyaw -= np.pi
        elif dyaw < -np.pi / 2:
            dyaw += np.pi
        pos_ok = np.linalg.norm(dp) < 0.012
        rot_ok = abs(dyaw) < 0.10

        rad = self.R_IN if self.mode == 0 else self.R_OUT

        if self.phase == "enter":
            # hover over the entry point, then descend
            entry = c if self.mode == 0 else c + np.array([0.0, -0.09])
            hover = np.array([entry[0], entry[1], self.Z_HIGH])
            if np.linalg.norm(des_pos[:2] - entry) > 0.008:
                return _step_toward(des_pos, hover) - des_pos
            if des_pos[2] > self.Z_LOW + 0.004:
                return _step_toward(
                    des_pos, np.array([entry[0], entry[1], self.Z_LOW]),
                    0.008) - des_pos
            self.phase = "work"

        if pos_ok and rot_ok:
            return np.zeros(3)

        if not pos_ok:
            u = dp / (np.linalg.norm(dp) + 1e-9)
            # inside: press the leading inner wall; outside: trail behind
            contact = c + u * rad if self.mode == 0 else c - u * rad
            goal2 = contact + u * 0.012
            nxt = _step_toward(des_pos[:2], goal2, 0.006)
            ahead = nxt - tcp_pos[:2]
            d = np.linalg.norm(ahead)
            if d > 0.035:
                nxt = tcp_pos[:2] + ahead / d * 0.035
            return np.concatenate([nxt - des_pos[:2], [0.0]])

        # rotation: sweep a corner along an arc about the tray center
        sgn = np.sign(dyaw)
        corner_local = np.array([rad, sgn * rad]) / np.sqrt(2) * np.sqrt(2)
        ca, sa = np.cos(yaw), np.sin(yaw)
        Rm = np.array([[ca, -sa], [sa, ca]])
        corner = c + Rm @ corner_local
        lead = min(0.25, abs(dyaw)) * sgn
        cl, sl = np.cos(lead), np.sin(lead)
        Rl = np.array([[cl, -sl], [sl, cl]])
        swept = c + Rl @ (Rm @ (corner_local * 1.05))
        if np.linalg.norm(tcp_pos[:2] - corner) > 0.025:
            nxt = _step_toward(des_pos[:2], corner, 0.006)
        else:
            nxt = _step_toward(des_pos[:2], swept, 0.004)
        ahead = nxt - tcp_pos[:2]
        d = np.linalg.norm(ahead)
        if d > 0.035:
            nxt = tcp_pos[:2] + ahead / d * 0.035
        return np.concatenate([nxt - des_pos[:2], [0.0]])


class StackingExpert:
    """Pick-and-place three cubes onto the target in a chosen order.

    Emits absolute joint setpoints via waypoint IK: per box — hover above,
    align yaw, descend, close, lift, carry above the target, descend to the
    stack level, open, retreat. The gripper command is the absolute width
    (>0.075 = open, stacking.py:334-353). IK targets use the task's fixed
    downward EE orientation rotated by the grasp yaw.
    """

    def __init__(self, rng, order=None, ik_solver=None):
        self.order = list(rng.permutation(3)) if order is None else list(order)
        self.order = [int(i) for i in self.order]
        self.stage = 0         # which box
        self.phase = "hover"
        self.hold = 0
        self._ik = ik_solver   # (pos3, quat4, q0) -> q*
        self.level = 0

    @staticmethod
    def _grasp_quat(yaw):
        """Downward-facing EE (quat [0,1,0,0]) rotated about world z by yaw."""
        h = yaw / 2.0
        # Rz(yaw) * (0,1,0,0)  (wxyz)
        return np.array([0.0, np.cos(h), np.sin(h), 0.0])

    def act(self, des_q, width, box_pos, box_yaw, target_xy):
        """Returns (q_des[7], width_cmd). box_pos [3,3], box_yaw [3]."""
        if self.stage >= 3:
            return des_q, 0.08
        b = self.order[self.stage]
        bp = box_pos[b]
        yaw = _wrap_angle(box_yaw[b])
        # fold square symmetry into [-pi/4, pi/4]; the blue box (0.05 y half-
        # extent) must be gripped across x, so only pi symmetry folds
        if b == 2:
            if yaw > np.pi / 2:
                yaw -= np.pi
            elif yaw < -np.pi / 2:
                yaw += np.pi
        else:
            yaw = _wrap_angle(yaw + np.pi / 4) % (np.pi / 2) - np.pi / 4
        quat = self._grasp_quat(yaw)

        z_grasp = 0.025
        z_stack = 0.018 + 0.062 * self.level
        z_hover = 0.22
        tgt3 = np.array([target_xy[0], target_xy[1], z_stack])

        def goto(pos, q0, speed=0.04, w=0.08):
            q_star = self._ik(pos, quat, q0)
            dq = q_star - q0
            n = np.linalg.norm(dq)
            if n > speed:
                dq = dq / n * speed
            return q0 + dq, w, n < 0.01

        if self.phase == "hover":
            q, w, ok = goto(np.array([bp[0], bp[1], z_hover]), des_q)
            if ok:
                self.phase = "descend"
            return q, w
        if self.phase == "descend":
            q, w, ok = goto(np.array([bp[0], bp[1], z_grasp]), des_q,
                            speed=0.02)
            if ok:
                self.phase = "close"
                self.hold = 0
            return q, w
        if self.phase == "close":
            self.hold += 1
            if self.hold > 12:
                self.phase = "lift"
            return des_q, 0.0
        if self.phase == "lift":
            q, w, ok = goto(np.array([bp[0], bp[1], z_hover]), des_q,
                            speed=0.02, w=0.0)
            if ok:
                self.phase = "carry"
            return q, w
        if self.phase == "carry":
            q, w, ok = goto(np.array([tgt3[0], tgt3[1], z_hover]), des_q,
                            w=0.0)
            if ok:
                self.phase = "place"
            return q, w
        if self.phase == "place":
            q, w, ok = goto(tgt3, des_q, speed=0.015, w=0.0)
            if ok:
                self.phase = "open"
                self.hold = 0
            return q, w
        if self.phase == "open":
            self.hold += 1
            if self.hold > 8:
                self.phase = "retreat"
            return des_q, 0.08
        if self.phase == "retreat":
            q, w, ok = goto(np.array([tgt3[0], tgt3[1], z_hover]), des_q,
                            speed=0.03)
            if ok:
                self.stage += 1
                self.level += 1
                self.phase = "hover"
            return q, w
        return des_q, 0.08
