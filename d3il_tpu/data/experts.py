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
