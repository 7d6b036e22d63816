"""Gripper finger force law (reference core/Robots.py:441-476 fing_ctrl_step).

Branchless re-expression of the reference's finger controller: a symmetric
centering force plus either (a) a grasp force / closing-velocity servo when
the fingers are far above the commanded width, or (b) a clipped PD toward the
commanded width.
"""
from __future__ import annotations

import jax.numpy as jnp

PGAIN = 500.0
DGAIN = 10.0


def finger_forces(fing_pos, fing_vel, set_width, grasp_flag):
    """Per-finger forces [2].

    fing_pos/fing_vel: [2]; set_width: scalar commanded width per finger;
    grasp_flag: bool/0-1 scalar — when set and fingers are wide of the target,
    apply a constant -20 N grasp force (Robots.py:466-469).
    """
    dtype = fing_pos.dtype
    mean_pos = jnp.mean(fing_pos)
    force = PGAIN * (mean_pos - fing_pos)  # enforce symmetric fingers

    wide = (mean_pos - set_width) > 0.005
    # -20 N grasp force with a closing-speed brake: the raw constant force on
    # the 22 g fingers accelerates them at ~900 m/s^2 across any momentary
    # separation, so a micro-slip mid-hold became a 2 m/s hammer strike that
    # ejected the grasped box (energy the reference sim dissipates through
    # condim-4 torsional friction, which keeps the box from twisting loose in
    # the first place). The brake leaves the static squeeze at the reference
    # -20 N and only engages beyond the close-servo's own 0.2 m/s target.
    brake = 200.0 * jnp.maximum(-(fing_vel + 0.2), 0.0)
    grasp = jnp.minimum(-20.0 + brake, 0.0)
    close_servo = DGAIN * (-0.2 - fing_vel)
    pd = jnp.clip(PGAIN * (set_width - fing_pos) - DGAIN * fing_vel, -5.0, 5.0)

    branch_wide = jnp.where(grasp_flag, grasp, close_servo)
    force2 = jnp.where(wide, branch_wide, pd)
    return force + force2
