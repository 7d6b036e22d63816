"""Joint-space tracking controllers (PD + model-based feedforward), jitted.

Functional equivalents of the reference's per-physics-step joint controllers
(d3il_sim/controllers/Controller.py):

  * `pd_accel`          — JointPDController.getControl (Controller.py:164-185)
  * `feedforward_torque`— ModelBasedFeedforwardController.getControl
                          (Controller.py:247-273): PD acceleration plus
                          M(q_des) qdd_des + C(q_des, qd_des) computed on the
                          URDF control model.

The default setpoint of the reference JointPDController is
[0, 0, 0, -1.562, 0, 1.914, 0] (Controller.py:160).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from d3il_tpu.control.gains import JointPDGains
from d3il_tpu.robot import chain as chain_mod

DEFAULT_SETPOINT = np.array([0.0, 0.0, 0.0, -1.562, 0.0, 1.914, 0.0])


def pd_accel(gains: JointPDGains, q_des, qd_des, q, qd):
    p = jnp.asarray(gains.pgain, q.dtype)
    d = jnp.asarray(gains.dgain, q.dtype)
    return p * (q_des - q) + d * (qd_des - qd)


def model_feedforward(ctrl_chain, q_des, qd_des, qdd_des):
    """M(q_des) qdd_des + C(q_des, qd_des) — the model-based part of the
    feedforward (Controller.py:261-266). Depends only on the desired
    trajectory, so callers batch it over whole substep windows outside the
    physics loop. One chain.dynamics call yields both M and the Coriolis
    term (= bias with gravity off)."""
    _, M, cor = chain_mod.dynamics(ctrl_chain, q_des, qd_des,
                                   gravity=(0.0, 0.0, 0.0))
    return M @ qdd_des + cor


def feedforward_torque(ctrl_chain, gains: JointPDGains, q_des, qd_des, qdd_des,
                       q, qd):
    """PD + model feedforward on the *desired* trajectory (Controller.py:261-266)."""
    return (pd_accel(gains, q_des, qd_des, q, qd)
            + model_feedforward(ctrl_chain, q_des, qd_des, qdd_des))
