"""In-sim channel logger: the reference's LoggerBase/RobotLogger/ObjectLogger
(d3il_sim/core/logger.py:75-170,171-718,719-903) rebuilt TPU-first.

The reference loggers are imperative per-step recorders: ``start_logging()``
resets growable Python lists, ``log_data()`` appends the current value of
every selected channel (with an optional log interval for downsampling), and
``stop_logging()`` freezes them into numpy arrays for pickling/plotting.
Growable host lists cannot live inside a jitted rollout, so the TPU-native
form is:

  * a ``Channel`` declares a name and a pure ``extract(state) -> array``
    (the counterpart of RobotPlotFlags/ObjectPlotFlags selections);
  * ``make_logger`` turns a channel list into ``(init, record, export)``:
    ``init()`` preallocates device buffers [T, ...] per channel,
    ``record(bufs, t, state)`` writes one step functionally (usable inside
    ``lax.scan`` — it's a pytree update, no host sync), honoring the
    ``interval`` downsampling the reference's ``_check_log_interval`` does,
    and ``export(bufs, length)`` trims to the episode length and returns the
    nested ``{group: {field: np.ndarray}}`` dict, i.e. exactly the episode
    pickle schema tools/gen_demos.py writes;
  * ``plot`` renders per-channel line plots like LoggerBase.plot, headless.

Because ``record`` is functional, one logger instance serves a whole batched
rollout: vmap it alongside the env step and every lane gets its own buffers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Channel:
    """One logged quantity: dotted name 'group.field' + pure extractor."""
    name: str
    extract: Callable[[Any], jax.Array]


def robot_channels(tcp_pose_fn) -> list[Channel]:
    """The RobotLogger standard set (logger.py:171-310) for a scene state:
    joint pos/vel, cartesian pos + orientation, gripper width."""
    return [
        Channel("robot.j_pos", lambda s: s.q[:7]),
        Channel("robot.j_vel", lambda s: s.qd[:7]),
        Channel("robot.c_pos", lambda s: tcp_pose_fn(s)[0]),
        Channel("robot.c_quat", lambda s: tcp_pose_fn(s)[1]),
        Channel("robot.gripper_width", lambda s: s.q[7] + s.q[8]),
    ]


def object_channels(names: Sequence[str]) -> list[Channel]:
    """ObjectLogger POSITION|ORIENTATION per free body (logger.py:759-778)."""
    out = []
    for i, nm in enumerate(names):
        out.append(Channel(f"{nm}.pos", lambda s, i=i: s.free_pos[i]))
        out.append(Channel(f"{nm}.quat", lambda s, i=i: s.free_quat[i]))
    return out


def make_logger(channels: Sequence[Channel], max_steps: int,
                interval: int = 1, example_state=None):
    """Build (init, record, export) for a channel list.

    interval: record every k-th call (LoggerBase._check_log_interval's
    downsampling). record() is pure: returns updated buffers, usable as scan
    carry state. Buffer slots beyond the episode length stay zero."""
    if example_state is not None:
        shapes = [jnp.shape(jnp.asarray(c.extract(example_state)))
                  for c in channels]
    else:
        shapes = None

    n_slots = -(-max_steps // interval)

    def init(state=None):
        shp = shapes
        if shp is None:
            if state is None:
                raise ValueError("need example_state or state")
            shp = [jnp.shape(jnp.asarray(c.extract(state)))
                   for c in channels]
        return tuple(jnp.zeros((n_slots,) + s, jnp.float32) for s in shp)

    def record(bufs, t, state):
        slot = t // interval
        take = (t % interval) == 0
        return tuple(
            jnp.where(take,
                      buf.at[slot].set(jnp.asarray(c.extract(state),
                                                   jnp.float32)),
                      buf)
            for buf, c in zip(bufs, channels))

    def export(bufs, length=None):
        L = n_slots if length is None else -(-int(length) // interval)
        out: dict[str, dict[str, np.ndarray]] = {}
        for c, buf in zip(channels, bufs):
            group, _, field = c.name.partition(".")
            out.setdefault(group, {})[field or "value"] = \
                np.asarray(buf[:L])
        return out

    return init, record, export


def plot(log: dict, path: str, groups: Sequence[str] | None = None):
    """Per-channel line plots (LoggerBase.plot equivalent, headless PNG)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = list(log.keys()) if groups is None else list(groups)
    rows = sum(len(log[g]) for g in groups)
    fig, axes = plt.subplots(rows, 1, figsize=(8, 2.2 * rows), squeeze=False)
    r = 0
    for g in groups:
        for field, arr in log[g].items():
            ax = axes[r, 0]
            a = np.asarray(arr)
            ax.plot(a.reshape(a.shape[0], -1))
            ax.set_ylabel(f"{g}.{field}", fontsize=8)
            r += 1
    axes[-1, 0].set_xlabel("control step")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
