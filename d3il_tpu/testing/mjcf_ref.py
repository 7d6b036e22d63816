"""Build host-side MuJoCo golden models from d3il_tpu Chain descriptions.

Test-only helper: serializes a `Chain` (plus optional free bodies / geoms)
into an MJCF string and compiles it with the installed C MuJoCo, so unit tests
can compare the JAX kinematics/dynamics/contacts against MuJoCo's reference
implementation without depending on any external files.
"""
from __future__ import annotations

import numpy as np

from d3il_tpu.robot.chain import Chain, FIXED, HINGE, SLIDE


def _fmt(a):
    return " ".join(repr(float(x)) for x in np.atleast_1d(np.asarray(a)))


def chain_to_mjcf(chain: Chain, gravity=(0, 0, -9.81), timestep=1e-3,
                  extra_worldbody: str = "", option_extra: str = "",
                  actuators: bool = False) -> str:
    """Serialize the chain into a standalone MJCF model string."""
    children = {}
    for i, p in enumerate(chain.parent):
        children.setdefault(int(p), []).append(i)

    def body_xml(i, indent):
        pad = "  " * indent
        lines = [f'{pad}<body name="{chain.names[i]}" pos="{_fmt(chain.body_pos[i])}" '
                 f'quat="{_fmt(chain.body_quat[i])}">']
        m = chain.mass[i]
        if m > 0:
            # full inertia via fullinertia attribute (about com, body frame)
            I = chain.inertia[i]
            full = [I[0, 0], I[1, 1], I[2, 2], I[0, 1], I[0, 2], I[1, 2]]
            lines.append(
                f'{pad}  <inertial pos="{_fmt(chain.com[i])}" mass="{float(m)!r}" '
                f'fullinertia="{_fmt(full)}"/>')
        jt = int(chain.joint_type[i])
        if jt != FIXED:
            kind = "hinge" if jt == HINGE else "slide"
            d = chain.body_dof[i]
            rng = chain.joint_range[d]
            limited = "true" if rng[1] - rng[0] < 1e8 else "false"
            rng_attr = f'range="{_fmt(rng)}" ' if limited == "true" else ""
            lines.append(
                f'{pad}  <joint name="j{d}" type="{kind}" axis="{_fmt(chain.joint_axis[i])}" '
                f'pos="{_fmt(chain.joint_pos[i])}" limited="{limited}" {rng_attr}'
                f'damping="{float(chain.joint_damping[d])!r}"/>')
        for c in children.get(i, []):
            lines.extend(body_xml(c, indent + 1))
        lines.append(f"{pad}</body>")
        return lines

    bodies = []
    for root in children.get(-1, []):
        bodies.extend(body_xml(root, 3))
    act = ""
    if actuators:
        motors = "\n".join(
            f'    <motor joint="j{d}"/>' for d in range(chain.nv))
        act = f"  <actuator>\n{motors}\n  </actuator>\n"
    return f"""
<mujoco model="golden">
  <compiler angle="radian"/>
  <option gravity="{_fmt(gravity)}" timestep="{float(timestep)!r}" {option_extra}/>
  <worldbody>
{chr(10).join(bodies)}
{extra_worldbody}
  </worldbody>
{act}
</mujoco>
"""
