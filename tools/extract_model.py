"""Extract Franka-Panda model constants from the reference model files.

Reads the reference's URDF (the controller-side kinematics/dynamics model,
reference: environments/d3il/d3il_sim/core/Model.py uses
models/common/robots/panda_arm_hand_pinocchio.urdf) and the MJCF robot
descriptions (models/mj/robot/panda_rod_invisible.xml and panda.xml, the
simulation-side model), and emits a generated Python module of plain numeric
constants (d3il_tpu/robot/_panda_constants.py).

This is a build-time tool: the emitted module makes d3il_tpu fully standalone.
Run:  python tools/extract_model.py [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import math
import os
import pprint
import xml.etree.ElementTree as ET


def _floats(s, default=None):
    if s is None:
        return default
    return [float(x) for x in s.replace(",", " ").split()]


def rpy_to_quat(rpy):
    """URDF rpy (extrinsic x-y-z) -> wxyz quaternion."""
    r, p, y = rpy
    cr, sr = math.cos(r / 2), math.sin(r / 2)
    cp, sp = math.cos(p / 2), math.sin(p / 2)
    cy, sy = math.cos(y / 2), math.sin(y / 2)
    return [
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ]


def parse_urdf(path):
    root = ET.parse(path).getroot()
    links, joints = {}, []
    for link in root.findall("link"):
        name = link.get("name")
        inertial = link.find("inertial")
        entry = {"mass": 0.0, "com": [0.0, 0.0, 0.0], "inertia": [0.0] * 6,
                 "i_rpy": [0.0, 0.0, 0.0]}
        if inertial is not None:
            origin = inertial.find("origin")
            if origin is not None:
                entry["com"] = _floats(origin.get("xyz"), [0, 0, 0])
                entry["i_rpy"] = _floats(origin.get("rpy"), [0, 0, 0])
            entry["mass"] = float(inertial.find("mass").get("value"))
            it = inertial.find("inertia")
            entry["inertia"] = [float(it.get(k)) for k in
                                ("ixx", "iyy", "izz", "ixy", "ixz", "iyz")]
        links[name] = entry
    for joint in root.findall("joint"):
        origin = joint.find("origin")
        axis = joint.find("axis")
        limit = joint.find("limit")
        joints.append({
            "name": joint.get("name"),
            "type": joint.get("type"),
            "parent": joint.find("parent").get("link"),
            "child": joint.find("child").get("link"),
            "xyz": _floats(origin.get("xyz"), [0, 0, 0]) if origin is not None else [0, 0, 0],
            "rpy": _floats(origin.get("rpy"), [0, 0, 0]) if origin is not None else [0, 0, 0],
            "axis": _floats(axis.get("xyz"), [0, 0, 1]) if axis is not None else [0, 0, 1],
            "lower": float(limit.get("lower")) if limit is not None and limit.get("lower") else None,
            "upper": float(limit.get("upper")) if limit is not None and limit.get("upper") else None,
        })
    return links, joints


def parse_mjcf_robot(path):
    """Walk the MJCF body tree, collecting frame/inertial/joint/geom data."""
    root = ET.parse(path).getroot()

    # default classes (for joint damping etc.)
    class_defaults = {}
    for dflt in root.iter("default"):
        cls = dflt.get("class")
        if cls is None:
            continue
        jd = dflt.find("joint")
        gd = dflt.find("geom")
        class_defaults[cls] = {
            "joint": dict(jd.attrib) if jd is not None else {},
            "geom": dict(gd.attrib) if gd is not None else {},
        }

    bodies = []

    def walk(body_el, parent_name, childclass=None):
        name = body_el.get("name")
        cc = body_el.get("childclass", childclass)
        entry = {
            "name": name,
            "parent": parent_name,
            "pos": _floats(body_el.get("pos"), [0, 0, 0]),
            "quat": _floats(body_el.get("quat"), [1, 0, 0, 0]),
            "inertial": None,
            "joint": None,
            "geoms": [],
        }
        inert = body_el.find("inertial")
        if inert is not None:
            entry["inertial"] = {
                "pos": _floats(inert.get("pos"), [0, 0, 0]),
                "quat": _floats(inert.get("quat"), [1, 0, 0, 0]),
                "mass": float(inert.get("mass")),
                "diaginertia": _floats(inert.get("diaginertia"), [0, 0, 0]),
            }
        jnt = body_el.find("joint")
        if jnt is not None:
            jattrs = dict(class_defaults.get(cc, {}).get("joint", {}))
            jattrs.update(jnt.attrib)
            entry["joint"] = {
                "name": jattrs.get("name"),
                "type": jattrs.get("type", "hinge"),
                "axis": _floats(jattrs.get("axis"), [0, 0, 1]),
                "pos": _floats(jattrs.get("pos"), [0, 0, 0]),
                "range": _floats(jattrs.get("range")),
                "damping": float(jattrs.get("damping", 0.0)),
            }
        for geom in body_el.findall("geom"):
            gattrs = dict(class_defaults.get(cc, {}).get("geom", {}))
            gattrs.update(geom.attrib)
            if gattrs.get("type", "sphere") == "mesh":
                continue  # mesh visuals/colliders: not extracted (rod/fingertips are primitives)
            entry["geoms"].append({
                "name": gattrs.get("name"),
                "type": gattrs.get("type", "sphere"),
                "size": _floats(gattrs.get("size"), [0.0]),
                "pos": _floats(gattrs.get("pos"), [0, 0, 0]),
                "quat": _floats(gattrs.get("quat"), [1, 0, 0, 0]),
                "contype": int(gattrs.get("contype", 1)),
                "conaffinity": int(gattrs.get("conaffinity", 1)),
                "condim": int(gattrs.get("condim", 3)),
                "friction": _floats(gattrs.get("friction"), [1.0, 0.005, 0.0001]),
                "solref": _floats(gattrs.get("solref"), [0.02, 1.0]),
                "solimp": _floats(gattrs.get("solimp"), [0.9, 0.95, 0.001]),
                "margin": float(gattrs.get("margin", 0.0)),
            })
        bodies.append(entry)
        for child in body_el.findall("body"):
            walk(child, name, cc)

    worldbody = root.find("worldbody")
    for b in worldbody.findall("body"):
        walk(b, "world")

    actuators = []
    act_root = root.find("actuator")
    if act_root is not None:
        for m in act_root.findall("motor"):
            actuators.append({
                "name": m.get("name"),
                "joint": m.get("joint"),
                "forcerange": _floats(m.get("forcerange"), [-1e9, 1e9]),
            })
    return {"bodies": bodies, "actuators": actuators}


HEADER = '''"""GENERATED FILE — do not edit by hand.

Numeric Franka-Panda model constants extracted by tools/extract_model.py from
the reference model descriptions:
  - URDF (controller-side model, used by the IK/impedance controllers;
    reference: d3il_sim/core/Model.py:26 loads panda_arm_hand_pinocchio.urdf)
  - MJCF robots (simulation-side model; reference:
    models/mj/robot/panda_rod_invisible.xml and panda.xml)
"""

'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "d3il_tpu", "robot", "_panda_constants.py"))
    args = ap.parse_args()

    models = os.path.join(args.reference, "environments/d3il/models")
    urdf_links, urdf_joints = parse_urdf(
        os.path.join(models, "common/robots/panda_arm_hand_pinocchio.urdf"))
    mjcf_rod = parse_mjcf_robot(os.path.join(models, "mj/robot/panda_rod_invisible.xml"))
    mjcf_gripper = parse_mjcf_robot(os.path.join(models, "mj/robot/panda.xml"))

    pp = pprint.PrettyPrinter(indent=1, width=100, sort_dicts=False)
    with open(os.path.abspath(args.out), "w") as f:
        f.write(HEADER)
        f.write("URDF_LINKS = " + pp.pformat(urdf_links) + "\n\n")
        f.write("URDF_JOINTS = " + pp.pformat(urdf_joints) + "\n\n")
        f.write("MJCF_PANDA_ROD = " + pp.pformat(mjcf_rod) + "\n\n")
        f.write("MJCF_PANDA_GRIPPER = " + pp.pformat(mjcf_gripper) + "\n")
    print("wrote", os.path.abspath(args.out))


if __name__ == "__main__":
    main()
