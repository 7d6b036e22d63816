"""Physics engine vs C-MuJoCo golden trajectories (contact dynamics).

Scenes use the same constants as the reference task scenes: a table-top plane
with solimp/solref from lab_surrounding.xml, 0.05 kg 3 cm boxes from
pushing_objects.py, Newton-solver options from base.xml.
"""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3il_tpu.engine import model as emodel
from d3il_tpu.engine import step as estep
from d3il_tpu.robot.chain import ChainBuilder, HINGE

TABLE_SOLIMP = (0.999, 0.999, 0.001, 0.5, 2.0)
TABLE_SOLREF = (0.002, 1.0)


def dummy_robot():
    """A far-away 1-dof robot so scenes can be 'boxes only'."""
    b = ChainBuilder()
    b.add_body("base", None, pos=(100.0, 100.0, 0.0), joint_type=HINGE,
               mass=1.0, inertia=np.eye(3) * 0.1, joint_range=(-1, 1))
    return b.build()


def make_box_scene(n_boxes=1, solver_iters=40):
    robot = dummy_robot()
    free = [dict(name=f"box{i}", mass=0.05, size=(0.03, 0.03, 0.03))
            for i in range(n_boxes)]
    static = [emodel.Geom(gtype=emodel.PLANE, size=(0, 0, 1), pos=(0, 0, 0),
                          solimp=TABLE_SOLIMP, solref=TABLE_SOLREF, name="table")]
    return emodel.build_scene(robot, [], free, static,
                              collide_robot_static=False,
                              solver_iters=solver_iters,
                              forcerange=np.array([[-100.0, 100.0]]))


def mj_box_model(n_boxes=1):
    boxes = "\n".join(
        f'<body name="box{i}" pos="0 0 0"><freejoint/>'
        f'<geom type="box" size="0.03 0.03 0.03" mass="0.05"/></body>'
        for i in range(n_boxes))
    xml = f"""
<mujoco>
  <option timestep="0.001" cone="elliptic" impratio="3" solver="Newton" tolerance="1e-10"/>
  <worldbody>
    <geom type="plane" size="5 5 1" solimp="0.999 0.999 0.001" solref="0.002 1"/>
    {boxes}
  </worldbody>
</mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    return m, mujoco.MjData(m)


def test_box_drop_and_rest():
    """A box dropped from 5 cm settles at the same height as MuJoCo."""
    scene = make_box_scene()
    step = jax.jit(estep.make_step_fn(scene))
    st = estep.init_state(scene, q=jnp.zeros(1),
                          free_pos=jnp.array([[0.0, 0.0, 0.08]]))
    m, d = mj_box_model()
    d.qpos[:3] = [0, 0, 0.08]
    mujoco.mj_forward(m, d)

    zs_ours, zs_mj = [], []
    for i in range(400):
        st = step(st, jnp.zeros(1))
        mujoco.mj_step(m, d)
        if i % 20 == 0:
            zs_ours.append(float(st.free_pos[0, 2]))
            zs_mj.append(d.qpos[2])
    # settled height ~0.03 (half size) with soft-contact penetration
    assert abs(zs_ours[-1] - zs_mj[-1]) < 2e-3, (zs_ours[-1], zs_mj[-1])
    assert abs(zs_ours[-1] - 0.03) < 5e-3
    # trajectory statistically close during the drop too
    np.testing.assert_allclose(zs_ours, zs_mj, atol=5e-3)


def test_box_slide_friction():
    """A box shoved sideways decelerates by friction like MuJoCo."""
    scene = make_box_scene()
    step = jax.jit(estep.make_step_fn(scene))
    st = estep.init_state(scene, q=jnp.zeros(1),
                          free_pos=jnp.array([[0.0, 0.0, 0.0301]]))
    st = st._replace(free_linvel=jnp.array([[0.5, 0.0, 0.0]]))
    m, d = mj_box_model()
    d.qpos[:3] = [0, 0, 0.0301]
    d.qvel[:3] = [0.5, 0, 0]
    mujoco.mj_forward(m, d)
    for _ in range(500):
        st = step(st, jnp.zeros(1))
        mujoco.mj_step(m, d)
    ours = float(st.free_pos[0, 0])
    mjx = d.qpos[0]
    assert abs(ours - mjx) < 0.01, (ours, mjx)
    assert float(jnp.linalg.norm(st.free_linvel)) < 0.05  # came to rest


def test_box_stack_static():
    """Two stacked boxes stay stacked (stacking-task prerequisite)."""
    scene = make_box_scene(2)
    step = jax.jit(estep.make_step_fn(scene))
    st = estep.init_state(
        scene, q=jnp.zeros(1),
        free_pos=jnp.array([[0.0, 0.0, 0.03], [0.005, 0.0, 0.0905]]))
    for _ in range(600):
        st = step(st, jnp.zeros(1))
    assert abs(float(st.free_pos[1, 2]) - 0.09) < 5e-3
    assert abs(float(st.free_pos[1, 0]) - 0.005) < 5e-3
