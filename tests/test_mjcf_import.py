"""MJCF importer (physics/mjcf_import.py): export -> import roundtrip.

The reference's model pipeline starts from MJCF robot descriptions
(gen_xml.py + MjSpec.compile); ours is RobotSpec-native with an MJCF
exporter for goldens. The importer closes the loop: a robot described in
MJCF lowers to the same Model the native spec does.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.fast  # cold-fast lane: no humanoid-scale compiles

from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf
from learninghumanoidwalking_tpu.physics.mjcf_import import import_mjcf
from learninghumanoidwalking_tpu.physics.spec import lower


def _spec_pair(robot):
    if robot == "jvrc":
        from learninghumanoidwalking_tpu.models.jvrc import jvrc_spec

        spec = jvrc_spec()
        feet = (["L_foot"], ["R_foot"])
    else:
        from learninghumanoidwalking_tpu.models.h1 import h1_spec

        spec = h1_spec()
        feet = (["left_foot"], ["right_foot"])
    xml = export_mjcf(spec)
    imported = import_mjcf(
        xml,
        left_foot_geoms=feet[0],
        right_foot_geoms=feet[1],
        self_collision_pairs=spec.self_collision_pairs,
    )
    return spec, imported


@pytest.mark.parametrize("robot", ["jvrc", "h1"])
def test_roundtrip_lowers_identically(robot):
    spec, imported = _spec_pair(robot)
    a = lower(spec)
    b = lower(imported)
    assert a.nq == b.nq and a.nv == b.nv and a.nu == b.nu and a.nbody == b.nbody
    assert a.body_names == b.body_names
    assert a.ncon == b.ncon
    np.testing.assert_allclose(np.asarray(a.body_mass), np.asarray(b.body_mass), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.body_pos), np.asarray(b.body_pos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.body_ipos), np.asarray(b.body_ipos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.body_inertia), np.asarray(b.body_inertia), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.jnt_axis), np.asarray(b.jnt_axis), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.dof_damping), np.asarray(b.dof_damping), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.dof_armature), np.asarray(b.dof_armature), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.actuator_gear), np.asarray(b.actuator_gear), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.geom_size), np.asarray(b.geom_size), atol=1e-7)
    assert a.foot_geoms == b.foot_geoms


def test_imported_model_steps_identically():
    """Behavioral roundtrip: 50 PD-held substeps from the same state agree."""
    import jax

    from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT
    from learninghumanoidwalking_tpu.physics import engine
    from learninghumanoidwalking_tpu.physics.model import default_dyn_params
    from learninghumanoidwalking_tpu.robots.pd import pd_substeps

    spec, imported = _spec_pair("jvrc")
    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos0 = jnp.asarray(np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose]), jnp.float32)
    kp = jnp.asarray([200, 200, 200, 250, 80, 80] * 2, jnp.float32)
    kd = jnp.asarray([20, 20, 20, 25, 8, 8] * 2, jnp.float32)

    outs = []
    for sp in (spec, imported):
        model = lower(sp)
        params = default_dyn_params(model, kp, kd)
        state = engine.make_state(model, qpos0, jnp.zeros(model.nv))
        state = jax.jit(lambda s: pd_substeps(model, params, s, jnp.asarray(pose), 50, 0.001))(state)
        outs.append(np.asarray(state.qpos))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_parse_defaults_and_euler():
    """Default-class resolution and euler orientation parsing."""
    xml = """
    <mujoco model='t'>
      <compiler angle='degree'/>
      <default>
        <joint damping='0.5' armature='0.02'/>
        <default class='foot'>
          <geom friction='0.9 0.005 0.0001' type='box'/>
        </default>
      </default>
      <worldbody>
        <body name='base' pos='0 0 1'>
          <freejoint/>
          <inertial pos='0 0 0' mass='2.0' diaginertia='0.1 0.1 0.1'/>
          <body name='link' pos='0 0 -0.2' euler='0 90 0'>
            <joint name='j1' type='hinge' axis='0 1 0'/>
            <inertial pos='0 0 -0.1' mass='1.0' diaginertia='0.01 0.01 0.01'/>
            <geom name='foot_box' class='foot' size='0.1 0.05 0.02'/>
          </body>
        </body>
      </worldbody>
      <actuator><motor joint='j1' gear='5'/></actuator>
    </mujoco>
    """
    spec = import_mjcf(xml, left_foot_geoms=["foot_box"])
    link = spec.bodies[1]
    assert link.joint.damping == 0.5 and link.joint.armature == 0.02
    # euler 0 90 0 -> quat for 90 deg about y
    np.testing.assert_allclose(link.quat, [np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0], atol=1e-6)
    g = link.geoms[0]
    assert g.gtype == "box" and g.contact == "foot" and abs(g.friction - 0.9) < 1e-9
    assert spec.actuators[0].gear == 5.0
    model = lower(spec)
    assert model.nu == 1 and model.nq == 8


def test_multi_axis_euler_matches_mujoco():
    """MuJoCo's lowercase eulerseq is INTRINSIC: euler='90 45 30' must compose
    q = qx ⊗ qy ⊗ qz. Asserted against mujoco's own compiler."""
    mujoco = pytest.importorskip("mujoco")
    xml = """
    <mujoco model='e'>
      <compiler angle='degree'/>
      <worldbody>
        <body name='b' pos='0 0 1' euler='90 45 30'>
          <inertial pos='0 0 0' mass='1' diaginertia='0.1 0.1 0.1'/>
          <geom type='box' size='0.1 0.1 0.1'/>
        </body>
      </worldbody>
    </mujoco>
    """
    m = mujoco.MjModel.from_xml_string(xml)
    spec = import_mjcf(xml)
    np.testing.assert_allclose(spec.bodies[0].quat, m.body_quat[1], atol=1e-6)


def test_ctrlrange_autolimits():
    """MuJoCo autolimits (default since 2.2): ctrlrange alone is binding;
    ctrllimited='false' disables it; <compiler autolimits='false'> restores
    the explicit-attribute behavior."""
    tpl = """
    <mujoco model='a'>
      <compiler angle='degree'{auto}/>
      <worldbody>
        <body name='b' pos='0 0 1'>
          <joint name='j' type='hinge' axis='0 0 1'/>
          <inertial pos='0 0 0' mass='1' diaginertia='0.1 0.1 0.1'/>
          <geom type='box' size='0.1 0.1 0.1'/>
        </body>
      </worldbody>
      <actuator><motor joint='j' gear='2'{lim} ctrlrange='-1 1'/></actuator>
    </mujoco>
    """
    # modern MJCF: no ctrllimited attribute, range still binds
    s = import_mjcf(tpl.format(auto="", lim=""))
    assert s.actuators[0].ctrlrange == (-1.0, 1.0)
    # explicit off
    s = import_mjcf(tpl.format(auto="", lim=" ctrllimited='false'"))
    assert s.actuators[0].ctrlrange is None
    # autolimits off: range needs ctrllimited='true'
    s = import_mjcf(tpl.format(auto=" autolimits='false'", lim=""))
    assert s.actuators[0].ctrlrange is None
    s = import_mjcf(tpl.format(auto=" autolimits='false'", lim=" ctrllimited='true'"))
    assert s.actuators[0].ctrlrange == (-1.0, 1.0)
