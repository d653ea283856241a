"""RobotInterface-surface contract tests (physics/interface.py vs
/root/reference/envs/common/robot_interface.py's accessor inventory)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.physics import interface as itf


@pytest.fixture(scope="module")
def jvrc_state():
    env = make_env("jvrc_walk")
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # a few steps so contacts and velocities are non-trivial
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_size))
    return env, state


def test_name_lookups(jvrc_state):
    env, _ = jvrc_state
    m = env.model
    jname = itf.actuated_joint_names(m)[0]
    bi = itf.jnt_id_by_name(m, jname)
    assert m.joint_names[bi] == jname
    assert itf.jnt_qposadr_by_name(m, jname) == m.body_qpos_adr[bi]
    assert itf.jnt_qveladr_by_name(m, jname) == m.body_dof_adr[bi]
    assert len(itf.motor_names(m)) == m.nu
    assert len(itf.motor_qposadr(m)) == m.nu
    assert itf.gear_ratios(m).shape == (m.nu,)
    assert itf.actuator_ctrl_range(m).shape == (m.nu, 2)


def test_state_accessors(jvrc_state):
    env, state = jvrc_state
    m, ph = env.model, state.physics
    assert itf.qpos(ph).shape == (m.nq,)
    assert itf.qvel(ph).shape == (m.nv,)
    assert itf.qacc(ph).shape == (m.nv,)
    root = itf.root_body_pos(m, ph)
    np.testing.assert_allclose(np.asarray(root), np.asarray(ph.xpos[1]))
    v, w = itf.root_body_vel(m, ph)
    assert v.shape == (3,) and w.shape == (3,)
    xp = itf.object_xpos_by_name(m, ph, m.body_names[2])
    assert xp.shape == (3,)
    aff = np.asarray(itf.object_affine_by_name(m, ph, m.body_names[2]))
    assert aff.shape == (4, 4)
    np.testing.assert_allclose(aff[3], [0, 0, 0, 1])
    # rotation block is orthonormal
    np.testing.assert_allclose(aff[:3, :3] @ aff[:3, :3].T, np.eye(3), atol=1e-5)


def test_contact_accessors(jvrc_state):
    env, state = jvrc_state
    m, ph = env.model, state.physics
    lm = np.asarray(itf.lfoot_floor_contacts(m, ph))
    rm = np.asarray(itf.rfoot_floor_contacts(m, ph))
    assert lm.shape == rm.shape == (m.ncon,)
    # disjoint slot sets
    assert np.all(lm * rm == 0)
    grf_total = float(itf.lfoot_grf(m, ph)) + float(itf.rfoot_grf(m, ph))
    np.testing.assert_allclose(grf_total, float(itf.interaction_force(m, ph)), rtol=1e-5)
    # standing robot carries ~its weight (|f| includes friction components,
    # so allow a generous band around m*g)
    mg = itf.total_mass(m) * 9.81
    assert 0.3 * mg < grf_total < 3.0 * mg, (grf_total, mg)
    assert bool(itf.check_lfoot_floor_collision(m, ph))
    assert bool(itf.check_rfoot_floor_collision(m, ph))
    assert not bool(itf.check_bad_collisions(m, ph))
    lp = np.asarray(itf.lfoot_body_pos(m, ph))
    rp = np.asarray(itf.rfoot_body_pos(m, ph))
    assert lp[1] > rp[1]  # left foot on +y side
    v, w = itf.lfoot_body_vel(m, ph)
    assert np.all(np.isfinite(np.asarray(v)))


def test_momentum_accessors(jvrc_state):
    env, state = jvrc_state
    m, ph = env.model, state.physics
    com = np.asarray(itf.robot_com(m, ph))
    assert 0.5 < com[2] < 1.1
    lin = np.asarray(itf.body_linear_momentum(m, ph))
    ang = np.asarray(itf.body_angular_momentum(m, ph))
    assert lin.shape == (3,) and ang.shape == (3,)
    assert np.all(np.isfinite(lin)) and np.all(np.isfinite(ang))
