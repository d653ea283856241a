"""Physics engine unit tests: kinematics, dynamics, integration sanity.

Mirrors the role of the reference's engine-trust tests (it trusts MuJoCo;
we must earn the same trust for our engine). Golden comparisons against the
real MuJoCo binary live in test_mujoco_golden.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast  # cold-fast lane: no humanoid-scale compiles

from learninghumanoidwalking_tpu.models.cartpole import cartpole_spec
from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.model import default_dyn_params
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.utils import maths


@pytest.fixture(scope="module")
def cartpole():
    model = lower(cartpole_spec())
    params = default_dyn_params(model, kp=jnp.array([100.0]), kd=jnp.array([10.0]))
    return model, params


def test_lowering_shapes(cartpole):
    model, _ = cartpole
    assert model.nq == 2
    assert model.nv == 2
    assert model.nu == 1
    assert model.nbody == 3
    # cart box: 0.4 x 0.2 x 0.1 m at density 1000 -> 8 kg
    np.testing.assert_allclose(model.body_mass[1], 8.0, rtol=1e-5)
    # pole capsule r=0.045 l=0.6: ~4.2 kg
    np.testing.assert_allclose(model.body_mass[2], 4.199, rtol=1e-2)


def test_fk_pole_angle(cartpole):
    model, _ = cartpole
    qpos = jnp.array([0.3, jnp.pi / 2])
    xpos, xquat = engine.fk(model, qpos)
    np.testing.assert_allclose(xpos[1], [0.3, 0.0, 0.0], atol=1e-6)
    # pole body frame coincides with cart frame origin
    np.testing.assert_allclose(xpos[2], [0.3, 0.0, 0.0], atol=1e-6)
    # rotation of pi/2 about y: +z axis maps to +x
    tip_local = jnp.array([0.0, 0.0, 0.6])
    tip_world = xpos[2] + maths.quat_rotate(xquat[2], tip_local)
    np.testing.assert_allclose(tip_world, [0.9, 0.0, 0.0], atol=1e-5)


def test_pendulum_gravity_accel(cartpole):
    """Horizontal pole should experience qacc = -m g l_com / I about the hinge."""
    model, params = cartpole
    state = engine.make_state(model, jnp.array([0.0, jnp.pi / 2]), jnp.zeros(2))
    out = engine.forward(model, params, state, dt=0.005)
    # analytic: pole mass ~4.199, com z offset ~0.3 (local), I about hinge
    m_pole = float(model.body_mass[2])
    com = float(model.body_ipos[2][2])
    i_com = float(model.body_inertia[2][1])  # perpendicular axis, at com
    # At theta=pi/2 the pole points along +x; gravity torque about the +y
    # hinge is +m*g*com (rotates the pole further down, increasing theta).
    # The cart-pole coupling term m*com*cos(theta) vanishes at pi/2, so the
    # 1-dof analytic solution is exact. The engine integrates joint damping
    # implicitly, dividing by (I + dt*damping).
    i_hinge = i_com + m_pole * com**2 + 0.005 * 0.05
    expected = m_pole * 9.81 * com / i_hinge
    np.testing.assert_allclose(float(out.qacc[1]), expected, rtol=1e-4)
    np.testing.assert_allclose(float(out.qacc[0]), 0.0, atol=1e-4)


def test_energy_conservation_pendulum():
    """Undamped pendulum swing conserves energy under semi-implicit Euler."""
    spec = cartpole_spec()
    spec.bodies[0].joint.damping = 0.0
    spec.bodies[1].joint.damping = 0.0
    model = lower(spec)
    params = default_dyn_params(model, kp=jnp.array([100.0]), kd=jnp.array([10.0]))
    dt = 0.001

    def energy(state):
        import jax as _jax
        from learninghumanoidwalking_tpu.utils import maths

        xpos, xquat = engine.fk(model, state.qpos)
        rmats = _jax.vmap(maths.quat_to_mat)(xquat)
        s = engine.motion_subspace(model, xpos, rmats)
        jac = engine.body_jacobians(model, s)
        inertias = engine.spatial_inertias(model, params, xpos, xquat, rmats)
        m_mat = engine.mass_matrix(model, jac, inertias)
        ke = 0.5 * state.qvel @ m_mat @ state.qvel
        coms = xpos + jnp.einsum("bij,bj->bi", rmats, model.body_ipos)
        pe = sum(float(model.body_mass[i]) * 9.81 * float(coms[i][2]) for i in range(1, model.nbody))
        return float(ke + pe)

    state = engine.make_state(model, jnp.array([0.0, 2.0]), jnp.zeros(2))
    e0 = energy(state)

    @jax.jit
    def rollout(state):
        def body(state, _):
            return engine.step(model, params, state, jnp.zeros(1), dt), None

        return jax.lax.scan(body, state, None, length=1000)[0]

    state = rollout(state)
    e1 = energy(state)
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05


def test_step_is_jittable_and_vmappable(cartpole):
    model, params = cartpole
    batch = 32
    qpos = jnp.tile(jnp.array([0.0, 1.0]), (batch, 1))
    qvel = jnp.zeros((batch, 2))
    states = jax.vmap(lambda p, v: engine.make_state(model, p, v))(qpos, qvel)

    @jax.jit
    def stepfn(states):
        return jax.vmap(lambda s: engine.step(model, params, s, jnp.zeros(1), 0.005))(states)

    out = stepfn(states)
    assert out.qpos.shape == (batch, 2)
    assert bool(jnp.all(jnp.isfinite(out.qpos)))


def test_pd_holds_target(cartpole):
    """PD control on the slider should drive the cart to the target."""
    model, params = cartpole
    state = engine.make_state(model, jnp.zeros(2), jnp.zeros(2))
    target = 0.5
    dt = 0.005

    @jax.jit
    def run(state):
        def body(state, _):
            q = state.qpos[0]
            v = state.qvel[0]
            tau = params.kp * (target - q) + params.kd * (0.0 - v)
            # reference cartpole applies joint-level PD torque directly as ctrl
            # (actuator force = gear * ctrl), cartpole_env.py:42-52
            return engine.step(model, params, state, tau / model.actuator_gear, dt), None

        return jax.lax.scan(body, state, None, length=600)[0]

    out = run(state)
    assert abs(float(out.qpos[0]) - target) < 0.05
