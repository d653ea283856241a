"""Motor-dynamics hook (robots/motor.py) contract tests.

Mirrors /root/reference/envs/common/robot_interface.py:25-58 (history
warmup/passthrough, 2-substep append cadence) and :510-533 (the hook changes
the applied torque once engaged).
"""

import numpy as np
import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.robots.motor import (
    HIST_LEN,
    init_motor_params,
    init_motor_state,
    motor_forward,
    motor_substep_torque,
)


def test_warmup_passthrough_and_cadence():
    nu = 4
    params = init_motor_params(jax.random.PRNGKey(0), nu)
    state = init_motor_state(nu)
    qdot = jnp.ones(nu)
    # warmup: command passes through unchanged while the buffer fills
    for i in range(HIST_LEN):
        cmd = jnp.full((nu,), float(i))
        tau, state = motor_substep_torque(params, state, qdot, cmd)
        np.testing.assert_array_equal(np.asarray(tau), np.asarray(cmd))
    assert int(state.count) == HIST_LEN
    # buffer holds the last HIST_LEN commands in order
    np.testing.assert_array_equal(np.asarray(state.ctau_hist[:, 0]), np.arange(HIST_LEN))

    # post-warmup: count=25 (odd cadence, 25 % 2 == 1 -> no append)
    tau_odd, state2 = motor_substep_torque(params, state, qdot, jnp.full((nu,), 99.0))
    np.testing.assert_array_equal(np.asarray(state2.ctau_hist), np.asarray(state.ctau_hist))
    # count=26 -> append happens
    tau_even, state3 = motor_substep_torque(params, state2, qdot, jnp.full((nu,), 99.0))
    assert float(state3.ctau_hist[-1, 0]) == 99.0


def test_hook_changes_applied_torque():
    """Once engaged, the net output differs from the raw command (the whole
    point of the hook), but stays near it at init (identity-skip init)."""
    nu = 3
    params = init_motor_params(jax.random.PRNGKey(1), nu)
    qdot_hist = jnp.asarray(np.random.default_rng(0).normal(size=(HIST_LEN, nu)), jnp.float32)
    ctau_hist = jnp.asarray(np.random.default_rng(1).normal(size=(HIST_LEN, nu)), jnp.float32)
    out = motor_forward(params, qdot_hist, ctau_hist)
    cmd = ctau_hist[-1]
    assert not np.allclose(np.asarray(out), np.asarray(cmd)), "hook must modify torque"
    assert np.abs(np.asarray(out) - np.asarray(cmd)).max() < 0.5, "init must stay near identity"


def test_env_with_motor_hook_runs_and_differs():
    """jvrc_walk with motor_dynamics enabled: steps finitely, and the
    physics trajectory diverges from the hook-free env after the 25-substep
    warmup (first control step is identical by the passthrough contract)."""
    from learninghumanoidwalking_tpu.envs import make_env

    env0 = make_env("jvrc_walk")
    env1 = make_env("jvrc_walk")
    env1.motor_enabled = True
    from learninghumanoidwalking_tpu.robots.motor import init_motor_params as imp

    env1.motor_params = imp(jax.random.PRNGKey(0), env1.model.nu)

    key = jax.random.PRNGKey(0)
    s0 = jax.jit(env0.reset)(key)
    s1 = jax.jit(env1.reset)(key)
    act = jnp.zeros(env0.action_size)
    step0 = jax.jit(env0.step)
    step1 = jax.jit(env1.step)

    # first control step: warmup passthrough -> identical physics
    s0 = step0(s0, act)
    s1 = step1(s1, act)
    np.testing.assert_allclose(np.asarray(s0.physics.qpos), np.asarray(s1.physics.qpos), atol=1e-6)

    # subsequent steps: the hook is engaged and the trajectories diverge
    for _ in range(3):
        s0 = step0(s0, act)
        s1 = step1(s1, act)
    assert np.all(np.isfinite(np.asarray(s1.physics.qpos)))
    assert not np.allclose(np.asarray(s0.physics.qpos), np.asarray(s1.physics.qpos), atol=1e-6)
