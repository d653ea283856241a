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


def test_motor_substep_batched_matches_single():
    """motor_substep_torque_b (trailing-batch lane layout) is bit-identical
    to the vmapped single-env motor_substep_torque on the same inputs —
    across warmup, the warm/every-2nd-update boundary, and the steady
    state. This is the exact gate on the batched motor math; trajectory
    -level parity is bounded by engine drift (see the env test below)."""
    from learninghumanoidwalking_tpu.robots.motor import (
        HIST_LEN,
        MotorState,
        init_motor_params,
        motor_substep_torque,
        motor_substep_torque_b,
    )

    nu, batch = 12, 5
    params = init_motor_params(jax.random.PRNGKey(0), nu)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    qd_h = jax.random.normal(ks[0], (batch, HIST_LEN, nu))
    ct_h = 10 * jax.random.normal(ks[1], (batch, HIST_LEN, nu))
    # one env per interesting count regime: warmup, last-warm, first-cold
    # (net active, update every 2nd), odd (no history push), steady-state
    count = jnp.asarray([3, 24, 25, 27, 100], jnp.int32)
    qdot = jax.random.normal(ks[2], (batch, nu))
    ctau = 10 * jax.random.normal(ks[3], (batch, nu))

    def single(qh, ch, c, qd, ct):
        tau, st = motor_substep_torque(
            params, MotorState(qdot_hist=qh, ctau_hist=ch, count=c), qd, ct
        )
        return tau, st.qdot_hist, st.ctau_hist, st.count

    tau_v, qh_v, ch_v, c_v = jax.vmap(single)(qd_h, ct_h, count, qdot, ctau)
    tau_b, qh_b, ch_b, c_b = motor_substep_torque_b(
        params, qd_h.transpose(1, 2, 0), ct_h.transpose(1, 2, 0), count, qdot.T, ctau.T
    )
    np.testing.assert_allclose(np.asarray(tau_v.T), np.asarray(tau_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(qh_v.transpose(1, 2, 0)), np.asarray(qh_b), atol=0)
    np.testing.assert_allclose(np.asarray(ch_v.transpose(1, 2, 0)), np.asarray(ch_b), atol=0)
    np.testing.assert_array_equal(np.asarray(c_v), np.asarray(c_b))


def test_motor_batched_env_matches_vmapped():
    """step_batch's batch-in-lanes motor path tracks the vmapped single-env
    motor loop within the known batched-vs-single engine drift envelope
    (test_engine_equivalence gates the motor-free paths at qpos atol 5e-2
    per 25 substeps), with exactly-matching substep counters. The motor
    math itself is gated bit-exactly by the unit test above."""
    from learninghumanoidwalking_tpu.envs import make_env
    from learninghumanoidwalking_tpu.robots.motor import init_motor_params as imp

    env = make_env("jvrc_walk")
    env.motor_enabled = True
    env.motor_params = imp(jax.random.PRNGKey(0), env.model.nu)

    batch = 4
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    states = jax.jit(env.reset_batch)(keys, jnp.zeros(batch, jnp.int32))
    step_b = jax.jit(env.step_batch)
    step_v = jax.jit(jax.vmap(env.step))

    sb = sv = states
    # 3 control steps = 75 substeps: crosses the 25-substep warmup so the
    # learned net (not the passthrough) is in the loop by the end
    for i in range(3):
        acts = 0.1 * jax.random.normal(jax.random.PRNGKey(2 + i), (batch, env.action_size))
        sb = step_b(sb, acts)
        sv = step_v(sv, acts)
    assert int(np.asarray(sb.motor.count)[0]) == 75
    np.testing.assert_array_equal(np.asarray(sb.motor.count), np.asarray(sv.motor.count))
    # measured drift at these shapes: qpos maxdiff ~1.5e-2, identical with
    # the motor hook disabled — i.e. pure engine fp-reassociation drift
    np.testing.assert_allclose(
        np.asarray(sb.physics.qpos), np.asarray(sv.physics.qpos), atol=5e-2
    )
    assert np.all(np.isfinite(np.asarray(sb.physics.qpos)))
    assert np.all(np.isfinite(np.asarray(sb.motor.ctau_hist)))
