"""Pallas mega-kernel vs batched-engine equivalence (interpret mode on CPU).

The kernel (ops/substep_kernel.py) must reproduce physics/batched.py — which
is itself gated against engine.py and real MuJoCo — to float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec
from learninghumanoidwalking_tpu.ops.substep_kernel import make_control_step
from learninghumanoidwalking_tpu.physics import batched, engine
from learninghumanoidwalking_tpu.physics.model import default_dyn_params
from learninghumanoidwalking_tpu.physics.spec import lower


@pytest.mark.slow
def test_kernel_matches_batched_engine():
    TB, B, FRAME_SKIP = (2, 4), 8, 5  # exercise the sublane-batched layout
    model = lower(jvrc_spec())
    run, nc = make_control_step(model, FRAME_SKIP, 0.001, tb=TB, interpret=True)

    rng = np.random.default_rng(0)
    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos = np.tile(np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose]).astype(np.float32)[:, None], (1, B))
    qpos[:2] += 0.01 * rng.standard_normal((2, B)).astype(np.float32)
    qvel = (0.05 * rng.standard_normal((18, B))).astype(np.float32)
    target = pose[:, None] + 0.05 * rng.standard_normal((12, B)).astype(np.float32)
    kp = np.tile(np.array([200, 200, 200, 250, 80, 80] * 2, np.float32)[:, None], (1, B))
    kd = np.tile(np.array([20, 20, 20, 25, 8, 8] * 2, np.float32)[:, None], (1, B))
    bemf = np.zeros((12, B), np.float32)

    p1 = default_dyn_params(model, jnp.asarray(kp[:, 0]), jnp.asarray(kd[:, 0]))
    params_b = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)
    params_t = batched._params_to_trailing(params_b)

    out = run(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(target), jnp.asarray(kp), jnp.asarray(kd),
        jnp.asarray(bemf), params_t.dof_damping, params_t.dof_frictionloss, params_t.body_mass,
        params_t.body_ipos.reshape(-1, B), jnp.concatenate([params_t.xfrc[i] for i in range(model.nbody)]),
    )

    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos.T), jnp.asarray(qvel.T))
    ref = batched.pd_substeps_batched(model, params_b, states, jnp.asarray(target.T), FRAME_SKIP, 0.001)

    np.testing.assert_allclose(np.asarray(out[0].T), np.asarray(ref.qpos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1].T), np.asarray(ref.qvel), atol=2e-3)
    # in-kernel final-state FK caches (xpos/xquat/cvel) vs the batched twin
    nb = model.nbody
    np.testing.assert_allclose(
        np.asarray(out[9].reshape(nb, 3, B).transpose(2, 0, 1)), np.asarray(ref.xpos), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[10].reshape(nb, 4, B).transpose(2, 0, 1)), np.asarray(ref.xquat), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[11].reshape(nb, 6, B).transpose(2, 0, 1)), np.asarray(ref.cvel), atol=2e-3
    )
    grf_k = np.asarray(jnp.sum(jnp.linalg.norm(out[4].reshape(nc, 3, B), axis=1) * out[6], axis=0))
    grf_r = np.asarray(jnp.sum(jnp.linalg.norm(ref.contact.force, axis=-1) * ref.contact.mask, axis=1))
    np.testing.assert_allclose(grf_k, grf_r, rtol=0.02, atol=1.0)


@pytest.mark.slow
def test_kernel_reuse5_matches_batched_engine():
    """Factorization-reuse interval R=5 (PERFORMANCE.md round-5 lever): the
    kernel and the batched engine must lag the SAME objects (mass-matrix
    Cholesky + contact basis/Gram) at the same substeps, so their R=5
    trajectories agree to the same tolerance as the exact R=1 paths."""
    TB, B, FRAME_SKIP, R = (2, 4), 8, 10, 5  # two refresh groups
    model = lower(jvrc_spec())
    run, nc = make_control_step(model, FRAME_SKIP, 0.001, tb=TB, interpret=True, reuse=R)

    rng = np.random.default_rng(3)
    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos = np.tile(np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose]).astype(np.float32)[:, None], (1, B))
    qpos[:2] += 0.01 * rng.standard_normal((2, B)).astype(np.float32)
    qvel = (0.05 * rng.standard_normal((18, B))).astype(np.float32)
    target = pose[:, None] + 0.05 * rng.standard_normal((12, B)).astype(np.float32)
    kp = np.tile(np.array([200, 200, 200, 250, 80, 80] * 2, np.float32)[:, None], (1, B))
    kd = np.tile(np.array([20, 20, 20, 25, 8, 8] * 2, np.float32)[:, None], (1, B))
    bemf = np.zeros((12, B), np.float32)

    p1 = default_dyn_params(model, jnp.asarray(kp[:, 0]), jnp.asarray(kd[:, 0]))
    params_b = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)
    params_t = batched._params_to_trailing(params_b)

    out = run(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(target), jnp.asarray(kp), jnp.asarray(kd),
        jnp.asarray(bemf), params_t.dof_damping, params_t.dof_frictionloss, params_t.body_mass,
        params_t.body_ipos.reshape(-1, B), jnp.concatenate([params_t.xfrc[i] for i in range(model.nbody)]),
    )

    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos.T), jnp.asarray(qvel.T))
    ref = batched.pd_substeps_batched(
        model, params_b, states, jnp.asarray(target.T), FRAME_SKIP, 0.001, reuse_interval=R
    )
    np.testing.assert_allclose(np.asarray(out[0].T), np.asarray(ref.qpos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1].T), np.asarray(ref.qvel), atol=2e-3)

    # the reuse must actually engage: R=5 differs from the exact rollout
    ref1 = batched.pd_substeps_batched(
        model, params_b, states, jnp.asarray(target.T), FRAME_SKIP, 0.001, reuse_interval=1
    )
    assert np.abs(np.asarray(ref.qvel) - np.asarray(ref1.qvel)).max() > 0.0
    # ... but only by the O(|qvel| R dt) lag error, far inside fall scales
    np.testing.assert_allclose(np.asarray(ref.qpos), np.asarray(ref1.qpos), atol=5e-4)


@pytest.mark.slow
def test_kernel_terrain_matches_batched_engine():
    """Terrain (stepping-stone) contacts through the kernel's support-height
    inputs must match the batched engine's query."""
    from learninghumanoidwalking_tpu.ops import substep_kernel as sk
    from learninghumanoidwalking_tpu.physics.engine import Terrain

    B = 8
    TB = (1, 8)  # must match kernel_tile(B) so pd_substeps_kernel hits the cache
    NT = 6
    model = lower(jvrc_spec(nterrain=NT))
    sk._KERNEL_CACHE[(id(model), 5, 0.001, TB, None, 1, None)] = make_control_step(model, 5, 0.001, tb=TB, interpret=True)

    rng = np.random.default_rng(0)
    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos = np.tile(
        np.concatenate([[0, 0, NOMINAL_HEIGHT + 0.03], [1, 0, 0, 0], pose]).astype(np.float32)[None, :], (B, 1)
    )
    qvel = (0.05 * rng.standard_normal((B, 18))).astype(np.float32)
    target = jnp.asarray(np.tile(pose[None, :], (B, 1)))
    kp = jnp.asarray([200, 200, 200, 250, 80, 80] * 2, jnp.float32)
    kd = jnp.asarray([20, 20, 20, 25, 8, 8] * 2, jnp.float32)
    p1 = default_dyn_params(model, kp, kd)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)

    tpos = np.tile(np.array([[0.1, 0.1, -0.07]] * NT, np.float32)[None], (B, 1, 1))
    tpos[:, 3:, :2] = 5.0
    tsize = np.tile(np.array([[0.5, 0.5, 0.1]] * NT, np.float32)[None], (B, 1, 1))
    terrain = Terrain(
        pos=jnp.asarray(tpos), size=jnp.asarray(tsize), yaw=0.3 * jnp.ones((B, NT)), floor_z=jnp.zeros(B)
    )

    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos), jnp.asarray(qvel))
    ref = batched.pd_substeps_batched(model, params, states, target, 5, 0.001, terrain)
    out = sk.pd_substeps_kernel(model, params, states, target, 5, 0.001, terrain)
    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.contact.mask), np.asarray(ref.contact.mask))


@pytest.mark.slow
def test_kernel_side_face_matches_batched():
    """Side-face (riser) contacts through the kernel's full-box SDF must
    match the batched engine: tilted contact frames and arrested motion
    (the round-1 top-face-only query let feet pass through risers)."""
    from learninghumanoidwalking_tpu.ops import substep_kernel as sk
    from learninghumanoidwalking_tpu.physics.engine import Terrain

    B = 8
    TB = (1, 8)
    NT = 2
    model = lower(jvrc_spec(nterrain=NT))
    sk._KERNEL_CACHE[(id(model), 5, 0.001, TB, None, 1, None)] = make_control_step(model, 5, 0.001, tb=TB, interpret=True)

    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos = np.tile(
        np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose]).astype(np.float32)[None], (B, 1)
    )
    qvel = np.zeros((B, 18), np.float32)
    qvel[:, 0] = 1.0  # flying forward into a wall of boxes

    # tall step ahead: riser face at x = 0.20, top at z = 0.6 (above feet).
    # The real-JVRC toe front edge spawns at x = 0.190 and floor friction
    # arrests the slide within ~26 mm, so the face must sit inside that
    # window for the corner to reach it while still moving.
    tpos = np.tile(np.array([[0.40, 0.0, 0.3], [9.0, 9.0, -0.07]], np.float32)[None], (B, 1, 1))
    tsize = np.tile(np.array([[0.2, 1.0, 0.3], [0.5, 0.5, 0.1]], np.float32)[None], (B, 1, 1))
    terrain = Terrain(
        pos=jnp.asarray(tpos), size=jnp.asarray(tsize), yaw=jnp.zeros((B, NT)), floor_z=jnp.zeros(B)
    )

    target = jnp.asarray(np.tile(pose[None], (B, 1)))
    kp = jnp.asarray([200, 200, 200, 250, 80, 80] * 2, jnp.float32)
    kd = jnp.asarray([20, 20, 20, 25, 8, 8] * 2, jnp.float32)
    p1 = default_dyn_params(model, kp, kd)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)

    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos), jnp.asarray(qvel))
    st_k, st_b = states, states
    # the toe crosses the face early, the riser pushes it back out, and it
    # settles just outside (~0.1992) — so side contact is only LIVE during
    # the first few control steps; accumulate engagement across the run
    engaged = False
    for _ in range(14):  # 70 ms at ~1 m/s: the toe (starting 10 mm away) hits the riser
        st_k = sk.pd_substeps_kernel(model, params, st_k, target, 5, 0.001, terrain)
        st_b = batched.pd_substeps_batched(model, params, st_b, target, 5, 0.001, terrain)
        normals = np.asarray(st_b.contact.frame[:, :, 0, :])  # (B, nc, 3)
        active = np.asarray(st_b.contact.mask) > 0
        if active.any() and (normals[active][:, 0] < -0.9).any():
            engaged = True

    np.testing.assert_allclose(np.asarray(st_k.qpos), np.asarray(st_b.qpos), atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_k.contact.frame), np.asarray(st_b.contact.frame), atol=1e-4)
    # non-vacuous: at some point an active contact was against the riser
    # (its normal horizontal, pointing -x)
    assert engaged, "no side-face contact engaged"


@pytest.mark.slow
def test_kernel_motor_matches_batched_engine():
    """Motor-dynamics hook INSIDE the fused kernel (weights baked as
    constants, joint-major history blocks in the substep carry) vs
    pd_substeps_batched(motor=...) — which is itself gated bit-exactly
    against the vmapped single-env hook (tests/test_motor.py). Initial
    counters straddle the 25-substep warmup boundary AND the even/odd
    append cadence, so passthrough, first-engagement, and steady-state
    net-in-the-loop physics are all exercised (robot_interface.py:25-58,
    :510-533)."""
    from learninghumanoidwalking_tpu.ops import substep_kernel as sk
    from learninghumanoidwalking_tpu.robots.motor import (
        HIST_LEN,
        MotorState,
        init_motor_params,
    )

    TB, B, FRAME_SKIP = (1, 8), 8, 5
    model = lower(jvrc_spec())
    motor_params = init_motor_params(jax.random.PRNGKey(7), model.nu)
    np_params = {k: np.asarray(v) for k, v in motor_params.items()}
    sk._KERNEL_CACHE[(id(model), FRAME_SKIP, 0.001, TB, None, 1, id(motor_params))] = make_control_step(
        model, FRAME_SKIP, 0.001, tb=TB, interpret=True, motor=np_params
    )

    rng = np.random.default_rng(3)
    pose = np.deg2rad(HALF_SITTING_POSE_DEG).astype(np.float32)
    qpos = np.tile(
        np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose]).astype(np.float32)[None], (B, 1)
    )
    qvel = (0.05 * rng.standard_normal((B, 18))).astype(np.float32)
    target = jnp.asarray(pose[None] + 0.05 * rng.standard_normal((B, 12)).astype(np.float32))
    kp = jnp.asarray([200, 200, 200, 250, 80, 80] * 2, jnp.float32)
    kd = jnp.asarray([20, 20, 20, 25, 8, 8] * 2, jnp.float32)
    p1 = default_dyn_params(model, kp, kd)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)

    # counters straddling warm/engaged and even/odd; histories pre-filled
    count = jnp.asarray(rng.integers(0, 2 * HIST_LEN, size=B), jnp.int32)
    mstate = MotorState(
        qdot_hist=jnp.asarray(0.1 * rng.standard_normal((B, HIST_LEN, model.nu)), jnp.float32),
        ctau_hist=jnp.asarray(5.0 * rng.standard_normal((B, HIST_LEN, model.nu)), jnp.float32),
        count=count,
    )

    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos), jnp.asarray(qvel))
    st_k, m_k = states, mstate
    st_b, m_b = states, mstate
    for _ in range(8):  # 40 substeps: every env crosses warmup
        st_k, m_k = sk.pd_substeps_kernel(
            model, params, st_k, target, FRAME_SKIP, 0.001, motor=(motor_params, m_k)
        )
        st_b, m_b = batched.pd_substeps_batched(
            model, params, st_b, target, FRAME_SKIP, 0.001,
            motor=(motor_params, m_b),
        )

    np.testing.assert_array_equal(np.asarray(m_k.count), np.asarray(m_b.count))
    assert int(np.asarray(m_k.count).min()) >= 40  # counters advanced every substep
    np.testing.assert_allclose(np.asarray(m_k.qdot_hist), np.asarray(m_b.qdot_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(m_k.ctau_hist), np.asarray(m_b.ctau_hist), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_k.qpos), np.asarray(st_b.qpos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_k.qvel), np.asarray(st_b.qvel), atol=2e-3)
    assert np.all(np.isfinite(np.asarray(st_k.qpos)))
