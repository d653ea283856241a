"""Golden-value validation against the real MuJoCo binary.

The acceptance gate for the TPU engine (SURVEY.md §4: the analog of
scripts/test_contact_behavior.py): export the same RobotSpec the JAX engine
lowers to MJCF, run identical PD-held dynamics in MuJoCo, and compare
trajectories and ground-reaction forces. Skipped when mujoco is unavailable.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from learninghumanoidwalking_tpu.physics import engine  # noqa: E402
from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf  # noqa: E402
from learninghumanoidwalking_tpu.physics.model import default_dyn_params  # noqa: E402
from learninghumanoidwalking_tpu.physics.spec import lower  # noqa: E402
from learninghumanoidwalking_tpu.robots.pd import pd_substeps  # noqa: E402


def _run_mujoco(xml, qpos0, pose, kp, kd, steps, qvel0=None):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)
    act_qpos = [mj_model.jnt_qposadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    act_dof = [mj_model.jnt_dofadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    mj_data.qpos[:] = qpos0
    mj_data.qvel[:] = 0 if qvel0 is None else qvel0
    mujoco.mj_forward(mj_model, mj_data)
    zs, grf, xs = [], [], []
    for _ in range(steps):
        q = mj_data.qpos[act_qpos]
        v = mj_data.qvel[act_dof]
        mj_data.ctrl[:] = kp * (pose - q) - kd * v
        mujoco.mj_step(mj_model, mj_data)
        zs.append(mj_data.qpos[2])
        xs.append(mj_data.qpos[0])
        f_tot = 0.0
        for ci in range(mj_data.ncon):
            f6 = np.zeros(6)
            mujoco.mj_contactForce(mj_model, mj_data, ci, f6)
            f_tot += np.linalg.norm(f6[:3])
        grf.append(f_tot)
    return np.array(zs), np.array(grf), mj_model.body_mass.sum(), np.array(xs)


def _run_ours(spec, qpos0, pose, kp, kd, steps, qvel0=None, terrain=None):
    model = lower(spec)
    params = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    qvel = jnp.zeros(model.nv) if qvel0 is None else jnp.asarray(qvel0, jnp.float32)
    state = engine.make_state(model, jnp.asarray(qpos0, jnp.float32), qvel)
    target = jnp.asarray(pose, jnp.float32)

    @jax.jit
    def roll(state):
        def body(s, _):
            s = pd_substeps(model, params, s, target, 1, 0.001, terrain=terrain)
            f = jnp.sum(jnp.linalg.norm(s.contact.force, axis=-1) * s.contact.mask)
            return s, (s.qpos[2], f, s.qpos[0])

        return jax.lax.scan(body, state, None, length=steps)

    _, (zs, grf, xs) = roll(state)
    return np.asarray(zs), np.asarray(grf), float(np.sum(np.asarray(model.body_mass))), np.asarray(xs)


@pytest.mark.slow
@pytest.mark.parametrize("robot", ["jvrc", "h1"])
def test_pd_held_trajectory_matches_mujoco(robot):
    if robot == "jvrc":
        from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec

        spec = jvrc_spec()
        pose = np.deg2rad(HALF_SITTING_POSE_DEG)
        kp = np.array([200, 200, 200, 250, 80, 80] * 2, dtype=np.float64)
        kd = np.array([20, 20, 20, 25, 8, 8] * 2, dtype=np.float64)
        height = NOMINAL_HEIGHT
    else:
        from learninghumanoidwalking_tpu.models.h1 import HALF_SITTING_POSE, NOMINAL_HEIGHT, h1_spec

        spec = h1_spec()
        pose = np.asarray(HALF_SITTING_POSE)
        kp = np.array([100, 100, 100, 100, 20] * 2, dtype=np.float64)
        kd = np.array([10, 10, 10, 10, 4] * 2, dtype=np.float64)
        height = NOMINAL_HEIGHT

    qpos0 = np.concatenate([[0, 0, height], [1, 0, 0, 0], pose])
    steps = 500  # 0.5 s — before fall trajectories diverge chaotically
    xml = export_mjcf(spec)
    zs_mj, grf_mj, mass_mj, _ = _run_mujoco(xml, qpos0, pose, kp, kd, steps)
    zs_j, grf_j, mass_j, _ = _run_ours(spec, qpos0, pose, kp, kd, steps)

    np.testing.assert_allclose(mass_j, mass_mj, rtol=1e-4)
    # trajectory agreement: a few mm over half a second of contact dynamics
    assert np.abs(zs_mj - zs_j).mean() < 0.005, f"mean |dz| {np.abs(zs_mj - zs_j).mean():.4f}"
    # settled total GRF within 5% once transients die out
    assert abs(grf_mj[300:].mean() - grf_j[300:].mean()) / grf_mj[300:].mean() < 0.05


@pytest.mark.slow
def test_pd_held_trajectory_reuse5_matches_mujoco():
    """The factorization-reuse fast path (R=5: mass-matrix Cholesky +
    contact basis refreshed every 5th of the 1 kHz substeps, reused in
    between — PERFORMANCE.md round-5 lever) must stay inside the SAME golden
    gates as the exact engine: mean |dz| < 5 mm and settled GRF within 5%
    over 0.5 s of PD-held contact dynamics. Lag error is O(|qvel| R dt)."""
    from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec
    from learninghumanoidwalking_tpu.physics import batched

    spec = jvrc_spec()
    pose = np.deg2rad(HALF_SITTING_POSE_DEG)
    kp = np.array([200, 200, 200, 250, 80, 80] * 2, dtype=np.float64)
    kd = np.array([20, 20, 20, 25, 8, 8] * 2, dtype=np.float64)
    qpos0 = np.concatenate([[0, 0, NOMINAL_HEIGHT], [1, 0, 0, 0], pose])
    steps = 500
    xml = export_mjcf(spec)
    zs_mj, grf_mj, mass_mj, _ = _run_mujoco(xml, qpos0, pose, kp, kd, steps)

    model = lower(spec)
    params = jax.tree.map(
        lambda x: x[None],
        default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32)),
    )
    state = jax.tree.map(
        lambda x: x[None], engine.make_state(model, jnp.asarray(qpos0, jnp.float32), jnp.zeros(model.nv))
    )
    target = jnp.asarray(pose, jnp.float32)[None]

    @jax.jit
    def roll(state):
        def body(s, _):
            # one refresh group per call: PD torque still updates every 1 ms
            # substep inside; only the factorization is lagged
            s = batched.pd_substeps_batched(model, params, s, target, 5, 0.001, reuse_interval=5)
            f = jnp.sum(jnp.linalg.norm(s.contact.force, axis=-1) * s.contact.mask)
            return s, (s.qpos[0, 2], f)

        return jax.lax.scan(body, state, None, length=steps // 5)

    _, (zs_j, grf_j) = roll(state)
    zs_j, grf_j = np.asarray(zs_j), np.asarray(grf_j)
    # compare at the 5-substep cadence the batched call reports
    zs_mj5, grf_mj5 = zs_mj[4::5], grf_mj[4::5]
    assert np.abs(zs_mj5 - zs_j).mean() < 0.005, f"mean |dz| {np.abs(zs_mj5 - zs_j).mean():.4f}"
    assert abs(grf_mj5[60:].mean() - grf_j[60:].mean()) / grf_mj5[60:].mean() < 0.05


def _jvrc_setup():
    from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec

    pose = np.deg2rad(HALF_SITTING_POSE_DEG)
    kp = np.array([200, 200, 200, 250, 80, 80] * 2, dtype=np.float64)
    kd = np.array([20, 20, 20, 25, 8, 8] * 2, dtype=np.float64)
    return jvrc_spec, pose, kp, kd, NOMINAL_HEIGHT


def _terrain_obj(boxes, nterrain, floor_z=0.0):
    from learninghumanoidwalking_tpu.physics.engine import Terrain

    pos = np.full((nterrain, 3), [50.0, 50.0, -0.07], np.float32)
    size = np.tile(np.array([0.5, 0.5, 0.1], np.float32), (nterrain, 1))
    yaw = np.zeros(nterrain, np.float32)
    for i, (p, s, y) in enumerate(boxes):
        pos[i], size[i], yaw[i] = p, s, y
    return Terrain(pos=jnp.asarray(pos), size=jnp.asarray(size), yaw=jnp.asarray(yaw), floor_z=jnp.asarray(floor_z))


@pytest.mark.slow
def test_stepping_stone_statics_match_mujoco():
    """Settled statics on raised stepping stones (full MuJoCo boxes) — the
    terrain analog of the flat-floor golden
    (/root/reference/tasks/stepping_task.py:320-334 scene construction,
    /root/reference/scripts/test_contact_behavior.py verification)."""
    spec_fn, pose, kp, kd, height = _jvrc_setup()
    spec = spec_fn(nterrain=4)
    # two stones centered under the feet (foot bottom spans x 0.014-0.214),
    # tops at z = 0.08, yawed slightly. Stones must cover all four foot
    # corners: contacts are emitted at the foot's bottom corners (MuJoCo's
    # <=4 deepest plane/box points), so a stone EDGE under the sole midfoot
    # is not representable — the stepping task targets stone centers, where
    # this never binds.
    boxes = [
        ((0.114, 0.12, 0.03), (0.2, 0.12, 0.05), 0.05),
        ((0.114, -0.12, 0.03), (0.2, 0.12, 0.05), -0.05),
    ]
    qpos0 = np.concatenate([[0, 0, height + 0.08], [1, 0, 0, 0], pose])
    steps = 500
    xml = export_mjcf(spec, terrain_boxes=boxes)
    zs_mj, grf_mj, _, _ = _run_mujoco(xml, qpos0, pose, kp, kd, steps)
    terrain = _terrain_obj(boxes, nterrain=4)
    zs_j, grf_j, _, _ = _run_ours(spec, qpos0, pose, kp, kd, steps, terrain=terrain)

    assert np.abs(zs_mj - zs_j).mean() < 0.005, f"mean |dz| {np.abs(zs_mj - zs_j).mean():.4f}"
    assert abs(grf_mj[300:].mean() - grf_j[300:].mean()) / grf_mj[300:].mean() < 0.05


@pytest.mark.slow
def test_riser_side_face_matches_mujoco():
    """A foot driven into a stair riser (box SIDE face) must be stopped the
    way MuJoCo stops it — the case the round-1 top-face-only query missed
    (VERDICT round 1, missing #4)."""
    spec_fn, pose, kp, kd, height = _jvrc_setup()
    spec = spec_fn(nterrain=2)
    # a tall step ahead: riser face at x = 0.24, top at z = 0.6 (above feet)
    boxes = [((0.44, 0.0, 0.3), (0.2, 1.0, 0.3), 0.0)]
    qpos0 = np.concatenate([[0, 0, height], [1, 0, 0, 0], pose])
    qvel0 = np.zeros(18)
    qvel0[0] = 1.0  # flying forward at 1 m/s
    steps = 300
    xml = export_mjcf(spec, terrain_boxes=boxes)
    zs_mj, _, _, xs_mj = _run_mujoco(xml, qpos0, pose, kp, kd, steps, qvel0=qvel0)
    terrain = _terrain_obj(boxes, nterrain=2)
    zs_j, _, _, xs_j = _run_ours(spec, qpos0, pose, kp, kd, steps, qvel0=qvel0, terrain=terrain)

    # MuJoCo's riser jams the toe and the robot pitches forward over it
    # (root keeps advancing while falling); the golden criterion is that our
    # engine does the SAME thing — without side-face collision the foot
    # passes through and the robot neither decelerates nor pitches.
    assert np.abs(xs_mj - xs_j).mean() < 0.03, f"mean |dx| {np.abs(xs_mj - xs_j).mean():.4f}"
    assert abs(xs_mj[-1] - xs_j[-1]) < 0.06, f"final dx {abs(xs_mj[-1] - xs_j[-1]):.4f}"
    assert np.abs(zs_mj - zs_j).mean() < 0.02, f"mean |dz| {np.abs(zs_mj - zs_j).mean():.4f}"


@pytest.mark.slow
def test_self_collision_fires_with_mujoco():
    """Self-collision termination golden (VERDICT round 3, missing #5): drive
    a leg-crossing trajectory in both engines and assert our
    engine.self_collision flag fires within 60 ms of MuJoCo's first
    self-contact (reference check: robot_interface.check_self_collisions,
    /root/reference/envs/common/robot_interface.py:472-484, consumed by task
    done() e.g. walking_task.py:184-192).

    The exported MJCF ships the proxy spheres as contype=0 visuals; here they
    are re-enabled in a private collision class (contype=conaffinity=2) so
    MuJoCo's own collision pipeline reports the contact. Both simulations run
    identical PD dynamics up to the first touch, so first-contact times are
    directly comparable."""
    from learninghumanoidwalking_tpu.models.jvrc import LEG_JOINTS

    spec_fn, pose, kp, kd, height = _jvrc_setup()
    spec = spec_fn()
    # adduct the right leg hard across the left: the right foot-proxy sphere
    # sweeps into the left foot proxy within ~0.6 s
    target = pose.copy()
    target[LEG_JOINTS.index("R_HIP_R")] += 0.9
    qpos0 = np.concatenate([[0, 0, height], [1, 0, 0, 0], pose])
    steps = 800

    # ---- MuJoCo: first contact between proxy geoms (own collision class,
    # set at export time — MuJoCo 3.4 ignores runtime geom_contype edits)
    xml = export_mjcf(spec, self_proxy_collisions=True)
    mj_model = mujoco.MjModel.from_xml_string(xml)
    prox = [
        g
        for g in range(mj_model.ngeom)
        if "prox" in (mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_GEOM, g) or "")
    ]
    assert prox, "proxy spheres missing from the exported MJCF"
    mj_data = mujoco.MjData(mj_model)
    act_qpos = [mj_model.jnt_qposadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    act_dof = [mj_model.jnt_dofadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    mj_data.qpos[:] = qpos0
    mujoco.mj_forward(mj_model, mj_data)
    t_mj = None
    for t in range(steps):
        q = mj_data.qpos[act_qpos]
        v = mj_data.qvel[act_dof]
        mj_data.ctrl[:] = kp * (target - q) - kd * v
        mujoco.mj_step(mj_model, mj_data)
        for ci in range(mj_data.ncon):
            if mj_data.contact.geom1[ci] in prox and mj_data.contact.geom2[ci] in prox:
                t_mj = t
                break
        if t_mj is not None:
            break
    assert t_mj is not None, "MuJoCo never reported a proxy self-contact"

    # ---- ours: first substep where engine.self_collision is True
    model = lower(spec)
    params = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    state = engine.make_state(model, jnp.asarray(qpos0, jnp.float32), jnp.zeros(model.nv))
    tgt = jnp.asarray(target, jnp.float32)

    @jax.jit
    def roll(state):
        def body(s, _):
            s = pd_substeps(model, params, s, tgt, 1, 0.001)
            return s, engine.self_collision(model, s.xpos, s.xquat)

        return jax.lax.scan(body, state, None, length=steps)

    _, flags = roll(state)
    flags = np.asarray(flags)
    assert flags.any(), "engine.self_collision never fired on the crossing trajectory"
    t_ours = int(np.argmax(flags))

    # identical sphere-overlap semantics on mm-matched trajectories: the
    # flags must fire within 60 substeps (60 ms) of each other, and before
    # contact neither engine may fire
    assert abs(t_ours - t_mj) <= 60, f"ours {t_ours} vs mujoco {t_mj}"
    assert not flags[: max(t_mj - 60, 0)].any()
