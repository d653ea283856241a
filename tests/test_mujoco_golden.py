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


def _run_mujoco(xml, qpos0, pose, kp, kd, steps):
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)
    act_qpos = [mj_model.jnt_qposadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    act_dof = [mj_model.jnt_dofadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    mj_data.qpos[:] = qpos0
    mj_data.qvel[:] = 0
    mujoco.mj_forward(mj_model, mj_data)
    zs, grf = [], []
    for _ in range(steps):
        q = mj_data.qpos[act_qpos]
        v = mj_data.qvel[act_dof]
        mj_data.ctrl[:] = kp * (pose - q) - kd * v
        mujoco.mj_step(mj_model, mj_data)
        zs.append(mj_data.qpos[2])
        f_tot = 0.0
        for ci in range(mj_data.ncon):
            f6 = np.zeros(6)
            mujoco.mj_contactForce(mj_model, mj_data, ci, f6)
            f_tot += np.linalg.norm(f6[:3])
        grf.append(f_tot)
    return np.array(zs), np.array(grf), mj_model.body_mass.sum()


def _run_ours(spec, qpos0, pose, kp, kd, steps):
    model = lower(spec)
    params = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    state = engine.make_state(model, jnp.asarray(qpos0, jnp.float32), jnp.zeros(model.nv))
    target = jnp.asarray(pose, jnp.float32)

    @jax.jit
    def roll(state):
        def body(s, _):
            s = pd_substeps(model, params, s, target, 1, 0.001)
            f = jnp.sum(jnp.linalg.norm(s.contact.force, axis=-1) * s.contact.mask)
            return s, (s.qpos[2], f)

        return jax.lax.scan(body, state, None, length=steps)

    _, (zs, grf) = roll(state)
    return np.asarray(zs), np.asarray(grf), float(np.sum(np.asarray(model.body_mass)))


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
    zs_mj, grf_mj, mass_mj = _run_mujoco(xml, qpos0, pose, kp, kd, steps)
    zs_j, grf_j, mass_j = _run_ours(spec, qpos0, pose, kp, kd, steps)

    np.testing.assert_allclose(mass_j, mass_mj, rtol=1e-4)
    # trajectory agreement: a few mm over half a second of contact dynamics
    assert np.abs(zs_mj - zs_j).mean() < 0.01, f"mean |dz| {np.abs(zs_mj - zs_j).mean():.4f}"
    # settled total GRF within 10% once transients die out
    assert abs(grf_mj[300:].mean() - grf_j[300:].mean()) / grf_mj[300:].mean() < 0.10
