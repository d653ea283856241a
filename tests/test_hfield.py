"""Continuous heightfield terrain: MuJoCo golden + engine/batched parity.

The reference's robust-walking setup jitters a heightfield under the robot
(/root/reference/tasks/walking_task.py:173-179; hfield asset in
envs/jvrc/gen_xml.py). Our Terrain.hfield is a per-env (H, W) grid sampled
bilinearly (gather-free tent-weight contractions). MuJoCo triangulates each
cell into planar facets, so the golden uses PLANAR height data (an incline),
where bilinear interpolation and triangulation agree exactly — this is the
continuous-contact case the box approximation could never produce: every
foot corner gets a tilted contact normal (foot straddling a slope).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.physics import batched, engine
from learninghumanoidwalking_tpu.physics.engine import Terrain
from learninghumanoidwalking_tpu.physics.model import default_dyn_params
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.robots.pd import pd_substeps

NROW, NCOL = 9, 9
RX = RY = 2.0  # grid spans [-2, 2] m


def _incline_grid(ax: float, ay: float) -> np.ndarray:
    """Planar heights h = ax*x + ay*y + c >= 0 on the NROWxNCOL node grid."""
    x = np.linspace(-RX, RX, NCOL)
    y = np.linspace(-RY, RY, NROW)
    h = ax * x[None, :] + ay * y[:, None]
    return (h - h.min()).astype(np.float32)  # shift so min = 0


def _hfield_terrain(grid: np.ndarray, nboxes: int = 0) -> Terrain:
    return Terrain(
        pos=jnp.zeros((nboxes, 3)) + jnp.array([50.0, 50.0, -0.07]),
        size=jnp.tile(jnp.array([0.5, 0.5, 0.1]), (nboxes, 1)),
        yaw=jnp.zeros((nboxes,)),
        floor_z=jnp.zeros(()),
        hfield=jnp.asarray(grid),
        hfield_x0y0=jnp.array([-RX, -RY]),
        hfield_cell=jnp.array([2 * RX / (NCOL - 1), 2 * RY / (NROW - 1)]),
    )


def _jvrc():
    from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec

    pose = np.deg2rad(HALF_SITTING_POSE_DEG)
    kp = np.array([200, 200, 200, 250, 80, 80] * 2, dtype=np.float64)
    kd = np.array([20, 20, 20, 25, 8, 8] * 2, dtype=np.float64)
    return jvrc_spec, pose, kp, kd, NOMINAL_HEIGHT


def test_hfield_query_matches_plane():
    """Bilinear sample + normal on planar data reproduce the plane exactly."""
    ax, ay = 0.10, -0.06
    grid = _incline_grid(ax, ay)
    t = _hfield_terrain(grid)
    x = np.linspace(-RX, RX, NCOL)
    y = np.linspace(-RY, RY, NROW)
    shift = (ax * x[None, :] + ay * y[:, None]).min()
    for xy in [(0.0, 0.0), (0.31, -0.77), (-1.2, 0.9), (1.9, 1.9)]:
        h, n = engine.hfield_query(t, jnp.asarray(xy))
        h_true = ax * xy[0] + ay * xy[1] - shift
        np.testing.assert_allclose(float(h), h_true, atol=1e-5)
        n_true = np.array([-ax, -ay, 1.0]) / np.linalg.norm([-ax, -ay, 1.0])
        np.testing.assert_allclose(np.asarray(n), n_true, atol=1e-5)
    # support_height includes the field
    sh = engine.support_height(t, jnp.asarray([0.5, -0.5]))
    np.testing.assert_allclose(float(sh), float(engine.hfield_query(t, jnp.asarray([0.5, -0.5]))[0]), atol=1e-6)


@pytest.mark.slow
def test_hfield_incline_statics_match_mujoco():
    """PD-held JVRC settling on a 6-degree incline: z trajectory and settled
    GRF match MuJoCo's triangulated hfield contacts."""
    mujoco = pytest.importorskip("mujoco")
    from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf
    from tests.test_mujoco_golden import _run_mujoco, _run_ours

    spec_fn, pose, kp, kd, height = _jvrc()
    spec = spec_fn()
    ax, ay = 0.10, 0.05
    grid = _incline_grid(ax, ay)

    zmax = float(grid.max())
    xml = export_mjcf(spec, with_floor=False, hfield=(NROW, NCOL, RX, RY, zmax))
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.hfield_data[:] = (grid / zmax).reshape(-1)

    h0 = float(engine.hfield_query(_hfield_terrain(grid), jnp.zeros(2))[0])
    qpos0 = np.concatenate([[0, 0, height + h0 + 0.02], [1, 0, 0, 0], pose])
    steps = 500

    # monkeypatch-free reuse of the golden helpers: _run_mujoco takes xml,
    # but hfield data must be poked post-load, so inline its loop here
    mj_data = mujoco.MjData(mj_model)
    act_qpos = [mj_model.jnt_qposadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    act_dof = [mj_model.jnt_dofadr[mj_model.actuator_trnid[i, 0]] for i in range(mj_model.nu)]
    mj_data.qpos[:] = qpos0
    mujoco.mj_forward(mj_model, mj_data)
    zs_mj, fz_mj, xs_mj = [], [], []
    for _ in range(steps):
        q = mj_data.qpos[act_qpos]
        v = mj_data.qvel[act_dof]
        mj_data.ctrl[:] = kp * (pose - q) - kd * v
        mujoco.mj_step(mj_model, mj_data)
        zs_mj.append(mj_data.qpos[2])
        xs_mj.append(mj_data.qpos[0])
        # world-VERTICAL contact force: on a slope the |f| norm mixes in
        # friction components that depend on micro-slip details (MuJoCo keeps
        # rocking on triangulated facet edges); the vertical sum is the
        # physics invariant (settled = m g)
        f_up = 0.0
        for ci in range(mj_data.ncon):
            f6 = np.zeros(6)
            mujoco.mj_contactForce(mj_model, mj_data, ci, f6)
            fr = np.asarray(mj_data.contact[ci].frame).reshape(3, 3)  # rows n,t1,t2
            f_up += float(f6[:3] @ fr[:, 2])
        fz_mj.append(f_up)
    zs_mj, fz_mj, xs_mj = np.array(zs_mj), np.array(fz_mj), np.array(xs_mj)

    terrain = _hfield_terrain(grid)
    model = lower(spec)
    params = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    state = engine.make_state(model, jnp.asarray(qpos0, jnp.float32), jnp.zeros(model.nv))
    target = jnp.asarray(pose, jnp.float32)

    @jax.jit
    def roll(state):
        def body(s, _):
            s = pd_substeps(model, params, s, target, 1, 0.001, terrain=terrain)
            # contact.force rows are contact-frame (fn, ft1, ft2); frame rows
            # are (n, t1, t2): world vertical = sum_k f_k * frame[k][2]
            fz = jnp.sum(jnp.sum(s.contact.force * s.contact.frame[:, :, 2], axis=-1) * s.contact.mask)
            return s, (s.qpos[2], fz, s.qpos[0])

        return jax.lax.scan(body, state, None, length=steps)

    _, (zs_j, fz_j, xs_j) = roll(state)
    zs_j, fz_j, xs_j = np.asarray(zs_j), np.asarray(fz_j), np.asarray(xs_j)

    assert np.abs(zs_mj - zs_j).mean() < 0.005, f"mean |dz| {np.abs(zs_mj - zs_j).mean():.4f}"
    assert np.abs(xs_mj - xs_j).mean() < 0.01, f"mean |dx| {np.abs(xs_mj - xs_j).mean():.4f}"
    mg = float(np.sum(np.asarray(model.body_mass))) * 9.81
    err_mj = abs(fz_mj[300:].mean() - mg) / mg
    err_j = abs(fz_j[300:].mean() - mg) / mg
    assert err_j < 0.03, f"our settled vertical GRF off weight by {err_j:.3f}"
    assert abs(fz_mj[300:].mean() - fz_j[300:].mean()) / mg < 0.05, (
        f"vertical GRF mismatch: mj {fz_mj[300:].mean():.1f} vs ours {fz_j[300:].mean():.1f} (mg={mg:.1f})"
    )


@pytest.mark.slow
def test_hfield_kernel_matches_batched():
    """Pallas kernel (interpret mode) hfield contacts == batched engine on a
    smooth incline (continuous normals; see the query-parity test for why
    random bumps are asserted at the query level instead)."""
    from learninghumanoidwalking_tpu.ops import substep_kernel as sk

    spec_fn, pose, kp, kd, height = _jvrc()
    model = lower(spec_fn())
    B = 8
    TB = (1, 8)
    rng = np.random.default_rng(7)

    grids = np.stack([_incline_grid(0.06, -0.04) for _ in range(B)])
    terrain = Terrain(
        pos=jnp.zeros((B, 0, 3)),
        size=jnp.zeros((B, 0, 3)),
        yaw=jnp.zeros((B, 0)),
        floor_z=jnp.zeros((B,)),
        hfield=jnp.asarray(grids),
        hfield_x0y0=jnp.tile(jnp.array([-RX, -RY]), (B, 1)),
        hfield_cell=jnp.tile(jnp.array([2 * RX / (NCOL - 1), 2 * RY / (NROW - 1)]), (B, 1)),
    )
    sk._KERNEL_CACHE[(id(model), 5, 0.001, TB, (NROW, NCOL), 1, None)] = sk.make_control_step(
        model, 5, 0.001, tb=TB, interpret=True, hfield_shape=(NROW, NCOL)
    )

    qpos = np.tile(np.concatenate([[0, 0, height], [1, 0, 0, 0], pose]).astype(np.float32)[None], (B, 1))
    qpos[:, 0] = rng.uniform(-0.4, 0.4, B)
    qpos[:, 1] = rng.uniform(-0.4, 0.4, B)
    for b in range(B):  # spawn 2 cm above the LOCAL surface (see engine test)
        h_local = float(engine.hfield_query(jax.tree.map(lambda x: x[b], terrain), jnp.asarray(qpos[b, :2]))[0])
        qpos[b, 2] += h_local + 0.02
    qvel = (0.1 * rng.standard_normal((B, model.nv))).astype(np.float32)
    target = np.tile(pose.astype(np.float32)[None], (B, 1))

    p1 = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), p1)
    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos), jnp.asarray(qvel))

    st_k, st_b = states, states
    for _ in range(8):  # 200 ms: fall, impact, settle on the bumps
        st_k = sk.pd_substeps_kernel(model, params, st_k, jnp.asarray(target), 5, 0.001, terrain)
        st_b = batched.pd_substeps_batched(model, params, st_b, jnp.asarray(target), 5, 0.001, terrain)

    np.testing.assert_allclose(np.asarray(st_k.qpos), np.asarray(st_b.qpos), atol=5e-5)
    grf_k = np.asarray(jnp.sum(jnp.linalg.norm(st_k.contact.force, axis=-1) * st_k.contact.mask, axis=1))
    grf_b = np.asarray(jnp.sum(jnp.linalg.norm(st_b.contact.force, axis=-1) * st_b.contact.mask, axis=1))
    np.testing.assert_allclose(grf_k, grf_b, rtol=0.02, atol=1.0)


def test_hfield_query_batched_matches_engine():
    """Pure height/normal query parity on a bumpy (non-planar) field with
    per-env distinct grids: the batch-in-lanes sample must reproduce the
    single-env query to float32 eps. (Trajectory-level parity is asserted on
    the smooth incline below — on random bumps, eps-level rounding at a cell
    boundary flips which facet a corner lands on and the impact dynamics
    amplify it, which tests rounding luck, not semantics.)"""
    batch = 4
    rng = np.random.default_rng(3)
    grids = np.stack(
        [_incline_grid(0.08, 0.0) + 0.03 * rng.random((NROW, NCOL)).astype(np.float32) for _ in range(batch)]
    )
    terrain = Terrain(
        pos=jnp.zeros((batch, 0, 3)),
        size=jnp.zeros((batch, 0, 3)),
        yaw=jnp.zeros((batch, 0)),
        floor_z=jnp.zeros((batch,)),
        hfield=jnp.asarray(grids),
        hfield_x0y0=jnp.tile(jnp.array([-RX, -RY]), (batch, 1)),
        hfield_cell=jnp.tile(jnp.array([2 * RX / (NCOL - 1), 2 * RY / (NROW - 1)]), (batch, 1)),
    )
    pts = rng.uniform(-1.9, 1.9, (16, 2, batch)).astype(np.float32)

    pts_env = jnp.asarray(pts).transpose(2, 0, 1)  # (B, 16, 2)
    h_e, n_e = jax.vmap(
        lambda t, P: jax.vmap(lambda p: engine.hfield_query(t, p))(P)
    )(terrain, pts_env)  # h (B, 16), n (B, 16, 3)

    terrain_t = batched._terrain_to_trailing(terrain)
    h_b, n_b = batched._hfield_query_b(terrain_t, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    # h_b (16, B), n_b (16, 3, B)

    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_e).T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(n_b), np.asarray(n_e).transpose(1, 2, 0), atol=1e-6)

    sh_e = jax.vmap(lambda t, P: jax.vmap(lambda p: engine.support_height(t, p))(P))(terrain, pts_env)
    sh_b = batched._support_height_b(terrain_t, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    np.testing.assert_allclose(np.asarray(sh_b), np.asarray(sh_e).T, atol=1e-6)


def test_hfield_batched_matches_engine():
    """Short-horizon parity between batch-in-lanes and the vmapped single-env
    engine on a smooth incline. Contact-buffer parity (dist/frame/mask) is
    exact (see the query test); the trajectory gate is the
    test_engine_equivalence.py standard (qpos atol 5e-2, GRF 8%): the two
    production solvers (row-sum Jacobi vs Cholesky-preconditioned projection)
    converge to two different admissible solutions of the frictional-contact
    problem — non-unique under Coulomb friction, and MORE visibly so on a
    slope where friction is loaded at rest. The physical anchor for both is
    the MuJoCo incline golden above."""
    spec_fn, pose, kp, kd, height = _jvrc()
    model = lower(spec_fn())
    batch = 4
    rng = np.random.default_rng(3)

    grids = np.stack([_incline_grid(0.08, 0.05) for _ in range(batch)])
    terrain = Terrain(
        pos=jnp.zeros((batch, 0, 3)),
        size=jnp.zeros((batch, 0, 3)),
        yaw=jnp.zeros((batch, 0)),
        floor_z=jnp.zeros((batch,)),
        hfield=jnp.asarray(grids),
        hfield_x0y0=jnp.tile(jnp.array([-RX, -RY]), (batch, 1)),
        hfield_cell=jnp.tile(jnp.array([2 * RX / (NCOL - 1), 2 * RY / (NROW - 1)]), (batch, 1)),
    )

    qpos = np.tile(np.concatenate([[0, 0, height], [1, 0, 0, 0], pose])[None], (batch, 1))
    qpos[:, 0] = rng.uniform(-0.5, 0.5, batch)
    qpos[:, 1] = rng.uniform(-0.5, 0.5, batch)
    # feet touching the LOCAL surface (1 mm above): in contact from step one
    for b in range(batch):
        h_local = float(engine.hfield_query(jax.tree.map(lambda x: x[b], terrain), jnp.asarray(qpos[b, :2]))[0])
        qpos[b, 2] += h_local + 0.001
    qvel = np.zeros((batch, model.nv), np.float32)

    p1 = default_dyn_params(model, jnp.asarray(kp, jnp.float32), jnp.asarray(kd, jnp.float32))
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), p1)
    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel))
    target = jnp.tile(jnp.asarray(pose, jnp.float32)[None], (batch, 1))

    st_e = states
    for _ in range(2):  # 50 ms of PD hold on the slope
        st_e = jax.vmap(lambda s, t: pd_substeps(model, p1, s, target[0], 25, 0.001, terrain=t))(st_e, terrain)
    st_b = states
    for _ in range(2):
        st_b = batched.pd_substeps_batched(model, params, st_b, target, 25, 0.001, terrain=terrain)

    np.testing.assert_allclose(np.asarray(st_b.qpos), np.asarray(st_e.qpos), atol=5e-2)
    grf_e = np.asarray(jnp.sum(jnp.linalg.norm(st_e.contact.force, axis=-1) * st_e.contact.mask, axis=1))
    grf_b = np.asarray(jnp.sum(jnp.linalg.norm(st_b.contact.force, axis=-1) * st_b.contact.mask, axis=1))
    np.testing.assert_allclose(grf_b, grf_e, rtol=0.08, atol=8.0)
