"""Real 3D offscreen rendering of recorded trajectories via MuJoCo + EGL.

The reference records eval videos with mujoco.Renderer + imageio
(/root/reference/rl/utils/eval.py:37-86). Here the physics runs in JAX, but
MuJoCo is installed for the golden tests — so rendering is a replay: export
the env's RobotSpec to MJCF (the same exporter the goldens validate), write
recorded qpos frames into MjData, and rasterize offscreen through EGL
(libEGL_mesa, no display needed). Task markers (footstep targets, terrain
boxes, remaining plan) are injected as decorative scene geoms, the analog of
the reference's MarkerDrawer (/root/reference/envs/common/marker_drawer.py).

Falls back gracefully: rl/render.py tries this first and keeps the
matplotlib stick-figure path when no GL stack is available.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_GL_OK: bool | None = None


def gl_available() -> bool:
    """One EGL context creation probe, cached for the process."""
    global _GL_OK
    if _GL_OK is None:
        os.environ.setdefault("MUJOCO_GL", "egl")
        try:
            import mujoco

            ctx = mujoco.GLContext(64, 64)
            ctx.free()
            _GL_OK = True
        except Exception:
            _GL_OK = False
    return _GL_OK


def _add_geom(scn, gtype, size, pos, rgba, mat=None):
    import mujoco

    if scn.ngeom >= scn.maxgeom:
        return None
    g = scn.geoms[scn.ngeom]
    mujoco.mjv_initGeom(
        g,
        gtype,
        np.asarray(size, np.float64),
        np.asarray(pos, np.float64),
        (np.eye(3) if mat is None else np.asarray(mat, np.float64)).flatten(),
        np.asarray(rgba, np.float32),
    )
    scn.ngeom += 1
    return g


def _add_connector(scn, p0, p1, width, rgba):
    import mujoco

    g = _add_geom(scn, mujoco.mjtGeom.mjGEOM_CAPSULE, np.zeros(3), np.zeros(3), rgba)
    if g is not None:
        mujoco.mjv_connector(
            g, mujoco.mjtGeom.mjGEOM_CAPSULE, width,
            np.asarray(p0, np.float64), np.asarray(p1, np.float64),
        )


def _yaw_mat(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _draw_markers(scn, m: dict) -> None:
    """Footstep targets / plan / terrain boxes as decorative geoms
    (marker_drawer.py:7-72; jvrc_step draws the t1/t2 target spheres)."""
    import mujoco

    if "terrain_pos" in m:
        yaws = m.get("terrain_yaw")
        for ti, (p, s) in enumerate(zip(m["terrain_pos"], m["terrain_size"])):
            if abs(p[0]) > 20 or abs(p[1]) > 20:
                continue  # parked (inactive) boxes
            rot = _yaw_mat(float(yaws[ti])) if yaws is not None else None
            _add_geom(scn, mujoco.mjtGeom.mjGEOM_BOX, s, p, (0.55, 0.50, 0.45, 1.0), rot)
    if "sequence" in m:
        for p in m["sequence"]:
            _add_geom(
                scn, mujoco.mjtGeom.mjGEOM_SPHERE, (0.02, 0, 0),
                (p[0], p[1], p[2] + 0.02), (0.2, 0.7, 0.3, 0.5),
            )
    if "targets" in m:
        for k, rgba in enumerate([(1.0, 0.55, 0.1, 0.9), (0.15, 0.75, 0.25, 0.7)]):
            t = m["targets"][k]
            _add_geom(
                scn, mujoco.mjtGeom.mjGEOM_SPHERE, (0.04, 0, 0),
                (t[0], t[1], t[2] + 0.04), rgba,
            )
            # heading tick on the target
            d = np.array([np.cos(t[3]), np.sin(t[3]), 0.0]) * 0.12
            _add_connector(scn, (t[0], t[1], t[2] + 0.04), np.asarray(t[:3]) + d + (0, 0, 0.04), 0.008, rgba)


def render_trajectory_gl(
    env,
    qpos_traj: np.ndarray,
    out_path: str | Path,
    fps: int = 40,
    markers=None,
    width: int = 640,
    height: int = 480,
) -> Path:
    """Render a (T, nq) qpos trajectory to mp4/gif via MuJoCo offscreen EGL.

    The robot's collision geoms render with materials; bodies without geoms
    get a capsule skeleton (connector geoms along the kinematic tree) so the
    full morphology is visible. A tracking camera follows the root."""
    os.environ.setdefault("MUJOCO_GL", "egl")
    import imageio
    import mujoco

    from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf

    out_path = Path(out_path)
    floor_z = 0.0
    hf_spec = hf_heights = None
    hf_zmax = 1e-6
    if markers is not None and markers and markers[0]:
        floor_z = float(markers[0].get("floor_z", 0.0))
        if "hfield" in markers[0]:
            # episode heightfield (jvrc_walk_rough) as a real MuJoCo hfield
            # asset. Mid-episode re-jitters are re-uploaded per frame below,
            # so the asset's zmax must cover every frame's field, not just
            # frame 0's.
            hf_heights = np.asarray(markers[0]["hfield"], np.float64)
            x0y0 = np.asarray(markers[0]["hfield_x0y0"], np.float64)
            cell = np.asarray(markers[0]["hfield_cell"], np.float64)
            nrow, ncol = hf_heights.shape
            rx, ry = (ncol - 1) * cell[0] / 2.0, (nrow - 1) * cell[1] / 2.0
            for mk in markers:
                if mk and "hfield" in mk:
                    hf_zmax = max(hf_zmax, float(np.asarray(mk["hfield"]).max()))
            hf_spec = (nrow, ncol, rx, ry, hf_zmax, x0y0[0] + rx, x0y0[1] + ry)
    xml = export_mjcf(env.spec, with_floor=True, floor_z=floor_z, visual=True, hfield=hf_spec)
    m = mujoco.MjModel.from_xml_string(xml)
    if hf_heights is not None:
        m.hfield_data[:] = (hf_heights / hf_zmax).ravel()
    if m.nq != qpos_traj.shape[1]:
        raise ValueError(f"exported model nq={m.nq} != trajectory nq={qpos_traj.shape[1]}")
    d = mujoco.MjData(m)
    renderer = mujoco.Renderer(m, height, width)

    cam = mujoco.MjvCamera()
    mujoco.mjv_defaultCamera(cam)
    cam.azimuth, cam.elevation, cam.distance = 135.0, -18.0, 2.8

    parent = np.asarray(env.model.body_parent)
    skel_rgba = (0.45, 0.55, 0.75, 1.0)
    lookat = None
    frames = []
    try:
        for t in range(qpos_traj.shape[0]):
            d.qpos[:] = qpos_traj[t]
            mujoco.mj_forward(m, d)
            root = d.xpos[1].copy()
            # critically-damped-ish camera follow
            lookat = root if lookat is None else 0.85 * lookat + 0.15 * root
            cam.lookat[:] = lookat + np.array([0.0, 0.0, -0.15])
            renderer.update_scene(d, cam)
            scn = renderer.scene
            for bi in range(2, env.model.nbody):
                p = parent[bi]
                if p <= 0:
                    continue
                if np.linalg.norm(d.xpos[bi] - d.xpos[p]) > 1e-4:
                    _add_connector(scn, d.xpos[p], d.xpos[bi], 0.025, skel_rgba)
            mk = markers[t] if markers is not None and t < len(markers) and markers[t] else None
            if mk is not None:
                if hf_heights is not None and "hfield" in mk:
                    # jvrc_walk_rough re-jitters terrain mid-episode; keep the
                    # rendered hfield in sync with what the physics used.
                    fh = np.asarray(mk["hfield"], np.float64)
                    if fh.shape == hf_heights.shape and not np.array_equal(fh, hf_heights):
                        hf_heights = fh
                        m.hfield_data[:] = (fh / hf_zmax).ravel()
                        mujoco.mjr_uploadHField(m, renderer._mjr_context, 0)
                _draw_markers(scn, mk)
            frames.append(renderer.render().copy())
    finally:
        renderer.close()

    out_path.parent.mkdir(parents=True, exist_ok=True)
    if out_path.suffix == ".gif":
        imageio.mimsave(out_path, frames, fps=min(fps, 25))
    else:
        imageio.mimsave(out_path, frames, fps=fps)
    return out_path
