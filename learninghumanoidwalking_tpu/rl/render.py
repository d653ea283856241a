"""Offline trajectory rendering (eval video parity).

The reference records eval videos with mujoco.Renderer + imageio
(/root/reference/rl/utils/eval.py:37-86). Preferred path: real 3D offscreen
rendering through MuJoCo + EGL on the exported MJCF (rl/render_gl.py). When
no GL stack is available, videos fall back to matplotlib stick figures from
recorded qpos trajectories: FK gives every body frame, segments connect
parent->child bodies, feet boxes are drawn as their corner outlines.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _fk_points(env, qpos: np.ndarray):
    """Body world positions + foot corner outlines for one frame."""
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.physics import engine
    from learninghumanoidwalking_tpu.physics.spec import _quat_to_mat_np
    from learninghumanoidwalking_tpu.utils import maths

    xpos, xquat = engine.fk(env.model, jnp.asarray(qpos))
    xpos = np.asarray(xpos)
    corners = []
    for gi in env.model.foot_geoms:
        bi = env.model.geom_body[gi]
        rot = np.asarray(maths.quat_to_mat(xquat[bi]))
        gpos = xpos[bi] + rot @ np.asarray(env.model.geom_pos)[gi]
        grot = rot @ _quat_to_mat_np(np.asarray(env.model.geom_quat)[gi])
        size = np.asarray(env.model.geom_size)[gi]
        loop = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1], [-1, -1]], dtype=np.float64)
        pts = np.stack([gpos + grot @ (np.array([sx * size[0], sy * size[1], -size[2]])) for sx, sy in loop])
        corners.append(pts)
    return xpos, corners


def _draw_markers(ax, a, b, m: dict):
    """Overlay task markers on one projection panel (a, b = axis indices).

    The stick-figure analog of the reference's viewer marker geoms
    (/root/reference/envs/common/marker_drawer.py:7-72): footstep targets as
    numbered circles (t1 filled), the remaining plan as dots, terrain boxes
    as rectangles, floor at its (possibly dropped) height."""
    floor_z = m.get("floor_z", 0.0)
    if "terrain_pos" in m:
        tpos, tsize = m["terrain_pos"], m["terrain_size"]
        for p, s in zip(tpos, tsize):
            if abs(p[0]) > 20 or abs(p[1]) > 20:
                continue  # parked (inactive) boxes
            lo_a, hi_a = p[a] - s[a], p[a] + s[a]
            if b == 2:
                lo_b, hi_b = p[2] - s[2], p[2] + s[2]
            else:
                lo_b, hi_b = p[b] - s[b], p[b] + s[b]
            ax.fill(
                [lo_a, hi_a, hi_a, lo_a], [lo_b, lo_b, hi_b, hi_b],
                color="tab:gray", alpha=0.4, lw=0.5, edgecolor="k",
            )
    if "sequence" in m:
        seq = m["sequence"]
        bb = seq[:, 2] if b == 2 else seq[:, b]
        ax.plot(seq[:, a], bb, ".", color="tab:green", ms=3, alpha=0.5)
    if "targets" in m:
        tgt = m["targets"]
        for k, (style, fill) in enumerate([("tab:orange", True), ("tab:green", False)]):
            pa = tgt[k][a]
            pb = tgt[k][2] if b == 2 else tgt[k][b]
            ax.plot(
                pa, pb, "o", ms=8, mfc=style if fill else "none", mec=style, mew=1.5
            )


def render_trajectory(env, qpos_traj: np.ndarray, out_path: str | Path, fps: int = 40, markers=None) -> Path:
    """Render a (T, nq) qpos trajectory to an mp4/gif video.

    Uses the MuJoCo EGL renderer when a GL stack is present (render_gl.py);
    otherwise the matplotlib stick-figure fallback below.

    markers: optional per-frame dicts from env.render_markers (footstep
    targets / terrain boxes / mode text overlays)."""
    from learninghumanoidwalking_tpu.rl import render_gl

    if render_gl.gl_available() and getattr(env, "spec", None) is not None:
        try:
            return render_gl.render_trajectory_gl(env, qpos_traj, out_path, fps=fps, markers=markers)
        except Exception as e:  # fall back to the stick figure
            print(f"GL rendering failed ({e!r}); falling back to stick-figure render")

    import matplotlib

    matplotlib.use("Agg")
    import imageio
    import matplotlib.pyplot as plt

    out_path = Path(out_path)
    parent = env.model.body_parent
    frames = []
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for t in range(qpos_traj.shape[0]):
        xpos, corners = _fk_points(env, qpos_traj[t])
        m = markers[t] if markers is not None and t < len(markers) and markers[t] else None
        for ax, (a, b, alabel, blabel) in zip(
            axes, [(0, 2, "x [m]", "z [m]"), (1, 2, "y [m]", "z [m]")]
        ):
            ax.clear()
            if m is not None:
                _draw_markers(ax, a, b, m)
            for i in range(1, env.model.nbody):
                p = parent[i]
                if p == 0:
                    continue
                ax.plot([xpos[p, a], xpos[i, a]], [xpos[p, b], xpos[i, b]], "o-", color="tab:blue", ms=2, lw=1.5)
            for pts in corners:
                ax.plot(pts[:, a], pts[:, b], "-", color="tab:red", lw=1)
            floor_z = m.get("floor_z", 0.0) if m is not None else 0.0
            ax.axhline(floor_z, color="gray", lw=0.5)
            root = xpos[1]
            ax.set_xlim(root[a] - 1.0, root[a] + 1.0)
            ax.set_ylim(-0.1, 1.9)
            ax.set_aspect("equal")
            ax.set_xlabel(alabel)
            ax.set_ylabel(blabel)
        title = f"t = {t / fps:.2f} s"
        if m is not None and "mode" in m:
            title += f"  [{m['mode']}]"
            if "mode_ref" in m:
                r = m["mode_ref"]
                title += f" ref=({r[0]:+.2f}, {r[1]:+.2f}, {r[2]:+.2f})"
        axes[0].set_title(title)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        frames.append(buf.copy())
    plt.close(fig)

    out_path.parent.mkdir(parents=True, exist_ok=True)
    if out_path.suffix == ".gif":
        imageio.mimsave(out_path, frames, fps=min(fps, 25))
    else:
        imageio.mimsave(out_path, frames, fps=fps)
    return out_path
