"""Offline trajectory rendering (eval video parity).

The reference records eval videos with mujoco.Renderer + imageio
(/root/reference/rl/utils/eval.py:37-86). This image has no GL stack
(osmesa/EGL unavailable), so videos are rendered as matplotlib stick figures
from recorded qpos trajectories: FK gives every body frame, segments connect
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


def render_trajectory(env, qpos_traj: np.ndarray, out_path: str | Path, fps: int = 40) -> Path:
    """Render a (T, nq) qpos trajectory to an mp4/gif stick-figure video."""
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
        for ax, (a, b, alabel, blabel) in zip(
            axes, [(0, 2, "x [m]", "z [m]"), (1, 2, "y [m]", "z [m]")]
        ):
            ax.clear()
            for i in range(1, env.model.nbody):
                p = parent[i]
                if p == 0:
                    continue
                ax.plot([xpos[p, a], xpos[i, a]], [xpos[p, b], xpos[i, b]], "o-", color="tab:blue", ms=2, lw=1.5)
            for pts in corners:
                ax.plot(pts[:, a], pts[:, b], "-", color="tab:red", lw=1)
            ax.axhline(0.0, color="gray", lw=0.5)
            root = xpos[1]
            ax.set_xlim(root[a] - 1.0, root[a] + 1.0)
            ax.set_ylim(-0.1, 1.9)
            ax.set_aspect("equal")
            ax.set_xlabel(alabel)
            ax.set_ylabel(blabel)
        axes[0].set_title(f"t = {t / fps:.2f} s")
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
