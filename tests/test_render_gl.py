"""MuJoCo EGL offscreen rendering of recorded trajectories (the real-3D
analog of the reference's mujoco.Renderer eval videos,
/root/reference/rl/utils/eval.py:37-86). Skipped when no GL stack exists."""

import numpy as np
import pytest

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl import render_gl


pytestmark = pytest.mark.skipif(not render_gl.gl_available(), reason="no EGL/GL stack")


def test_render_gl_jvrc_walk(tmp_path):
    env = make_env("jvrc_walk")
    q = np.tile(env.nominal_qpos[None], (3, 1)).astype(np.float64)
    q[:, 2] += np.linspace(0.0, 0.05, 3)  # distinct frames (GIF dedupes identical ones)
    markers = [
        {
            "mode": "FORWARD",
            "targets": np.array([[0.3, 0.1, 0.0, 0.0], [0.6, -0.1, 0.0, 0.3]]),
            "sequence": np.array([[0.3, 0.1, 0, 0], [0.6, -0.1, 0, 0.3]]),
            "terrain_pos": np.array([[0.5, 0.0, -0.05]]),
            "terrain_size": np.array([[0.2, 0.2, 0.05]]),
            "terrain_yaw": np.array([0.2]),
            "floor_z": 0.0,
        }
    ] * 3
    out = render_gl.render_trajectory_gl(env, q, tmp_path / "clip.gif", markers=markers, width=160, height=120)
    import imageio

    frames = imageio.mimread(out)
    assert len(frames) == 3
    assert frames[0].shape[:2] == (120, 160)
    # the scene is not empty: floor + robot give non-trivial variance
    assert np.asarray(frames[0]).std() > 10.0


def test_render_trajectory_dispatches_to_gl(tmp_path):
    """rl/render.py prefers the GL path when available."""
    from learninghumanoidwalking_tpu.rl.render import render_trajectory

    env = make_env("h1")
    q = np.tile(env.nominal_qpos[None], (2, 1)).astype(np.float64)
    q[1, 2] += 0.05  # distinct frames (GIF dedupes identical ones)
    out = render_trajectory(env, q, tmp_path / "clip.gif")
    import imageio

    frames = imageio.mimread(out)
    # GL frames are (H, W, 3) at the render_gl default 480x640 (the
    # matplotlib fallback draws 400x800 panel pairs)
    assert frames[0].shape[:2] == (480, 640)
