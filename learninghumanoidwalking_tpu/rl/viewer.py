"""Interactive live policy viewer (mujoco.viewer passive window).

The reference evaluates policies in an on-screen interactive viewer with
real-time pacing and pause-on-space (/root/reference/rl/utils/eval.py:37-86,
/root/reference/envs/common/mujoco_env.py:48-52). Here the physics runs in
JAX, so the live window is a *mirror*: each control step the JAX env advances
the real simulation, the resulting qpos is written into an MjData built from
the env's exported MJCF (the same exporter the golden tests validate), and a
`mujoco.viewer.launch_passive` window syncs it. Task markers (footstep
targets, terrain boxes) render into `viewer.user_scn` exactly like the
offscreen path (rl/render_gl.py::_draw_markers).

This needs a display (GLFW); on the headless TPU host `view_policy` raises a
clear error pointing at the offscreen `--out video.mp4` path instead. The
pacing/pause loop itself is display-free and unit-tested with a fake viewer
(tests/test_evaluation.py).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np


class ViewerLoop:
    """Real-time-paced policy->sim->sync loop, decoupled from GLFW.

    `viewer` needs: is_running() -> bool, sync(), and optionally user_scn.
    Pause is toggled externally (the space-key callback flips `paused`,
    mirroring mujoco_env.py:48-52); while paused the loop idles without
    advancing physics but keeps syncing so the camera stays live.
    """

    def __init__(self, control_dt: float, realtime: bool = True,
                 sleep_fn=time.sleep, clock=time.monotonic):
        self.control_dt = float(control_dt)
        self.realtime = realtime
        self.paused = False
        self._sleep = sleep_fn
        self._clock = clock

    def toggle_pause(self):
        self.paused = not self.paused

    def run_episode(self, viewer, step_fn, sync_state_fn, max_steps: int) -> int:
        """Advance up to max_steps control steps; returns steps taken.

        step_fn() -> done advances the JAX env one control step;
        sync_state_fn() copies the new qpos into MjData + draws markers.
        """
        t = 0
        while t < max_steps and viewer.is_running():
            if self.paused:
                viewer.sync()
                self._sleep(0.05)
                continue
            start = self._clock()
            done = step_fn()
            sync_state_fn()
            viewer.sync()
            t += 1
            if self.realtime:
                leftover = self.control_dt - (self._clock() - start)
                if leftover > 0:
                    self._sleep(leftover)
            if done:
                break
        return t


def view_policy(path: Path, episodes: int = 3, max_steps: int = 400,
                realtime: bool = True, launch_fn=None):
    """Replay a trained policy in a live interactive window.

    Reference analog: EvaluateEnv.run (rl/utils/eval.py:37-86) — deterministic
    policy, up to `episodes` resets, real-time pacing, space pauses.
    """
    import jax

    from learninghumanoidwalking_tpu.rl.eval import load_policy
    from learninghumanoidwalking_tpu.rl.render_gl import _draw_markers

    apply_fn, params, (env, meta, norm, _, policy) = load_policy(Path(path))
    recurrent = policy is not None

    import mujoco

    if launch_fn is None:
        try:
            import glfw

            if not glfw.init():  # pragma: no cover - needs a display
                raise RuntimeError("GLFW failed to initialize")
            import mujoco.viewer as mj_viewer
        except Exception as e:
            raise RuntimeError(
                "no display for the interactive viewer (headless host?). Use "
                "`run_experiment.py eval --out video.mp4` for offscreen rendering."
            ) from e

    from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf

    xml = export_mjcf(env.spec, with_floor=True, visual=True)
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)

    step = jax.jit(env.step)
    reset = jax.jit(env.reset)
    if recurrent:
        policy_step = jax.jit(lambda carry, obs: apply_fn(params, carry, obs))
    else:
        policy_fn = jax.jit(lambda obs: apply_fn(params, obs))
    get_markers = getattr(env, "render_markers", lambda s: None)

    loop = ViewerLoop(env.control_dt, realtime=realtime)

    def key_callback(key):  # pragma: no cover - needs GLFW
        if key == 32:  # space
            loop.toggle_pause()

    if launch_fn is None:  # pragma: no cover - needs GLFW
        launch_fn = lambda: mj_viewer.launch_passive(m, d, key_callback=key_callback)

    state = None
    carry = None
    total = 0.0

    def step_once():
        nonlocal state, carry, total
        if recurrent:
            carry, action = policy_step(carry, state.obs[None])
            action = action[0]
        else:
            action = policy_fn(state.obs)
        state = step(state, action)
        total += float(state.reward)
        return bool(state.done)

    def sync_state(viewer):
        d.qpos[:] = np.asarray(state.physics.qpos)
        mujoco.mj_forward(m, d)
        scn = getattr(viewer, "user_scn", None)
        if scn is not None:
            scn.ngeom = 0
            mk = get_markers(state)
            if mk:
                _draw_markers(scn, mk)

    try:
        ctx = launch_fn()
    except Exception as e:  # pragma: no cover - needs GLFW
        raise RuntimeError(
            "could not open an interactive viewer window (headless host?). "
            "Use `run_experiment.py eval --out video.mp4` for offscreen rendering."
        ) from e

    with ctx as viewer:
        for ep in range(episodes):
            if not viewer.is_running():
                break
            state = reset(jax.random.PRNGKey(1000 + ep))
            if recurrent:
                carry = policy.init_carry((1,))
            total = 0.0
            n = loop.run_episode(viewer, step_once, lambda: sync_state(viewer), max_steps)
            print(f"episode {ep}: reward {total:.2f}  length {n}")
    return loop
