"""Probe a trained walking policy per commanded mode.

Loads a run (jvrc_walk / h1_walk / jvrc_walk_rough), forces each walking
mode with a fixed velocity reference, rolls the deterministic policy, and
reports achieved root velocity / turn rate / position hold — the
commanded-velocity tracking numbers PERFORMANCE.md quotes (the reference
README demonstrates the same behaviors via its GIFs).

Usage: python scripts/probe_walk_modes.py --path /tmp/lhw_runs [--steps 160]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", type=Path, required=True)
    ap.add_argument("--steps", type=int, default=160)  # 4 s at 40 Hz
    ap.add_argument("--vx", type=float, default=0.3)
    ap.add_argument("--yaw-rate", type=float, default=0.4)
    args = ap.parse_args()

    from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache

    enable_compile_cache("/tmp/lhw_jax_cache2")

    from learninghumanoidwalking_tpu.rl.eval import load_policy
    from learninghumanoidwalking_tpu.tasks import walking
    from learninghumanoidwalking_tpu.utils import maths

    apply_fn, params, (env, meta, norm, _, policy) = load_policy(args.path)
    if policy is not None:
        raise SystemExit("recurrent probe not supported; use a FF run")
    policy_fn = jax.jit(lambda obs: apply_fn(params, obs))
    step = jax.jit(env.step)

    def force(state, mode, ref):
        task = state.task
        if hasattr(task, "walk"):  # RoughWalkState wrapper
            task = task.replace(walk=task.walk.replace(mode=mode, mode_ref=jnp.asarray(ref)))
        else:
            task = task.replace(mode=jnp.asarray(mode), mode_ref=jnp.asarray(ref))
        return state.replace(task=task)

    probes = [
        ("FORWARD", walking.FORWARD, (0.0, args.vx, 0.0)),
        ("INPLACE", walking.INPLACE, (args.yaw_rate, 0.0, 0.0)),
        ("STANDING", walking.STANDING, (0.0, 0.0, 0.0)),
    ]
    for name, mode, ref in probes:
        state = jax.jit(env.reset)(jax.random.PRNGKey(7))
        state = force(state, mode, ref)
        p0 = None
        yaw0 = None
        total_r = 0.0
        for t in range(args.steps):
            action = policy_fn(state.obs)
            state = step(state, action)
            state = force(state, mode, ref)
            total_r += float(state.reward)
            if t == 0:
                p0 = np.asarray(state.physics.qpos[:2])
                yaw0 = float(maths.quat_to_rpy(state.physics.qpos[3:7])[2])
            if bool(state.done):
                print(f"{name}: terminated at step {t}")
                break
        p1 = np.asarray(state.physics.qpos[:2])
        yaw1 = float(maths.quat_to_rpy(state.physics.qpos[3:7])[2])
        dt = (t + 1) * env.control_dt
        disp = p1 - p0
        dyaw = (yaw1 - yaw0 + np.pi) % (2 * np.pi) - np.pi
        print(
            f"{name:9s} ref={ref}: root moved ({disp[0]:+.3f}, {disp[1]:+.3f}) m in {dt:.1f} s "
            f"-> v=({disp[0] / dt:+.3f}, {disp[1] / dt:+.3f}) m/s, yaw_rate={dyaw / dt:+.3f} rad/s, "
            f"height={float(state.physics.qpos[2]):.3f} m, reward/step={total_r / (t + 1):.3f}"
        )


if __name__ == "__main__":
    main()
