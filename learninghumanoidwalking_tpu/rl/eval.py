"""Policy evaluation / replay.

Replaces /root/reference/rl/utils/eval.py (EvaluateEnv): loads a trained run,
replays the deterministic policy for a few episodes, reports per-episode
rewards, and dumps the qpos trajectory to .npz for offline
visualization/analysis (there is no interactive viewer on a TPU host; the
trajectory file is the rendering artifact).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl.checkpoint import Checkpointer, find_latest_run
from learninghumanoidwalking_tpu.rl.normalize import RunningNorm
from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig


def load_policy(path: Path, best: bool = True):
    """Load (apply_fn, params, norm) + experiment meta from a run dir.

    Resolves the latest run under `path` if `path` is a parent directory
    (reference run_experiment.py:49-84 auto-discovery)."""
    run_dir = find_latest_run(path)
    if run_dir is None:
        raise FileNotFoundError(f"no runs found under {path}")
    meta = Checkpointer.load_experiment(run_dir)
    env = make_env(meta["env"], meta.get("yaml"))
    cfg = PPOConfig(
        num_envs=1,
        rollout_len=1,
        std_dev=meta.get("std_dev", 0.223),
        learn_std=meta.get("learn_std", False),
        seed=meta.get("seed", 0) or 0,
    )
    ppo = PPO(env, cfg)
    target = ppo.init_state(jax.random.PRNGKey(0))
    ck = Checkpointer(run_dir)
    try:
        ts = ck.restore(target, best=best)
    except FileNotFoundError:
        ts = ck.restore(target)

    norm = RunningNorm(mean=ts.norm.mean, var=ts.norm.var, count=ts.norm.count)

    def apply_fn(params, obs):
        mean, _ = ppo.actor_def.apply(params, norm.normalize(obs))
        return mean

    return apply_fn, ts.actor_params, (env, meta, norm, ts)


def evaluate_policy(path: Path, episodes: int = 3, max_steps: int = 400, out: Path | None = None):
    apply_fn, params, (env, meta, norm, _) = load_policy(path)
    print(f"evaluating {meta['env']} policy from {path}")

    step = jax.jit(env.step)
    reset = jax.jit(env.reset)
    policy = jax.jit(lambda obs: apply_fn(params, obs))

    all_qpos = []
    for ep in range(episodes):
        state = reset(jax.random.PRNGKey(1000 + ep))
        total, qpos_traj = 0.0, []
        for t in range(max_steps):
            action = policy(state.obs)
            state = step(state, action)
            total += float(state.reward)
            qpos_traj.append(np.asarray(state.physics.qpos))
            if bool(state.done):
                break
        print(f"episode {ep}: reward {total:.2f}  length {t + 1}")
        all_qpos.append(np.stack(qpos_traj))

    if out is not None:
        out = Path(out)
        out.parent.mkdir(parents=True, exist_ok=True)
        if out.suffix in (".mp4", ".gif"):
            from learninghumanoidwalking_tpu.rl.render import render_trajectory

            render_trajectory(env, all_qpos[0], out)
            print(f"rendered episode 0 to {out}")
        else:
            np.savez(out, **{f"episode_{i}": q for i, q in enumerate(all_qpos)})
            print(f"wrote trajectories to {out}")
    return all_qpos
