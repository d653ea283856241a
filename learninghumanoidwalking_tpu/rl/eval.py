"""Policy evaluation / replay.

Replaces /root/reference/rl/utils/eval.py (EvaluateEnv): loads a trained run,
replays the deterministic policy for a few episodes, reports per-episode
rewards, and dumps the qpos trajectory to .npz for offline
visualization/analysis (there is no interactive viewer on a TPU host; the
trajectory file is the rendering artifact).

Recurrent (LSTM) runs are supported: load_policy reads meta["recurrent"] and
rebuilds the matching actor; the returned policy carries its hidden state
explicitly (reference eval builds the net from the pickled module itself,
run_experiment.py:275-276, so it gets this for free — here the architecture
is reconstructed from experiment.json).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl import networks
from learninghumanoidwalking_tpu.rl.checkpoint import Checkpointer, find_latest_run
from learninghumanoidwalking_tpu.rl.normalize import RunningNorm
from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig


def load_policy(path: Path, best: bool = True):
    """Load (apply_fn, params, norm) + experiment meta from a run dir.

    Resolves the latest run under `path` if `path` is a parent directory
    (reference run_experiment.py:49-84 auto-discovery). For feedforward runs
    `apply_fn(params, obs) -> mean`; recurrent runs expose their stepping
    interface through the returned `extras` (see RecurrentPolicy)."""
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
        recurrent=meta.get("recurrent", False),
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

    if cfg.recurrent:
        policy = RecurrentPolicy(ppo, norm)
        apply_fn = policy.apply  # (params, carry, obs) -> (carry, mean)
    else:
        policy = None

        def apply_fn(params, obs):
            mean, _ = ppo.actor_def.apply(params, norm.normalize(obs))
            return mean

    return apply_fn, ts.actor_params, (env, meta, norm, ts, policy)


class RecurrentPolicy:
    """Deterministic LSTM policy stepping interface: explicit hidden carry."""

    def __init__(self, ppo: PPO, norm: RunningNorm):
        self._actor = ppo.actor_def
        self._hidden = ppo.hidden_sizes
        self._norm = norm

    def init_carry(self, batch_shape=(1,)):
        return networks.LSTMCore.initial_carry(self._hidden, batch_shape)

    def apply(self, params, carry, obs):
        carry, (mean, _) = self._actor.apply(params, carry, self._norm.normalize(obs))
        return carry, mean


def load_expert(path: Path, best: bool = True):
    """Load a feedforward expert for imitation (reference ppo.py:111-122).
    Recurrent experts are not supported by the imitation loss path."""
    apply_fn, params, (env, meta, *_rest) = load_policy(path, best=best)
    if meta.get("recurrent", False):
        raise ValueError(f"imitation expert at {path} is recurrent; only FF experts are supported")
    return apply_fn, params, (env, meta)


def evaluate_policy(path: Path, episodes: int = 3, max_steps: int = 400, out: Path | None = None):
    apply_fn, params, (env, meta, norm, _, policy) = load_policy(path)
    recurrent = policy is not None
    print(f"evaluating {meta['env']} policy from {path}" + (" (recurrent)" if recurrent else ""))

    step = jax.jit(env.step)
    reset = jax.jit(env.reset)
    if recurrent:
        policy_step = jax.jit(lambda carry, obs: apply_fn(params, carry, obs))
    else:
        policy_fn = jax.jit(lambda obs: apply_fn(params, obs))

    get_markers = getattr(env, "render_markers", lambda s: None)

    all_qpos, all_markers = [], []
    for ep in range(episodes):
        state = reset(jax.random.PRNGKey(1000 + ep))
        if recurrent:
            carry = policy.init_carry((1,))
        total, qpos_traj, marker_traj = 0.0, [], []
        for t in range(max_steps):
            if recurrent:
                carry, action = policy_step(carry, state.obs[None])
                action = action[0]
            else:
                action = policy_fn(state.obs)
            state = step(state, action)
            total += float(state.reward)
            qpos_traj.append(np.asarray(state.physics.qpos))
            marker_traj.append(get_markers(state))
            if bool(state.done):
                break
        print(f"episode {ep}: reward {total:.2f}  length {t + 1}")
        all_qpos.append(np.stack(qpos_traj))
        all_markers.append(marker_traj)

    if out is not None:
        out = Path(out)
        out.parent.mkdir(parents=True, exist_ok=True)
        if out.suffix in (".mp4", ".gif"):
            from learninghumanoidwalking_tpu.rl.render import render_trajectory

            render_trajectory(env, all_qpos[0], out, markers=all_markers[0])
            print(f"rendered episode 0 to {out}")
        else:
            np.savez(out, **{f"episode_{i}": q for i, q in enumerate(all_qpos)})
            print(f"wrote trajectories to {out}")
    return all_qpos
