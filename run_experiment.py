"""CLI experiment runner: train / eval.

The framework's equivalent of /root/reference/run_experiment.py — same two
subcommands and hyperparameter surface, TPU-native execution: no Ray; the env
batch lives on device and is optionally sharded over a jax.sharding mesh.

  python run_experiment.py train --env jvrc_walk --logdir /tmp/logs
  python run_experiment.py eval --path /tmp/logs
"""

from __future__ import annotations

import argparse
import datetime
import json
import platform
import sys
from pathlib import Path


def enable_compile_cache():
    """Persistent XLA compile cache: humanoid train-step compiles cost
    minutes; cache them across runs. Host-salted — entries compiled on a
    previous physical host segfault on load (utils/cache.py docstring)."""
    import os as _os

    from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache as _enable

    _enable(_os.environ.get("LHW_COMPILE_CACHE", "/tmp/lhw_jax_cache2"), min_compile_secs=5.0)


def system_banner():
    import os as _os

    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS; LHW_PLATFORM=cpu forces the
    # CPU backend the way tests/conftest.py does (debugging, TPU outages).
    if _os.environ.get("LHW_PLATFORM"):
        jax.config.update("jax_platforms", _os.environ["LHW_PLATFORM"])
    enable_compile_cache()
    print("=" * 60)
    print(f"python {platform.python_version()} | jax {jax.__version__}")
    print(f"devices: {jax.devices()}")
    print(f"default backend: {jax.default_backend()}")
    print("=" * 60, flush=True)


def build_train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train")
    p.add_argument("--env", required=True, type=str)
    p.add_argument("--logdir", default=Path("/tmp/logs"), type=Path)
    p.add_argument("--n-itr", type=int, default=20000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eps", type=float, default=1e-5)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--lam", type=float, default=0.95)
    p.add_argument("--std-dev", type=float, default=0.223)
    p.add_argument("--learn-std", action="store_true")
    p.add_argument("--entropy-coeff", type=float, default=0.0)
    p.add_argument("--clip", type=float, default=0.2)
    p.add_argument("--minibatch-size", type=int, default=4096)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--num-envs", type=int, default=1024, help="parallel on-device envs (replaces --num-procs)")
    p.add_argument("--rollout-len", type=int, default=64, help="steps per env per iteration")
    p.add_argument("--max-grad-norm", type=float, default=0.5)
    p.add_argument("--max-traj-len", type=int, default=400)
    p.add_argument("--no-mirror", action="store_true")
    p.add_argument("--mirror-coeff", type=float, default=0.4)
    p.add_argument("--eval-freq", type=int, default=100)
    p.add_argument("--continued", type=Path, default=None, help="logdir of a run to resume")
    p.add_argument("--recurrent", action="store_true")
    p.add_argument("--imitate", type=str, default=None, help="logdir of an expert run to imitate")
    p.add_argument("--imitate-coeff", type=float, default=0.3)
    p.add_argument("--yaml", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-devices", type=int, default=None, help="mesh size (default: all devices)")
    p.add_argument(
        "--profile-dir",
        type=Path,
        default=None,
        help="capture a jax.profiler trace of training iterations 2-4 into "
        "this directory (view with tensorboard or xprof)",
    )
    return p


def train(argv):
    args = build_train_parser().parse_args(argv)
    system_banner()

    import jax

    from learninghumanoidwalking_tpu.envs import make_env
    from learninghumanoidwalking_tpu.parallel.mesh import make_mesh, shard_train_state
    from learninghumanoidwalking_tpu.rl.checkpoint import Checkpointer
    from learninghumanoidwalking_tpu.rl.logger import TrainingLogger
    from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig

    env = make_env(args.env, args.yaml)
    cfg = PPOConfig(
        n_itr=args.n_itr,
        lr=args.lr,
        eps=args.eps,
        gamma=args.gamma,
        lam=args.lam,
        std_dev=args.std_dev,
        learn_std=args.learn_std,
        entropy_coeff=args.entropy_coeff,
        clip=args.clip,
        minibatch_size=args.minibatch_size,
        epochs=args.epochs,
        num_envs=args.num_envs,
        rollout_len=args.rollout_len,
        max_traj_len=args.max_traj_len,
        mirror_coeff=args.mirror_coeff,
        use_mirror=not args.no_mirror,
        imitate_coeff=args.imitate_coeff,
        eval_freq=args.eval_freq,
        recurrent=args.recurrent,
        seed=args.seed,
    )

    run_dir = Path(args.logdir) / f"{args.env}-{datetime.datetime.now():%Y%m%d-%H%M%S}"
    run_dir.mkdir(parents=True, exist_ok=True)
    print(f"logging to {run_dir}")

    # imitation expert (reference ppo.py:111-122)
    imitation_projector = expert_apply = expert_params = None
    if args.imitate:
        from learninghumanoidwalking_tpu.rl.eval import load_expert

        expert_apply, expert_params, _ = load_expert(Path(args.imitate))
        projector_factory = getattr(env, "imitation_projector", None)
        imitation_projector = projector_factory() if callable(projector_factory) else None
        if imitation_projector is None:
            raise ValueError(f"--imitate passed but env {args.env} has no imitation_projector()")

    ppo = PPO(
        env,
        cfg,
        imitation_projector=imitation_projector,
        expert_apply=expert_apply,
        expert_params=expert_params,
    )

    checkpointer = Checkpointer(run_dir)
    checkpointer.save_experiment({"env": args.env, "yaml": args.yaml, **vars(args), "obs_size": env.obs_size, "action_size": env.action_size})
    logger = TrainingLogger(run_dir)

    init_ts = ppo.init_state(jax.random.PRNGKey(args.seed))
    if args.continued:
        # accept either a run dir or a logdir parent — auto-discover the
        # latest run with checkpoints, the same way eval resolves --path
        # (run_experiment.py:49-84 in the reference)
        from learninghumanoidwalking_tpu.rl.checkpoint import find_latest_run

        resume_dir = find_latest_run(args.continued)
        if resume_dir is None:
            raise FileNotFoundError(f"no runs with checkpoints under {args.continued}")
        init_ts = Checkpointer(resume_dir).restore(init_ts)
        print(f"resumed from {resume_dir} at iteration {int(init_ts.iteration)}")

    mesh = make_mesh(args.n_devices)
    if len(mesh.devices.flat) > 1:
        init_ts = shard_train_state(init_ts, mesh, cfg.num_envs)
        print(f"sharding {cfg.num_envs} envs over {len(mesh.devices.flat)} devices")

    ppo.train(
        n_itr=args.n_itr,
        logger=logger,
        checkpointer=checkpointer,
        init_ts=init_ts,
        profile_dir=str(args.profile_dir) if args.profile_dir else None,
    )


def evaluate(argv):
    p = argparse.ArgumentParser("eval")
    p.add_argument("--path", required=True, type=Path, help="run logdir (or parent of runs)")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--max-steps", type=int, default=400)
    p.add_argument("--out", type=Path, default=None, help="where to write the trajectory npz / mp4")
    p.add_argument("--deterministic", action="store_true", default=True)
    p.add_argument("--view", action="store_true",
                   help="live interactive viewer (needs a display; space pauses)")
    p.add_argument("--no-realtime", action="store_true",
                   help="with --view: run as fast as possible instead of real-time pacing")
    args = p.parse_args(argv)
    system_banner()

    if args.view:
        from learninghumanoidwalking_tpu.rl.viewer import view_policy

        view_policy(args.path, episodes=args.episodes, max_steps=args.max_steps,
                    realtime=not args.no_realtime)
        return

    from learninghumanoidwalking_tpu.rl.eval import evaluate_policy

    evaluate_policy(args.path, episodes=args.episodes, max_steps=args.max_steps, out=args.out)


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in ("train", "eval"):
        print("usage: run_experiment.py {train,eval} ...", file=sys.stderr)
        sys.exit(2)
    mode, rest = sys.argv[1], sys.argv[2:]
    if mode == "train":
        train(rest)
    else:
        evaluate(rest)
