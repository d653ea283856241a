"""Training throughput/quality benchmark harness with A/B comparison.

Analog of /root/reference/scripts/benchmark_training.py: runs a scripted
training session, records per-iteration fps / reward / losses, saves JSON,
and compares two result files (e.g. across branches or engine variants).

Usage:
  python scripts/benchmark_training.py run --env cartpole --n-itr 50 --out /tmp/bench_a.json
  python scripts/benchmark_training.py compare /tmp/bench_a.json /tmp/bench_b.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run(args) -> None:
    import jax

    from learninghumanoidwalking_tpu.envs import make_env
    from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig

    env = make_env(args.env)
    cfg = PPOConfig(
        num_envs=args.num_envs,
        rollout_len=args.rollout_len,
        minibatch_size=args.minibatch_size,
        max_traj_len=args.max_traj_len,
        seed=args.seed,
        input_norm_iters=2,
    )
    ppo = PPO(env, cfg)
    ts = ppo.init_state(jax.random.PRNGKey(args.seed))
    if env.obs_mean is None:
        for _ in range(cfg.input_norm_iters):
            ts = ppo._warmup_iter(ts)

    records = []
    t_start = time.time()
    for itr in range(args.n_itr):
        t0 = time.time()
        ts, metrics = ppo._train_iter(ts)
        reward = float(metrics["mean_reward"])
        dt = time.time() - t0
        fps = cfg.batch_size / dt
        records.append({"itr": itr, "fps": fps, "mean_reward": reward, "iter_time": dt})
        if itr % 10 == 0:
            print(f"itr {itr}: fps {fps:,.0f} reward {reward:.3f}", flush=True)

    result = {
        "env": args.env,
        "config": vars(args),
        "total_time": time.time() - t_start,
        "avg_fps": sum(r["fps"] for r in records[1:]) / max(len(records) - 1, 1),
        "final_reward": records[-1]["mean_reward"],
        "records": records,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"avg fps {result['avg_fps']:,.0f} | final reward {result['final_reward']:.3f} | saved {args.out}")


def compare(path_a: str, path_b: str) -> None:
    a, b = json.load(open(path_a)), json.load(open(path_b))
    print(f"{'metric':20s} {'A':>14s} {'B':>14s} {'B/A':>8s}")
    for key in ("avg_fps", "final_reward", "total_time"):
        va, vb = a[key], b[key]
        ratio = vb / va if va else float("nan")
        print(f"{key:20s} {va:14.2f} {vb:14.2f} {ratio:8.3f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare(sys.argv[2], sys.argv[3])
        sys.exit(0)
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["run"])
    p.add_argument("--env", default="cartpole")
    p.add_argument("--n-itr", type=int, default=50)
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--minibatch-size", type=int, default=2048)
    p.add_argument("--max-traj-len", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="/tmp/bench_result.json")
    run(p.parse_args())
