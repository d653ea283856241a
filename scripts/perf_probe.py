"""On-chip decomposition of where a PPO iteration's time goes.

Times each stage of the pipeline in isolation on the real TPU so the
optimization work targets the actual bottleneck instead of a guess:
  - sample:      ppo._sample_iter        (headline rollout path)
  - optimize:    ppo._optimize_iter      (minibatched PPO update)
  - kernel:      raw physics mega-kernel, rollout_len control steps
  - nets:        actor+critic forwards at rollout batch
  - gradstep:    one grad+adam step on a fixed (no-gather) minibatch x48
  - gather:      the 48 random-minibatch gathers alone

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
"""

from __future__ import annotations

import json
import os
import time

NUM_ENVS = 32768
ROLLOUT_LEN = 16


def timed(fn, fetch, n=3):
    # the warm call MUST fetch: axon dispatch is async and block_until_ready
    # is unreliable (CLAUDE.md), so an unfetched warm call leaks its whole
    # compile into the first timed iteration (observed: a 290 s cold compile
    # charged to the "execution" average)
    fetch(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        fetch(fn())
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache

    for base in (
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        "/tmp/lhw_jax_cache2",
    ):
        if enable_compile_cache(base, min_compile_secs=1.0) is not None:
            break

    from learninghumanoidwalking_tpu.envs import make_env
    from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig

    env = make_env("jvrc_walk")
    cfg = PPOConfig(num_envs=NUM_ENVS, rollout_len=ROLLOUT_LEN, minibatch_size=32768, max_traj_len=400)
    ppo = PPO(env, cfg)
    ts = ppo.init_state(jax.random.PRNGKey(0))
    out = {}

    # ---- sample segment
    holder = {"ts": ts}

    def run_sample():
        ts2, batch, k_upd, rm = ppo._sample_iter(holder["ts"])
        holder["ts"] = ts2
        holder["batch"] = batch
        holder["k"] = k_upd
        return rm

    dt = timed(run_sample, lambda rm: float(rm["mean_reward"]), n=5)
    out["sample_ms"] = round(dt * 1e3, 1)
    out["sample_steps_per_s"] = round(NUM_ENVS * ROLLOUT_LEN / dt, 0)

    # ---- optimize segment (donates its ts: re-sample each time)
    def run_opt():
        ts2, batch, k_upd, rm = ppo._sample_iter(holder["ts"])
        holder["ts"], aux = ppo._optimize_iter(ts2, batch, k_upd)
        return aux

    dt_both = timed(run_opt, lambda aux: float(aux["actor_loss"]), n=3)
    out["optimize_ms"] = round((dt_both - dt) * 1e3, 1)
    out["train_fps"] = round(NUM_ENVS * ROLLOUT_LEN / dt_both, 0)

    # ---- raw kernel: rollout_len control steps, no policy/task
    from learninghumanoidwalking_tpu.ops import substep_kernel as sk
    from learninghumanoidwalking_tpu.physics.model import default_dyn_params

    model = env.model
    import numpy as np

    qpos = jnp.asarray(np.tile(np.asarray(env.nominal_qpos, np.float32)[None], (NUM_ENVS, 1)))
    qvel = jnp.zeros((NUM_ENVS, model.nv))
    tgt = jnp.asarray(np.tile(np.asarray(env.neutral_pose, np.float32)[None], (NUM_ENVS, 1)))
    p1 = default_dyn_params(model, env.kp, env.kd)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (NUM_ENVS,) + x.shape), p1)
    from learninghumanoidwalking_tpu.physics import engine as eng

    state0 = jax.jit(jax.vmap(lambda q, v: eng.make_state(model, q, v)))(qpos, qvel)

    @jax.jit
    def kernel_rollout(s):
        def step(s, _):
            s2 = sk.pd_substeps_kernel(model, params, s, tgt, env.frame_skip, env.sim_dt)
            return s2, ()

        s, _ = jax.lax.scan(step, s, None, length=ROLLOUT_LEN)
        return s

    dt = timed(lambda: kernel_rollout(state0), lambda s: float(s.qpos[0, 2]), n=3)
    out["kernel_ms"] = round(dt * 1e3, 1)
    out["kernel_steps_per_s"] = round(NUM_ENVS * ROLLOUT_LEN / dt, 0)

    # ---- full env step (kernel + pre/post: task/obs/reward/DR/RNG), no nets,
    # no auto-reset, no GAE: isolates the env-side overhead above the kernel
    env_state0 = holder["ts"].env_state

    @jax.jit
    def env_rollout(s):
        def step(s, _):
            s2 = env.step_batch(s, jnp.zeros((NUM_ENVS, env.action_size)))
            return s2, ()

        s, _ = jax.lax.scan(step, s, None, length=ROLLOUT_LEN)
        return s

    dt = timed(lambda: env_rollout(env_state0), lambda s: float(s.reward[0]), n=3)
    out["envstep_ms"] = round(dt * 1e3, 1)
    out["envstep_steps_per_s"] = round(NUM_ENVS * ROLLOUT_LEN / dt, 0)

    # ---- nets at rollout batch: actor + 2 critic forwards x rollout_len
    obs = holder["ts"].env_state.obs

    @jax.jit
    def nets(o):
        def step(acc, _):
            m, ls = ppo._policy(holder["ts"].actor_params, holder["ts"].norm, o)
            v1 = ppo._value(holder["ts"].critic_params, holder["ts"].norm, o)
            v2 = ppo._value(holder["ts"].critic_params, holder["ts"].norm, o + acc[:, None])
            return acc + m[:, 0] * 0 + v1 * 0 + v2 * 0, ()

        acc, _ = jax.lax.scan(step, jnp.zeros(o.shape[:1]), None, length=ROLLOUT_LEN)
        return acc

    dt = timed(lambda: nets(obs), lambda a: float(a[0]), n=3)
    out["nets3x_ms"] = round(dt * 1e3, 1)

    # ---- gradstep x48 on a fixed contiguous minibatch (no gather)
    batch = holder["batch"]
    flat = jax.tree.map(lambda x: x.reshape((cfg.batch_size,) + x.shape[2:]) if x is not None else x, batch)
    mb0 = (
        flat.obs[: cfg.minibatch_size],
        flat.actions[: cfg.minibatch_size],
        flat.log_probs[: cfg.minibatch_size],
        flat.advantages[: cfg.minibatch_size],
        flat.returns[: cfg.minibatch_size],
    )
    import optax

    @jax.jit
    def gradsteps(ap, cp, ao, co):
        def one(carry, _):
            ap, cp, ao, co = carry
            gfn = jax.value_and_grad(ppo._loss_fn, argnums=(0, 1), has_aux=True)
            (l, aux), (ag, cg) = gfn(ap, cp, holder["ts"].norm, mb0)
            au, ao = ppo.actor_tx.update(ag, ao, ap)
            ap = optax.apply_updates(ap, au)
            cu, co = ppo.critic_tx.update(cg, co, cp)
            cp = optax.apply_updates(cp, cu)
            return (ap, cp, ao, co), aux["actor_loss"]

        (ap, cp, ao, co), losses = jax.lax.scan(one, (ap, cp, ao, co), None, length=48)
        return losses

    tsx = holder["ts"]
    dt = timed(
        lambda: gradsteps(tsx.actor_params, tsx.critic_params, tsx.actor_opt, tsx.critic_opt),
        lambda l: float(l[-1]),
        n=3,
    )
    out["gradstep48_ms"] = round(dt * 1e3, 1)

    # ---- the 48 gathers alone
    @jax.jit
    def gathers(key):
        def one(acc, k):
            idx = jax.random.permutation(k, cfg.batch_size)[: cfg.minibatch_size]
            return acc + flat.obs[idx].sum() + flat.actions[idx].sum() + flat.advantages[idx].sum(), ()

        acc, _ = jax.lax.scan(one, jnp.zeros(()), jax.random.split(key, 48))
        return acc

    dt = timed(lambda: gathers(jax.random.PRNGKey(1)), lambda a: float(a), n=3)
    out["gather48_ms"] = round(dt * 1e3, 1)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
