"""Throughput benchmark: env steps/sec on the jvrc_walk hot path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
auxiliary fields: end-to-end training fps and an HW-utilization estimate).

The measured quantity is the full on-device sampling path (policy forward +
25 PD+physics substeps per control step + task/reward/obs + auto-reset) for a
batch of jvrc_walk humanoids — the TPU replacement for the reference's
Ray-worker sampling loop whose fps it logs per iteration
(/root/reference/rl/algos/ppo.py:587-595). The reference publishes no numbers
(BASELINE.md); vs_baseline is measured against the driver-set north star of
10M env steps/s (BASELINE.json).
"""

from __future__ import annotations

import json
import time

NUM_ENVS = 32768
ROLLOUT_LEN = 16
BASELINE_TARGET = 10_000_000.0  # env steps/s north star (BASELINE.json)
# v5e peak: 197 TFLOP/s bf16 on the MXU. The physics kernel is VPU fp32
# (elementwise) work, so "MFU" here is a utilization *estimate*: XLA-counted
# flops per second over the bf16 MXU peak — a lower bound on headroom.
V5E_PEAK_FLOPS = 197e12


def _kernel_flops_per_env_substep(model) -> float:
    """Analytic FLOP count of ONE pallas-kernel physics substep for ONE env.

    XLA's cost analysis cannot see inside the pallas custom call, so the
    substep body is traced (tile (1,1) = one env) and its jaxpr's arithmetic
    primitives are counted element-wise. Transcendentals are weighted ~8."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.ops.substep_kernel import _build_substep

    substep, _ = _build_substep(model, 0.001, (1, 1))
    nb, nv, nq, nu = model.nbody, model.nv, model.nq, model.nu
    z = lambda r: jnp.zeros((r, 1, 1))
    ctx = dict(
        damping=z(nv), frictionloss=z(nv), body_mass=z(nb) + 1.0,
        body_ipos=z(3 * nb), xfrc=z(6 * nb),
    )
    nt = model.nterrain
    if nt > 0:
        ctx.update(
            terrain_pos=z(3 * nt), terrain_size=z(3 * nt) + 0.1,
            terrain_cos=z(nt) + 1.0, terrain_sin=z(nt), floor_z=z(1),
        )
    jaxpr = jax.make_jaxpr(lambda q, v, c, ctx: substep(q, v, c, ctx))(
        z(nq), z(nv), z(nu), ctx
    )
    cheap = {"add", "sub", "mul", "max", "min", "and", "or", "select_n", "ne", "lt", "le", "gt", "ge", "neg", "abs", "sign"}
    costly = {"div": 4, "sqrt": 4, "rsqrt": 4, "sin": 8, "cos": 8, "tanh": 8, "exp": 8, "sinc": 12, "integer_pow": 2}
    flops = 0.0

    def visit(jp):
        nonlocal flops
        for eqn in jp.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    visit(sub.jaxpr)
            name = eqn.primitive.name
            size = max((int(np.prod(ov.aval.shape)) for ov in eqn.outvars), default=0)
            if name in cheap:
                flops += size
            elif name in costly:
                flops += costly[name] * size

    visit(jaxpr.jaxpr)
    return flops


def main():
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.envs import make_env
    from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig

    try:  # persistent compile cache (compiles cost minutes on this host)
        jax.config.update("jax_compilation_cache_dir", "/tmp/lhw_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    env = make_env("jvrc_walk")
    cfg = PPOConfig(num_envs=NUM_ENVS, rollout_len=ROLLOUT_LEN, minibatch_size=32768, max_traj_len=400)
    ppo = PPO(env, cfg)
    ts = ppo.init_state(jax.random.PRNGKey(0))

    rollout = jax.jit(lambda ts, key: ppo._rollout(ts, key, False)[2]["reward"].sum())

    key = jax.random.PRNGKey(1)
    # compile + warm up; float() forces a fetch — block_until_ready does not
    # reliably block on the tunneled axon runtime
    float(rollout(ts, key))

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        float(rollout(ts, jax.random.fold_in(key, i)))
    dt = time.perf_counter() - t0

    steps = NUM_ENVS * ROLLOUT_LEN * n_iters
    sps = steps / dt

    # hardware-utilization estimate from XLA's cost analysis of the rollout
    flops_per_call = None
    try:
        cost = jax.jit(lambda ts, key: ppo._rollout(ts, key, False)[2]["reward"].sum()).lower(ts, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_call = float(cost.get("flops", 0.0))
    except Exception:
        pass
    util = round(flops_per_call * n_iters / dt / V5E_PEAK_FLOPS, 4) if flops_per_call else None

    # end-to-end training fps (rollout + GAE + PPO update), one full iteration
    ts2, batch, k_upd, rm = ppo._sample_iter(ts)
    float(rm["mean_reward"])  # compile sample
    ts3, aux = ppo._optimize_iter(ts2, batch, k_upd)
    float(aux["actor_loss"])  # compile optimize
    t0 = time.perf_counter()
    n_train = 3
    for i in range(n_train):
        ts2, batch, k_upd, rm = ppo._sample_iter(ts2)
        ts2, aux = ppo._optimize_iter(ts2, batch, k_upd)
        float(aux["actor_loss"])
    train_fps = NUM_ENVS * ROLLOUT_LEN * n_train / (time.perf_counter() - t0)

    # 25 physics substeps per env step: the headroom-relevant number is how
    # many ns one env-substep costs on the chip (the kernel is VPU fp32
    # elementwise work; XLA's flop count sees through neither the pallas
    # custom call nor VPU-vs-MXU peaks, so hw_utilization_est is a lower
    # bound from the non-kernel ops only)
    substep_ns = 1e9 / (sps * 25.0)
    try:
        kernel_flops = _kernel_flops_per_env_substep(env.model)
        kernel_gflops = kernel_flops * sps * 25.0 / 1e9
    except Exception:
        kernel_flops, kernel_gflops = None, None

    print(
        json.dumps(
            {
                "metric": f"jvrc_walk env steps/sec ({NUM_ENVS} envs, single chip)",
                "value": round(sps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(sps / BASELINE_TARGET, 4),
                "training_fps": round(train_fps, 1),
                "env_substep_ns": round(substep_ns, 2),
                "kernel_flops_per_env_substep": kernel_flops,
                "kernel_gflops": round(kernel_gflops, 1) if kernel_gflops else None,
                "hw_utilization_est": util,
            }
        )
    )


if __name__ == "__main__":
    main()
