"""Throughput benchmark: env steps/sec on the jvrc_walk hot path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary fields (end-to-end training fps, an on-chip kernel-vs-XLA-engine
correctness check, and a HW-utilization estimate).

The measured quantity is the full on-device sampling path (policy forward +
25 PD+physics substeps per control step + task/reward/obs + auto-reset + GAE)
for a batch of jvrc_walk humanoids — `ppo._sample_iter`, the exact program
every training iteration runs. It is the TPU replacement for the reference's
Ray-worker sampling loop whose fps it logs per iteration
(/root/reference/rl/algos/ppo.py:587-595). The reference publishes no numbers
(BASELINE.md); vs_baseline is measured against the driver-set north star of
10M env steps/s (BASELINE.json).

Wall-clock discipline: the driver runs this under a timeout, and XLA compiles
cost minutes on this 1-core host. Two defenses:
  1. The persistent compilation cache ships WITH the repo (.jax_cache/), so a
     driver run is warm: every jit here hits the on-disk cache.
  2. Every section after the headline measurement checks the remaining
     budget (BENCH_BUDGET_S, default 480 s) against that section's known
     cold-compile cost and is skipped when it would not fit — so the JSON
     line always prints, even fully cold.
"""

from __future__ import annotations

import json
import os
import time

T0 = time.time()
NUM_ENVS = 32768
ROLLOUT_LEN = 16
BASELINE_TARGET = 10_000_000.0  # env steps/s north star (BASELINE.json)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
# v5e peak: 197 TFLOP/s bf16 on the MXU. The physics kernel is VPU fp32
# (elementwise) work, so "MFU" here is a utilization *estimate*: counted
# flops per second over the bf16 MXU peak — a lower bound on headroom.
V5E_PEAK_FLOPS = 197e12
# The unit the kernel actually runs on: the VPU is an (8, 128) vector unit
# with ~4 ALU slots at the ~1.5 GHz core clock -> ~6 TFLOP/s f32 order.
# Counted-flops / this peak is the honest utilization of the elementwise
# pipeline (the MXU-normalized number above is what's on the table only if
# the math were restructured into large matmuls).
V5E_VPU_PEAK_FLOPS = 6.1e12


def _remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def _kernel_flops_per_env_substep(model, reuse: int = 1) -> float:
    """Analytic FLOP count of ONE pallas-kernel physics substep for ONE env,
    AMORTIZED over the factorization-reuse group: substep 0 of each group of
    `reuse` refreshes the mass-matrix Cholesky + contact basis, the next
    reuse-1 substeps reuse it — so the whole group is traced and its flops
    divided by `reuse` (exact per-substep cost of the production path).

    XLA's cost analysis cannot see inside the pallas custom call, so the
    substep body is traced (tile (1,1) = one env) and its jaxpr's arithmetic
    primitives are counted element-wise. Transcendentals are weighted ~8."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.ops.substep_kernel import _build_substep

    substep, _, _ = _build_substep(model, 0.001, (1, 1))
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

    def group(q, v, c, ctx):
        q, v, _, cache = substep(q, v, c, ctx)
        for _ in range(reuse - 1):
            q, v, _, _ = substep(q, v, c, ctx, cache)
        return q, v

    jaxpr = jax.make_jaxpr(group)(z(nq), z(nv), z(nu), ctx)
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
    return flops / max(reuse, 1)


def _kernel_check(env, batch: int = 256) -> dict:
    """Fidelity gate on the production physics path: the Mosaic-COMPILED
    mega-kernel vs the XLA batched engine, on the real chip. Plays the role
    /root/reference/scripts/test_contact_behavior.py:38-143 plays for the
    reference: verify the engine you are about to benchmark.

    Tolerances are set by the measured CROSS-COMPILER reproducibility floor,
    not by test_kernel.py's interpret-mode atol (there both sides run the
    same XLA:CPU math, so 2e-5 is reachable). Two different compilations of
    the projected soft-contact solve — even the SAME batched-engine code on
    XLA:TPU vs XLA:CPU — differ per substep by qvel ~1.6e-2 / GRF ~5% max
    over a 256-env batch (measured, round 4): reassociated sums shift an env
    sitting on a clamp/friction-cone boundary to the other side, an O(1)
    relative force change on that env, while quantiles stay tight (GRF p95
    0.8%). So the gate has two parts, each well-posed across compilers:
      1. dynamic: one noisy control step; qpos max err at the observed floor
         x4 margin, GRF error at p95 (boundary flips live above p95);
      2. settled statics (the reference script's own methodology): 20 control
         steps of PD toward the neutral pose; at equilibrium the solve is
         converged and boundary-insensitive, so positions, engine-vs-engine
         GRF, AND GRF vs the analytic weight m*g are asserted tightly
         (observed: dz 2.3e-4 m, GRF rel 0.24%, vs-weight 0.56%)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.ops import substep_kernel as sk
    from learninghumanoidwalking_tpu.physics import batched, engine
    from learninghumanoidwalking_tpu.physics.model import default_dyn_params

    model = env.model
    rng = np.random.default_rng(0)
    qpos = np.tile(np.asarray(env.nominal_qpos, np.float32)[None], (batch, 1))
    qpos[:, :2] += 0.01 * rng.standard_normal((batch, 2)).astype(np.float32)
    qvel = (0.05 * rng.standard_normal((batch, model.nv))).astype(np.float32)
    target = (
        np.asarray(env.neutral_pose, np.float32)[None]
        + 0.05 * rng.standard_normal((batch, model.nu)).astype(np.float32)
    )
    p1 = default_dyn_params(model, env.kp, env.kd)
    params = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), p1)
    states = jax.vmap(lambda q, v: engine.make_state(model, q, v))(
        jnp.asarray(qpos), jnp.asarray(qvel)
    )
    # both sides run at the env's production reuse interval (they lag the
    # SAME factorization objects at the same substeps, so the cross-compiler
    # tolerances are unchanged) — the gate validates the configuration the
    # headline measurement actually benchmarks
    reuse = getattr(env, "physics_reuse", 1)
    run_k = jax.jit(lambda s, t: sk.pd_substeps_kernel(model, params, s, t, env.frame_skip, env.sim_dt, reuse_interval=reuse))
    run_b = jax.jit(lambda s, t: batched.pd_substeps_batched(model, params, s, t, env.frame_skip, env.sim_dt, reuse_interval=reuse))

    def total_grf(out):
        return jnp.sum(jnp.linalg.norm(out.contact.force, axis=-1) * out.contact.mask, axis=1)

    # part 1: dynamic, one control step from a noisy state
    tgt = jnp.asarray(target)
    out_k, out_b = run_k(states, tgt), run_b(states, tgt)
    q_err = float(jnp.max(jnp.abs(out_k.qpos - out_b.qpos)))
    grf_rel = jnp.abs(total_grf(out_k) - total_grf(out_b)) / (jnp.abs(total_grf(out_b)) + 50.0)
    grf_p95 = float(jnp.quantile(grf_rel, 0.95))

    # part 2: settled statics — 20 more control steps of PD toward neutral
    # (reuses the two compiled programs; no extra compile cost)
    neutral = jnp.broadcast_to(
        jnp.asarray(env.neutral_pose, jnp.float32)[None], (batch, model.nu)
    )
    s_k, s_b = out_k, out_b
    for _ in range(20):
        s_k, s_b = run_k(s_k, neutral), run_b(s_b, neutral)
    dz = float(jnp.max(jnp.abs(s_k.qpos[:, 2] - s_b.qpos[:, 2])))
    sq_err = float(jnp.max(jnp.abs(s_k.qpos - s_b.qpos)))
    fn_k = jnp.sum(s_k.contact.force[..., 0] * s_k.contact.mask, axis=1)
    fn_b = jnp.sum(s_b.contact.force[..., 0] * s_b.contact.mask, axis=1)
    fn_rel = float(jnp.max(jnp.abs(fn_k - fn_b) / (jnp.abs(fn_b) + 1.0)))
    weight = float(np.sum(np.asarray(model.body_mass)) * 9.81)
    vs_weight = float(jnp.abs(jnp.mean(fn_k) - weight) / weight)

    ok = (
        (q_err < 5e-3)
        and (grf_p95 < 0.04)
        and (dz < 2e-3)
        and (sq_err < 8e-3)
        and (fn_rel < 0.02)
        and (vs_weight < 0.03)
    )
    return {
        "kernel_check": "ok" if ok else "FAIL",
        "kernel_check_qpos_maxerr": round(q_err, 8),
        "kernel_check_grf_relerr_p95": round(grf_p95, 5),
        "kernel_check_settled_dz": round(dz, 8),
        "kernel_check_settled_grf_rel": round(fn_rel, 5),
        "kernel_check_settled_grf_vs_weight": round(vs_weight, 5),
    }


def main():
    import jax

    # Repo-local persistent compile cache (shipped in git) so the driver's
    # run is warm; fall back to /tmp if the repo dir is not writable.
    # Host-salted: XLA:CPU entries from a different physical host segfault
    # on load (utils/cache.py docstring), so each host gets its own subdir.
    from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache

    for base in (
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
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

    # ----- headline: full sampling path via the ONE jitted program training
    # uses (float() forces a fetch — block_until_ready is unreliable on the
    # tunneled axon runtime)
    ts, batch, k_upd, rm = ppo._sample_iter(ts)
    float(rm["mean_reward"])  # compile + warm up
    # 20 iterations ≈ 2.5 s of device time: each iteration is only ~0.12 s
    # at 4.4M steps/s, and the per-fetch latency of the tunneled axon
    # runtime is noisy enough to swing a 5-iteration measurement ±15%
    # (observed round 5: 3.2M vs 4.5M on back-to-back runs)
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        ts, batch, k_upd, rm = ppo._sample_iter(ts)
        float(rm["mean_reward"])
    dt = time.perf_counter() - t0
    sps = NUM_ENVS * ROLLOUT_LEN * n_iters / dt

    result = {
        "metric": f"jvrc_walk env steps/sec ({NUM_ENVS} envs, single chip)",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_TARGET, 4),
        # 25 physics substeps per env step
        "env_substep_ns": round(1e9 / (sps * env.frame_skip), 2),
    }

    # ----- extras, in priority order, each gated on the budget it would need
    # fully cold so the JSON line always prints

    # end-to-end training fps (rollout + GAE + PPO update)
    if _remaining() > 60:
        try:
            ts2, aux = ppo._optimize_iter(ts, batch, k_upd)
            float(aux["actor_loss"])  # compile
            n_train = 8
            t0 = time.perf_counter()
            for _ in range(n_train):
                ts2, batch, k_upd, rm = ppo._sample_iter(ts2)
                ts2, aux = ppo._optimize_iter(ts2, batch, k_upd)
                float(aux["actor_loss"])
            train_fps = NUM_ENVS * ROLLOUT_LEN * n_train / (time.perf_counter() - t0)
            result["training_fps"] = round(train_fps, 1)
            result["training_vs_sample"] = round(train_fps / sps, 3)
        except Exception as e:  # never lose the headline
            result["training_fps"] = None
            result["training_error"] = repr(e)[:200]

    # compiled-kernel-vs-XLA-engine correctness gate on the real chip
    if _remaining() > 300:
        try:
            result.update(_kernel_check(env))
        except Exception as e:
            result["kernel_check"] = "error: " + repr(e)[:200]

    # analytic kernel FLOPs -> utilization estimate (host-side tracing)
    if _remaining() > 90:
        try:
            kernel_flops = _kernel_flops_per_env_substep(env.model, reuse=getattr(env, "physics_reuse", 1))
            result["kernel_flops_per_env_substep"] = kernel_flops
            result["kernel_gflops"] = round(kernel_flops * sps * env.frame_skip / 1e9, 1)
            result["hw_utilization_est"] = round(
                kernel_flops * sps * env.frame_skip / V5E_PEAK_FLOPS, 4
            )
            result["vpu_utilization_est"] = round(
                kernel_flops * sps * env.frame_skip / V5E_VPU_PEAK_FLOPS, 4
            )
        except Exception:
            pass

    result["bench_wall_s"] = round(time.time() - T0, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
