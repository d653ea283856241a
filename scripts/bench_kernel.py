"""Raw physics-kernel throughput: one pallas control step (25 substeps),
no policy/task/reset — isolates the kernel from the rollout glue.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_kernel.py [batches...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from learninghumanoidwalking_tpu.utils.cache import enable_compile_cache

    enable_compile_cache("/tmp/lhw_jax_cache2", min_compile_secs=5.0)

    from learninghumanoidwalking_tpu.envs import make_env

    batches = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384, 32768]
    env = make_env("jvrc_walk")
    model = env.model
    frame_skip = env.frame_skip
    sim_dt = env.sim_dt

    from learninghumanoidwalking_tpu.ops.substep_kernel import pd_substeps_kernel
    from learninghumanoidwalking_tpu.physics import batched

    for B in batches:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states = env.reset_batch(keys)
        physics = states.physics
        params = states.dyn
        target = jnp.zeros((B, model.nu))

        n = 32

        @jax.jit
        def run(p, pr, t):
            def body(ph, _):
                ph2 = pd_substeps_kernel(model, pr, ph, t, frame_skip, sim_dt)
                return ph2, ()

            ph, _ = jax.lax.scan(body, p, None, length=n)
            return ph.qpos

        out = run(physics, params, target)
        float(out.sum())
        t0 = time.perf_counter()
        out = run(physics, params, target)
        float(out.sum())
        dt = time.perf_counter() - t0
        sps = B * n / dt
        ns_sub = dt / (B * n * frame_skip) * 1e9
        print(f"B={B:6d}: {sps:12,.0f} env steps/s   {ns_sub:6.1f} ns/env-substep")


if __name__ == "__main__":
    main()
