"""Contact behavior verification tool.

Analog of /root/reference/scripts/test_contact_behavior.py: settle each
registered humanoid env under zero action and report contact counts, per-foot
GRF, and settled heights — the golden tool for validating engine changes.
With --mujoco, also runs the same robot in the real MuJoCo binary (via the
MJCF exporter) and prints both side by side.

Usage: python scripts/contact_behavior.py [--envs jvrc_walk h1] [--seconds 5] [--mujoco]
"""

from __future__ import annotations

import argparse

import numpy as np


def settle_env(name: str, seconds: float):
    import jax
    import jax.numpy as jnp

    from learninghumanoidwalking_tpu.envs import make_env

    env = make_env(name)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    steps = int(seconds / env.control_dt)

    @jax.jit
    def roll(state):
        def body(s, _):
            s = env.step(s, jnp.zeros(env.action_size))
            return s, None

        return jax.lax.scan(body, state, None, length=steps)[0]

    s = roll(state)
    ncon = int(jnp.sum(s.physics.contact.mask))
    l_grf, r_grf = env._foot_grf(s.physics)
    print(f"[{name}] after {seconds}s zero-action:")
    print(f"  active contacts: {ncon} / {env.model.ncon}")
    print(f"  GRF: left {float(l_grf):8.2f} N  right {float(r_grf):8.2f} N  (mg = {env.robot_mass * 9.81:.1f})")
    print(f"  root z: {float(s.physics.qpos[2]):.4f}  done: {bool(s.done)}")
    return s


def settle_mujoco(name: str, seconds: float):
    import mujoco

    from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf

    if name.startswith("jvrc"):
        from learninghumanoidwalking_tpu.models.jvrc import HALF_SITTING_POSE_DEG, NOMINAL_HEIGHT, jvrc_spec

        spec, pose, z0 = jvrc_spec(), np.deg2rad(HALF_SITTING_POSE_DEG), NOMINAL_HEIGHT
    else:
        from learninghumanoidwalking_tpu.models.h1 import HALF_SITTING_POSE, NOMINAL_HEIGHT, h1_spec

        spec, pose, z0 = h1_spec(), np.asarray(HALF_SITTING_POSE), NOMINAL_HEIGHT

    model = mujoco.MjModel.from_xml_string(export_mjcf(spec))
    data = mujoco.MjData(model)
    data.qpos[:] = np.concatenate([[0, 0, z0], [1, 0, 0, 0], pose])
    mujoco.mj_forward(model, data)
    for _ in range(int(seconds / model.opt.timestep)):
        mujoco.mj_step(model, data)
    grf = 0.0
    for ci in range(data.ncon):
        f6 = np.zeros(6)
        mujoco.mj_contactForce(model, data, ci, f6)
        grf += np.linalg.norm(f6[:3])
    print(f"  [mujoco] ncon {data.ncon}  total GRF {grf:.2f} N  root z {data.qpos[2]:.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=["jvrc_walk", "h1", "jvrc_step"])
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--mujoco", action="store_true")
    args = p.parse_args()
    for name in args.envs:
        settle_env(name, args.seconds)
        if args.mujoco:
            try:
                settle_mujoco(name, args.seconds)
            except ImportError:
                print("  [mujoco] not available")
