"""PD-controlled frame-skipped simulation inner loop.

The control layer between policy and physics: the TPU-native equivalent of
/root/reference/robots/robot_base.py:41-62 + robot_interface.step_pd
(:493-508) — per control step, run `frame_skip` physics substeps at sim_dt,
each applying joint-level PD torque toward the target pose, optional back-EMF
torque damping (tau -= tau_d * omega), divided by gear ratios into actuator
ctrl. Runs as a lax.scan so the whole 25-substep loop lives inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.model import DynParams, Model, PhysicsState


def pd_substeps(
    model: Model,
    dyn: DynParams,
    physics: PhysicsState,
    target: jnp.ndarray,  # (nu,) joint-space position targets
    frame_skip: int,
    sim_dt: float,
    terrain: engine.Terrain | None = None,
) -> PhysicsState:
    def substep(physics, _):
        q = engine.take_rows(physics.qpos, model.actuator_qpos)
        v = engine.take_rows(physics.qvel, model.actuator_dof)
        # tau = kp (p* - p) + kd (0 - v)  (robot_interface.py:493-508 with
        # zero velocity targets, robot_base.py:57)
        tau = dyn.kp * (target - q) - dyn.kd * v
        # back-EMF torque damping (robot_base.py:58; zero unless randomized)
        tau = tau - dyn.bemf_gain * v
        ctrl = tau / model.actuator_gear
        return engine.step(model, dyn, physics, ctrl, sim_dt, terrain), None

    physics, _ = jax.lax.scan(substep, physics, None, length=frame_skip)
    return physics
