"""Standing balance task (H1).

Functional re-design of /root/reference/tasks/standing_task.py: stateless —
reward and termination are pure functions of the physics state. Weights and
thresholds match standing_task.py:49-131.
"""

from __future__ import annotations

import jax.numpy as jnp

REWARD_NAMES = (
    "com_vel_error",
    "yaw_vel_error",
    "height",
    "upperbody",
    "joint_torque_reward",
    "posture",
)

TARGET_ROOT_H = 0.98


def compute_reward(
    neutral_pose: jnp.ndarray,
    root_vel_local_xy: jnp.ndarray,
    yaw_vel: jnp.ndarray,
    root_height: jnp.ndarray,
    head_offset_in_base_xy: jnp.ndarray,  # head position in the root frame, xy
    pose: jnp.ndarray,
    torque: jnp.ndarray,
) -> jnp.ndarray:
    fwd_vel_err = jnp.linalg.norm(root_vel_local_xy)
    height_err = jnp.abs(root_height - TARGET_ROOT_H)
    upper_err = jnp.linalg.norm(head_offset_in_base_xy)
    posture_err = jnp.linalg.norm(pose - neutral_pose)
    tau_err = jnp.linalg.norm(torque)
    return jnp.stack(
        [
            0.3 * jnp.exp(-4.0 * jnp.square(fwd_vel_err)),
            0.3 * jnp.exp(-4.0 * jnp.square(yaw_vel)),
            0.1 * jnp.exp(-0.5 * jnp.square(height_err)),
            0.1 * jnp.exp(-40.0 * jnp.square(upper_err)),
            0.1 * jnp.exp(-5e-5 * jnp.square(tau_err)),
            0.1 * jnp.exp(-1.0 * jnp.square(posture_err)),
        ]
    )


def done(root_height: jnp.ndarray, self_collision: jnp.ndarray) -> jnp.ndarray:
    """Terminate outside z in (0.9, 1.4) or on self-collision
    (standing_task.py:109-131)."""
    return jnp.logical_or(
        jnp.logical_or(root_height < 0.9, root_height > 1.4), self_collision
    )
