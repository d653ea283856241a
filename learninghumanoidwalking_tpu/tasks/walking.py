"""Mode-conditioned walking task (STANDING / INPLACE / FORWARD).

Functional re-design of /root/reference/tasks/walking_task.py: task state is a
small pytree (mode, mode_ref, phase), transitions are pure functions with
explicit PRNG keys, and the gait clock is a precomputed table gather. Reward
weights and termination thresholds match walking_task.py:85-192.

Mode encoding (walking_task.py:27-33): FORWARD=[1,0,0], INPLACE=[0,1,0],
STANDING=[0,0,1] -> integer codes FORWARD=0, INPLACE=1, STANDING=2 with
one_hot(mode).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.tasks import rewards

FORWARD, INPLACE, STANDING = 0, 1, 2

REWARD_NAMES = (
    "foot_frc_score",
    "foot_vel_score",
    "root_accel",
    "height_error",
    "com_vel_error",
    "yaw_vel_error",
    "upper_body_reward",
    "posture_error",
    "torque_penalty",
    "action_penalty",
)

# weights summing to 1.0 (walking_task.py:132-146)
WEIGHTS = np.array([0.225, 0.225, 0.050, 0.050, 0.150, 0.150, 0.050, 0.050, 0.025, 0.025], dtype=np.float32)  # host constant: module import must not touch the device


@struct.dataclass
class WalkingState:
    mode: jnp.ndarray  # () int32
    mode_ref: jnp.ndarray  # (3,) [yaw_vel, vx, vy]
    phase: jnp.ndarray  # () int32


def sample_mode_ref(key: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Velocity reference per mode (walking_task.py:35-41)."""
    k1, k2, k3 = jax.random.split(key, 3)
    standing_ref = jax.random.uniform(k1, (3,), minval=-1.0, maxval=1.0)
    inplace_ref = jnp.array([0.0, 0.0, 0.0]).at[0].set(jax.random.uniform(k2, (), minval=-0.5, maxval=0.5))
    forward_ref = jnp.array([0.0, 0.0, 0.0]).at[1].set(jax.random.uniform(k3, (), minval=0.0, maxval=0.4))
    return jnp.select(
        [mode == STANDING, mode == INPLACE], [standing_ref, inplace_ref], forward_ref
    )


def reset(key: jnp.ndarray, period: int) -> WalkingState:
    """Sample mode ~ p=[STANDING .6, INPLACE .2, FORWARD .2] and a random
    phase (walking_task.py:194-205)."""
    k1, k2, k3 = jax.random.split(key, 3)
    mode = jax.random.choice(k1, jnp.array([STANDING, INPLACE, FORWARD]), p=jnp.array([0.6, 0.2, 0.2]))
    return WalkingState(
        mode=mode.astype(jnp.int32),
        mode_ref=sample_mode_ref(k2, mode),
        phase=jax.random.randint(k3, (), 0, period),
    )


def step(key: jnp.ndarray, ts: WalkingState, period: int, dbl_support: jnp.ndarray) -> WalkingState:
    """Phase increment + random mode switches (walking_task.py:149-170)."""
    phase = jnp.mod(ts.phase + 1, period)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # INPLACE <-> STANDING, only in double support, p = 1/100
    in_dbl = jnp.asarray(dbl_support)[phase]
    ev1 = jnp.logical_and(jax.random.randint(k1, (), 0, 100) == 0, in_dbl)
    mode = ts.mode
    toggled1 = jnp.select([mode == INPLACE, mode == STANDING], [STANDING, INPLACE], mode)
    switch1 = jnp.logical_and(ev1, jnp.logical_or(mode == INPLACE, mode == STANDING))
    mode = jnp.where(switch1, toggled1, mode)

    # FORWARD <-> INPLACE, p = 1/200, not while standing
    ev2 = jnp.logical_and(jax.random.randint(k2, (), 0, 200) == 0, mode != STANDING)
    toggled2 = jnp.select([mode == FORWARD, mode == INPLACE], [INPLACE, FORWARD], mode)
    switch2 = jnp.logical_and(ev2, jnp.logical_or(mode == FORWARD, mode == INPLACE))
    mode = jnp.where(switch2, toggled2, mode)

    switched = jnp.logical_or(switch1, switch2)
    mode_ref = jnp.where(switched, sample_mode_ref(k3, mode), ts.mode_ref)
    return ts.replace(mode=mode.astype(jnp.int32), mode_ref=mode_ref, phase=phase)


def external_obs(ts: WalkingState, period: int) -> jnp.ndarray:
    """clock(2) + mode one-hot(3) + mode_ref(3) (jvrc_base.py:140-145,
    jvrc_walk.py:66-68)."""
    angle = 2.0 * jnp.pi * ts.phase.astype(jnp.float32) / period
    clock = jnp.stack([jnp.sin(angle), jnp.cos(angle)])
    return jnp.concatenate([clock, jax.nn.one_hot(ts.mode, 3), ts.mode_ref])


def compute_reward(
    ts: WalkingState,
    clock_table: jnp.ndarray,  # (period, 4): r_frc, r_vel, l_frc, l_vel
    robot_mass: float,
    goal_height: float,
    neutral_pose: jnp.ndarray,
    # instantaneous quantities gathered by the env:
    l_foot_frc: jnp.ndarray,
    r_foot_frc: jnp.ndarray,
    l_foot_speed: jnp.ndarray,
    r_foot_speed: jnp.ndarray,
    head_xy: jnp.ndarray,
    root_xy: jnp.ndarray,
    root_height: jnp.ndarray,
    contact_point_z: jnp.ndarray,
    root_vel_local_xy: jnp.ndarray,
    yaw_vel: jnp.ndarray,
    qvel: jnp.ndarray,
    qacc: jnp.ndarray,
    torque: jnp.ndarray,
    prev_torque: jnp.ndarray,
    pose: jnp.ndarray,
    action: jnp.ndarray,
    prev_action: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted 10-term reward vector (walking_task.py:85-147)."""
    clocks = jnp.asarray(clock_table)[ts.phase]
    standing = ts.mode == STANDING
    # STANDING overrides clocks: both feet in stance (frc +1, vel -1)
    r_frc = jnp.where(standing, 1.0, clocks[0])
    r_vel = jnp.where(standing, -1.0, clocks[1])
    l_frc = jnp.where(standing, 1.0, clocks[2])
    l_vel = jnp.where(standing, -1.0, clocks[3])

    # mode-dependent reference zeroing (walking_task.py:118-127)
    yaw_ref = jnp.where(jnp.logical_or(standing, ts.mode == FORWARD), 0.0, ts.mode_ref[0])
    vx_ref = jnp.where(ts.mode == FORWARD, ts.mode_ref[1], 0.0)
    vy_ref = jnp.where(ts.mode == FORWARD, ts.mode_ref[2], 0.0)
    goal_vel_xy = jnp.stack([vx_ref, vy_ref])
    goal_speed = jnp.linalg.norm(goal_vel_xy)

    components = jnp.stack(
        [
            rewards.foot_frc_clock_reward(l_foot_frc, r_foot_frc, l_frc, r_frc, robot_mass),
            rewards.foot_vel_clock_reward(l_foot_speed, r_foot_speed, l_vel, r_vel),
            rewards.root_accel_reward(qvel, qacc),
            rewards.height_reward(root_height, goal_height, goal_speed, contact_point_z),
            rewards.vel_reward(root_vel_local_xy, goal_vel_xy),
            rewards.yaw_vel_reward(yaw_vel, yaw_ref),
            rewards.upper_body_reward(head_xy, root_xy),
            rewards.posture_reward(pose, neutral_pose),
            rewards.torque_smoothness_reward(torque, prev_torque),
            rewards.action_smoothness_reward(action, prev_action),
        ]
    )
    return WEIGHTS * components


def done(root_height: jnp.ndarray, self_collision: jnp.ndarray, z_min=0.6, z_max=1.4) -> jnp.ndarray:
    """Termination (walking_task.py:184-192)."""
    return jnp.logical_or(
        jnp.logical_or(root_height < z_min, root_height > z_max), self_collision
    )
