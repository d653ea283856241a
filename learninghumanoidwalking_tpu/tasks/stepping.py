"""Footstep-target stepping task.

Functional re-design of /root/reference/tasks/stepping_task.py: footstep
sequences are fixed-shape padded arrays in task state, terrain boxes are
per-env Terrain state (the reference repositions 20 MjModel box bodies,
:320-334), and the mode machine / target tracking / curriculum are pure
functions with explicit keys.

Modes (reset p = [CURVED .15, STANDING .05, BACKWARD .2, LATERAL .3,
FORWARD .3], stepping_task.py:292-295); FORWARD uses the step-height
curriculum clip((iter-3000)/8000, 0, 1) * 0.1 (:312-313).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.physics.engine import Terrain
from learninghumanoidwalking_tpu.tasks import rewards
from learninghumanoidwalking_tpu.utils import maths
from learninghumanoidwalking_tpu.utils.footstep_plans import MAX_STEPS

CURVED, STANDING, BACKWARD, LATERAL, FORWARD, INPLACE = 0, 1, 2, 3, 4, 5

REWARD_NAMES = (
    "foot_frc_score",
    "foot_vel_score",
    "orient_cost",
    "height_error",
    "step_reward",
    "upper_body_reward",
)

WEIGHTS = np.array([0.150, 0.150, 0.050, 0.050, 0.450, 0.050], dtype=np.float32)  # host constant: module import must not touch the device

TARGET_RADIUS = 0.20  # stepping_task.py:276
NBOXES = 20


def _seq_row(sequence: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """sequence[idx] via one-hot matmul — a dynamic TPU gather costs ~0.2 ms
    per batch under vmap; the one-hot contraction is a cheap matvec."""
    oh = jax.nn.one_hot(idx, sequence.shape[0], dtype=sequence.dtype)
    return oh @ sequence


@struct.dataclass
class SteppingState:
    mode: jnp.ndarray  # () int32
    phase: jnp.ndarray  # () int32
    sequence: jnp.ndarray  # (MAX_STEPS, 4) world-frame [x, y, z, theta]
    seq_len: jnp.ndarray  # () int32
    t1: jnp.ndarray  # () int32 current target index
    t2: jnp.ndarray  # () int32 next target index
    target_reached: jnp.ndarray  # () bool
    target_reached_frames: jnp.ndarray  # () int32
    goal_steps: jnp.ndarray  # (2, 4) root-relative [x, y, z, theta] of t1, t2


# ----------------------------------------------------------- sequence makers


def _straight_sequence(key, phase, period, step_size, step_gap, step_height):
    """Alternating-gap straight sequence (stepping_task.py:160-178).
    Fixed length MAX_STEPS; logical length = 20."""
    k1, k2 = jax.random.split(key)
    first_sign = jnp.where(phase == period // 2, -1.0, 1.0)
    first_y = first_sign * jax.random.uniform(k1, (), minval=0.095, maxval=0.105)
    y0 = first_sign * step_gap
    c = jax.random.randint(k2, (), 2, 4)

    num = 20
    i = jnp.arange(MAX_STEPS)
    x = i * step_size  # step i (i>=1) sits at x = i*step_size
    # y flips sign each step starting from y0: step i has y = y0 * (-1)^i
    y = y0 * jnp.where(i % 2 == 1, -1.0, 1.0)
    z = jnp.maximum(i - c, 0) * step_height
    seq = jnp.stack([x, y, z, jnp.zeros(MAX_STEPS)], axis=1)
    seq = seq.at[0].set(jnp.array([0.0, 0.0, 0.0, 0.0]).at[1].set(first_y))
    # final step mirrors the y of the one before it (stepping_task.py:177)
    final_x = (num - 1) * step_size
    final_y = -seq[num - 2, 1]
    final_z = seq[num - 2, 2]
    seq = seq.at[num - 1].set(jnp.stack([final_x, final_y, final_z, jnp.zeros(())]))
    # pad with the final step
    seq = jnp.where((i < num)[:, None], seq, seq[num - 1][None, :])
    return seq, jnp.asarray(num, dtype=jnp.int32)


def _standing_sequence(key, phase, period):
    """num_steps=1 -> first step + final step only (stepping_task.py:297-299)."""
    seq, _ = _straight_sequence(key, phase, period, 0.3, 0.15, 0.0)
    first = seq[0]
    final = jnp.stack([0.3, -first[1], 0.0, 0.0])
    seq = jnp.tile(final[None, :], (MAX_STEPS, 1)).at[0].set(first)
    return seq, jnp.asarray(2, dtype=jnp.int32)


def _lateral_sequence(key):
    """Side-stepping (stepping_task.py:148-158): y += 0.4 on odd steps,
    y -= 2/3*0.4 on even, random side."""
    c = jnp.where(jax.random.bernoulli(key, 0.5), 1.0, -1.0)
    i = jnp.arange(MAX_STEPS) + 1  # reference indexes from 1
    n_plus = (i + 1) // 2  # number of += steps among 1..i
    n_minus = i // 2
    y = 0.4 * n_plus - (2.0 / 3.0) * 0.4 * n_minus
    seq = jnp.stack([jnp.zeros(MAX_STEPS), c * y, jnp.zeros(MAX_STEPS), jnp.zeros(MAX_STEPS)], axis=1)
    num = 19
    seq = jnp.where((jnp.arange(MAX_STEPS) < num)[:, None], seq, seq[num - 1][None, :])
    return seq, jnp.asarray(num, dtype=jnp.int32)


def _curved_sequence(key, plans, plan_lengths):
    idx = jax.random.randint(key, (), 0, plans.shape[0])
    oh = jax.nn.one_hot(idx, plans.shape[0], dtype=plans.dtype)
    seq = jnp.einsum("n,nsk->sk", oh, plans)
    length = jnp.sum(oh * plan_lengths.astype(plans.dtype)).astype(jnp.int32)
    return seq, length


def make_sequence(key, mode, phase, period, iteration, plans, plan_lengths):
    """Mode-dispatched raw sequence in the robot's local frame
    (stepping_task.py:297-316)."""
    k0, k1, k2 = jax.random.split(key, 3)
    h = jnp.clip((iteration.astype(jnp.float32) - 3000.0) / 8000.0, 0.0, 1.0) * 0.1
    h = jnp.where(jax.random.bernoulli(k1, 0.5), h, -h)
    inplace_size = jax.random.uniform(k2, (), minval=-0.05, maxval=0.05)

    branches = [
        lambda: _curved_sequence(k0, plans, plan_lengths),
        lambda: _standing_sequence(k0, phase, period),
        lambda: _straight_sequence(k0, phase, period, -0.1, 0.15, 0.0),
        lambda: _lateral_sequence(k0),
        lambda: _straight_sequence(k0, phase, period, 0.3, 0.15, h),
        lambda: _straight_sequence(k0, phase, period, inplace_size, 0.15, 0.0),
    ]
    return jax.lax.switch(mode, branches)


def transform_sequence(seq, lfoot_pos, rfoot_pos, root_yaw):
    """Express the local-frame plan in world coordinates anchored at the feet
    midpoint and current root yaw (stepping_task.py:125-137)."""
    mid = (lfoot_pos + rfoot_pos) / 2.0
    c, s = jnp.cos(root_yaw), jnp.sin(root_yaw)
    x = mid[0] + seq[:, 0] * c - seq[:, 1] * s
    y = mid[1] + seq[:, 0] * s + seq[:, 1] * c
    return jnp.stack([x, y, seq[:, 2], seq[:, 3] + root_yaw], axis=1)


def make_terrain(sequence, seq_len, mode, box_half_height=0.1) -> Terrain:
    """Boxes under the steps; floor drops 2 m in FORWARD mode
    (stepping_task.py:318-334). Box half-size (0.15, 1, 0.1), top at step z."""
    i = jnp.arange(NBOXES)
    live = i < seq_len
    steps = sequence[:NBOXES]
    pos = jnp.stack(
        [
            jnp.where(live, steps[:, 0], 0.0),
            jnp.where(live, steps[:, 1], 0.0),
            jnp.where(live, steps[:, 2] - box_half_height, -1.0 - box_half_height),
        ],
        axis=1,
    )
    size = jnp.tile(jnp.array([0.15, 1.0, box_half_height]), (NBOXES, 1))
    yaw = jnp.where(live, steps[:, 3], 0.0)
    floor_z = jnp.where(mode == FORWARD, -2.0, 0.0)
    return Terrain(pos=pos, size=size, yaw=yaw, floor_z=floor_z)


# ------------------------------------------------------------------ dynamics


def update_goal_steps(ts: SteppingState, root_pos, root_quat) -> SteppingState:
    """Root-relative poses of the two lookahead targets
    (stepping_task.py:181-199); zeros in STANDING mode."""

    def rel(t):
        target = _seq_row(ts.sequence, t)
        d = maths.quat_rotate_inv(root_quat, target[:3] - root_pos)
        qz = jnp.concatenate([jnp.cos(target[3] / 2)[None], jnp.zeros(2), jnp.sin(target[3] / 2)[None]])
        rel_q = maths.quat_mul(maths.quat_conj(root_quat), qz)
        theta = maths.quat_to_rpy(rel_q)[2]
        return jnp.concatenate([d, theta[None]])

    goals = jnp.stack([rel(ts.t1), rel(ts.t2)])
    goals = jnp.where(ts.mode == STANDING, jnp.zeros_like(goals), goals)
    return ts.replace(goal_steps=goals)


def step(
    ts: SteppingState,
    period: int,
    delay_frames: int,
    l_foot_pos: jnp.ndarray,
    r_foot_pos: jnp.ndarray,
    root_pos: jnp.ndarray,
    root_quat: jnp.ndarray,
) -> SteppingState:
    """Phase advance + target-reach tracking (stepping_task.py:209-247)."""
    phase = jnp.mod(ts.phase + 1, period)
    target = _seq_row(ts.sequence, ts.t1)[:3]
    in_target = jnp.minimum(
        jnp.linalg.norm(l_foot_pos - target), jnp.linalg.norm(r_foot_pos - target)
    ) < TARGET_RADIUS
    frames = jnp.where(in_target, ts.target_reached_frames + 1, 0)
    advance = jnp.logical_and(in_target, frames >= delay_frames)

    t1 = jnp.where(advance, ts.t2, ts.t1)
    t2 = jnp.where(advance, jnp.minimum(ts.t2 + 1, ts.seq_len - 1), ts.t2)
    ts = ts.replace(
        phase=phase,
        t1=t1,
        t2=t2,
        target_reached=jnp.logical_and(in_target, ~advance),
        target_reached_frames=jnp.where(advance, 0, frames),
    )
    return update_goal_steps(ts, root_pos, root_quat)


def step_reward(ts: SteppingState, l_foot_pos, r_foot_pos, root_xy) -> jnp.ndarray:
    """0.8 * hit + 0.2 * progress (stepping_task.py:66-77)."""
    target = _seq_row(ts.sequence, ts.t1)[:3]
    foot_dist = jnp.minimum(jnp.linalg.norm(l_foot_pos - target), jnp.linalg.norm(r_foot_pos - target))
    hit = jnp.where(ts.target_reached, jnp.exp(-foot_dist / 0.25), 0.0)
    mid = (_seq_row(ts.sequence, ts.t1)[:2] + _seq_row(ts.sequence, ts.t2)[:2]) / 2.0
    progress = jnp.exp(-jnp.linalg.norm(root_xy - mid) / 2.0)
    return 0.8 * hit + 0.2 * progress


def compute_reward(
    ts: SteppingState,
    clock_table: jnp.ndarray,
    robot_mass: float,
    goal_height: float,
    l_foot_frc,
    r_foot_frc,
    l_foot_speed,
    r_foot_speed,
    l_foot_pos,
    r_foot_pos,
    root_quat,
    root_pos,
    head_xy,
    root_height,
    contact_point_z,
) -> jnp.ndarray:
    """6-term weighted reward (stepping_task.py:79-123)."""
    clocks = jnp.asarray(clock_table)[ts.phase]
    standing = ts.mode == STANDING
    r_frc = jnp.where(standing, 1.0, clocks[0])
    r_vel = jnp.where(standing, -1.0, clocks[1])
    l_frc = jnp.where(standing, 1.0, clocks[2])
    l_vel = jnp.where(standing, -1.0, clocks[3])

    theta1 = _seq_row(ts.sequence, ts.t1)[3]
    target_quat = jnp.concatenate([jnp.cos(theta1 / 2)[None], jnp.zeros(2), jnp.sin(theta1 / 2)[None]])

    components = jnp.stack(
        [
            rewards.foot_frc_clock_reward(l_foot_frc, r_foot_frc, l_frc, r_frc, robot_mass),
            rewards.foot_vel_clock_reward(l_foot_speed, r_foot_speed, l_vel, r_vel),
            rewards.body_orient_reward(root_quat, target_quat),
            rewards.height_reward(root_height, goal_height, 0.0, contact_point_z),
            step_reward(ts, l_foot_pos, r_foot_pos, root_pos[:2]),
            # note: squared-norm variant (stepping_task.py:120)
            jnp.exp(-10.0 * jnp.sum(jnp.square(head_xy - root_pos[:2]))),
        ]
    )
    return WEIGHTS * components


def done(root_height, min_foot_z, self_collision) -> jnp.ndarray:
    """Root height is measured relative to the lower foot
    (stepping_task.py:249-261) so stair height does not trigger termination."""
    return jnp.logical_or((root_height - min_foot_z) < 0.6, self_collision)


def reset(
    key,
    period: int,
    iteration,
    plans,
    plan_lengths,
    lfoot_pos,
    rfoot_pos,
    root_yaw,
    root_pos,
    root_quat,
) -> SteppingState:
    """Mode sample + sequence generation + initial targets
    (stepping_task.py:263-316)."""
    k_mode, k_phase, k_seq = jax.random.split(key, 3)
    mode = jax.random.choice(
        k_mode,
        jnp.array([CURVED, STANDING, BACKWARD, LATERAL, FORWARD]),
        p=jnp.array([0.15, 0.05, 0.2, 0.3, 0.3]),
    ).astype(jnp.int32)
    phase = jnp.where(jax.random.bernoulli(k_phase, 0.5), 0, period // 2).astype(jnp.int32)
    seq, seq_len = make_sequence(k_seq, mode, phase, period, iteration, plans, plan_lengths)
    seq = transform_sequence(seq, lfoot_pos, rfoot_pos, root_yaw)
    ts = SteppingState(
        mode=mode,
        phase=phase,
        sequence=seq,
        seq_len=seq_len,
        t1=jnp.zeros((), dtype=jnp.int32),
        t2=jnp.minimum(jnp.ones((), dtype=jnp.int32), seq_len - 1),
        target_reached=jnp.zeros((), dtype=bool),
        target_reached_frames=jnp.zeros((), dtype=jnp.int32),
        goal_steps=jnp.zeros((2, 4)),
    )
    return update_goal_steps(ts, root_pos, root_quat)


def external_obs(ts: SteppingState, period: int) -> jnp.ndarray:
    """clock(2) + goal x(2) + y(2) + z(2) + theta(2) (jvrc_step.py:67-76)."""
    angle = 2.0 * jnp.pi * ts.phase.astype(jnp.float32) / period
    clock = jnp.stack([jnp.sin(angle), jnp.cos(angle)])
    return jnp.concatenate([clock, ts.goal_steps.T.reshape(-1)])
