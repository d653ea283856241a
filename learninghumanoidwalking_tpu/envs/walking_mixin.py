"""Shared walking-task plumbing for JVRC and H1 walking envs.

Wires the mode-conditioned walking task (tasks/walking.py) into the humanoid
env machinery: clock-table construction from config gait durations, task
reset/step hooks, external observations (clock + mode + reference), reward
input gathering, and termination — the env-side glue the reference spreads
across WalkingTask + the jvrc/h1 env classes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.tasks import rewards, walking


class WalkingTaskMixin:
    """Requires HumanoidEnv attributes; call _setup_walking() after _finalize()."""

    num_external_obs = 8  # clock(2) + mode one-hot(3) + mode_ref(3)
    MODE_NAMES = ("FORWARD", "INPLACE", "STANDING")  # walking.py:21 codes

    def render_markers(self, state) -> dict:
        """Mode + velocity reference overlay (reference draws these as viewer
        text/arrows via MarkerDrawer, h1_walk.py:150-160)."""
        return {
            "mode": self.MODE_NAMES[int(state.task.mode)],
            "mode_ref": np.asarray(state.task.mode_ref),
        }

    def _setup_walking(self) -> None:
        task_cfg = self.cfg.task
        self.goal_height = float(task_cfg.goal_height)
        freq = 1.0 / self.control_dt
        table = rewards.make_phase_clock_tables(
            float(task_cfg.swing_duration),
            float(task_cfg.stance_duration),
            strict_relaxer=0.1,
            stance_mode="grounded",
            freq=freq,
        )
        self.period = int(np.floor(2 * float(task_cfg.total_duration) * freq))
        # period from total_duration (walking_task.py:199-202) should equal
        # the clock-table length (total = swing + stance in all configs)
        if self.period != table.shape[0]:
            table = np.resize(table, (self.period, 4))
        self.clock_table = np.asarray(table, np.float32)
        self.dbl_support = np.asarray(rewards.double_support_mask(table), np.float32)

    # task hooks -------------------------------------------------------------

    def _task_reset(self, key, iteration, physics):
        return walking.reset(key, self.period)

    def _task_step(self, key, task, physics):
        return walking.step(key, task, self.period, self.dbl_support)

    def _external_obs(self, task) -> jnp.ndarray:
        return walking.external_obs(task, self.period)

    def _reward(self, state, physics, task, target) -> jnp.ndarray:
        l_grf, r_grf = self._foot_grf(physics)
        l_speed = jnp.linalg.norm(physics.body_vel_world(self.lfoot_idx))
        r_speed = jnp.linalg.norm(physics.body_vel_world(self.rfoot_idx))
        return walking.compute_reward(
            task,
            self.clock_table,
            self.robot_mass,
            self.goal_height,
            self.neutral_pose,
            l_foot_frc=l_grf,
            r_foot_frc=r_grf,
            l_foot_speed=l_speed,
            r_foot_speed=r_speed,
            head_xy=physics.xpos[self.head_idx][:2],
            root_xy=physics.xpos[self.root_idx][:2],
            root_height=physics.xpos[self.root_idx][2],
            contact_point_z=self._contact_point_z(physics),
            root_vel_local_xy=self._root_local_vel_xy(physics),
            yaw_vel=physics.qvel[5],
            qvel=physics.qvel,
            qacc=physics.qacc,
            torque=physics.act_torque,
            prev_torque=state.prev_torque,
            pose=self._motor_pos(physics),
            action=target,
            prev_action=state.prev_action,
        )

    def _done(self, physics) -> jnp.ndarray:
        selfcol = engine.self_collision(self.model, physics.xpos, physics.xquat)
        return walking.done(physics.qpos[2], selfcol)
