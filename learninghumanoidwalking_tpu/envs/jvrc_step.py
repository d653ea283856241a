"""JVRC-1 footstep-following environment (stepping stones / stairs / curves).

Parity target: /root/reference/envs/jvrc/jvrc_step.py + tasks/stepping_task.py:
29-D robot state + 10 external obs (clock + two lookahead step targets as
root-relative (x, y, z, theta)) -> 39-D observations; terrain boxes under the
planned footsteps; FORWARD-mode stair-height curriculum on the training
iteration; same mirror indices as jvrc_walk with identity-mirrored goals.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.humanoid import HumanoidEnv, load_config
from learninghumanoidwalking_tpu.models import jvrc
from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import rewards, stepping
from learninghumanoidwalking_tpu.utils import maths
from learninghumanoidwalking_tpu.utils.footstep_plans import plan_bank

# force-sensor site offset in the ankle frame (gen_xml.py:146-148)
FOOT_SITE_OFFSET = np.array([0.03, 0.0, -0.1], dtype=np.float32)


class JvrcStepEnv(HumanoidEnv):
    ROOT_BODY = "PELVIS_S"
    HEAD_BODY = "NECK_P_S"
    LFOOT_BODY = "L_ANKLE_P_S"
    RFOOT_BODY = "R_ANKLE_P_S"
    include_torque_obs = False
    num_external_obs = 10

    def __init__(self, path_to_yaml: str | None = None):
        self.cfg = load_config("jvrc_base.yaml", path_to_yaml)
        self.spec = jvrc.jvrc_spec(nterrain=stepping.NBOXES)
        self.model = lower(self.spec)

        self.kp = np.asarray(self.cfg.kp, dtype=np.float32)
        self.kd = np.asarray(self.cfg.kd, dtype=np.float32)

        pose = np.deg2rad(np.asarray(self.cfg.half_sitting_pose, dtype=np.float32))
        self.nominal_qpos = np.concatenate(
            [np.array([0, 0, jvrc.NOMINAL_HEIGHT], dtype=np.float32), np.array([1, 0, 0, 0], dtype=np.float32), pose]
        )
        self.reward_names = stepping.REWARD_NAMES
        self._finalize()

        task_cfg = self.cfg.task
        self.goal_height = float(task_cfg.goal_height)
        freq = 1.0 / self.control_dt
        table = rewards.make_phase_clock_tables(
            float(task_cfg.swing_duration), float(task_cfg.stance_duration), 0.1, "grounded", freq
        )
        self.period = int(np.floor(2 * float(task_cfg.total_duration) * freq))
        self.clock_table = np.asarray(table, np.float32)
        self.delay_frames = int(np.floor(float(task_cfg.swing_duration) / self.control_dt))

        plans, plan_lengths = plan_bank()
        self.plans = np.asarray(plans, np.float32)
        self.plan_lengths = np.asarray(plan_lengths)

        self._setup_mirror()
        self.obs_mean = np.concatenate([np.zeros(5), pose, np.zeros(12), [0.5, 0.5], np.zeros(8)])
        self.obs_std = np.concatenate([[0.2, 0.2, 1, 1, 1], 0.5 * np.ones(12), 4 * np.ones(12), [1, 1], np.ones(8)])
        self.obs_mean = np.tile(self.obs_mean, self.history_len)
        self.obs_std = np.tile(self.obs_std, self.history_len)

    def _setup_mirror(self) -> None:
        base = [
            -0.1, 1,
            -2, 3, -4,
            11, -12, -13, 14, -15, 16,
            5, -6, -7, 8, -9, 10,
            23, -24, -25, 26, -27, 28,
            17, -18, -19, 20, -21, 22,
        ]
        ext = [len(base) + i for i in range(self.num_external_obs)]
        self.clock_inds = ext[0:2]
        self.mirrored_obs = base + ext
        self.mirrored_acts = [6, -7, -8, 9, -10, 11, 0.1, -1, -2, 3, -4, 5]

    # ----------------------------------------------------------------- hooks

    def _foot_site(self, physics, body_idx: int) -> jnp.ndarray:
        return physics.xpos[body_idx] + maths.quat_rotate(
            physics.xquat[body_idx], jnp.asarray(FOOT_SITE_OFFSET)
        )

    def _task_reset(self, key, iteration, physics):
        # called with the pre-settle reset pose, like the reference which
        # builds the plan from the just-reset pose (stepping_task.py:263-316)
        if iteration is None:
            iteration = jnp.zeros((), dtype=jnp.int32)
        root_yaw = maths.quat_to_rpy(physics.xquat[self.root_idx])[2]
        return stepping.reset(
            key,
            self.period,
            jnp.asarray(iteration, dtype=jnp.int32),
            self.plans,
            self.plan_lengths,
            self._foot_site(physics, self.lfoot_idx),
            self._foot_site(physics, self.rfoot_idx),
            root_yaw,
            physics.xpos[self.root_idx],
            physics.xquat[self.root_idx],
        )

    def _task_step(self, key, task, physics):
        """Target-reach tracking uses the post-substep physics, matching the
        reference where task.step() runs after _do_simulation
        (robot_base.py:91, stepping_task.py:209-247)."""
        return stepping.step(
            task,
            self.period,
            self.delay_frames,
            self._foot_site(physics, self.lfoot_idx),
            self._foot_site(physics, self.rfoot_idx),
            physics.xpos[self.root_idx],
            physics.xquat[self.root_idx],
        )

    def _reward(self, state, physics, task, target):
        l_site = self._foot_site(physics, self.lfoot_idx)
        r_site = self._foot_site(physics, self.rfoot_idx)
        l_grf, r_grf = self._foot_grf(physics)
        l_speed = jnp.linalg.norm(physics.body_vel_world(self.lfoot_idx))
        r_speed = jnp.linalg.norm(physics.body_vel_world(self.rfoot_idx))
        return stepping.compute_reward(
            task,
            self.clock_table,
            self.robot_mass,
            self.goal_height,
            l_foot_frc=l_grf,
            r_foot_frc=r_grf,
            l_foot_speed=l_speed,
            r_foot_speed=r_speed,
            l_foot_pos=l_site,
            r_foot_pos=r_site,
            root_quat=physics.xquat[self.root_idx],
            root_pos=physics.xpos[self.root_idx],
            head_xy=physics.xpos[self.head_idx][:2],
            root_height=physics.xpos[self.root_idx][2],
            contact_point_z=self._contact_point_z(physics),
        )

    def _external_obs(self, task) -> jnp.ndarray:
        return stepping.external_obs(task, self.period)

    def _terrain(self, task):
        return stepping.make_terrain(task.sequence, task.seq_len, task.mode)

    def _done(self, physics) -> jnp.ndarray:
        selfcol = engine.self_collision(self.model, physics.xpos, physics.xquat)
        min_foot_z = jnp.minimum(
            self._foot_site(physics, self.lfoot_idx)[2], self._foot_site(physics, self.rfoot_idx)[2]
        )
        return stepping.done(physics.xpos[self.root_idx][2], min_foot_z, selfcol)

    MODE_NAMES = ("CURVED", "STANDING", "BACKWARD", "LATERAL", "FORWARD", "INPLACE")

    def render_markers(self, state) -> dict:
        """Footstep targets + terrain boxes + mode, world frame — the data
        the reference's MarkerDrawer shows in the viewer
        (marker_drawer.py:7-72; jvrc_step draws t1/t2 spheres)."""
        import numpy as np

        task = state.task
        seq = np.asarray(task.sequence)
        terrain = self._terrain(task)
        return {
            "mode": self.MODE_NAMES[int(task.mode)],
            "targets": seq[np.asarray([int(task.t1), int(task.t2)])],  # (2, 4) x,y,z,theta
            "sequence": seq[: int(task.seq_len)],
            "terrain_pos": np.asarray(terrain.pos),
            "terrain_size": np.asarray(terrain.size),
            "terrain_yaw": np.asarray(terrain.yaw),
            "floor_z": float(terrain.floor_z),
        }
