"""Unitree H1 standing environment.

Parity target: /root/reference/envs/h1/h1_env.py (StandingTask, 35-D obs =
roll,pitch + root angvel(3) + motor pos/vel/tau (10 each), no external obs,
fixed obs normalization, obs noise + perturbations + dynamics randomization).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.base import EnvState
from learninghumanoidwalking_tpu.envs.humanoid import HumanoidEnv, load_config
from learninghumanoidwalking_tpu.models import h1
from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import standing
from learninghumanoidwalking_tpu.utils import maths


class H1StandEnv(HumanoidEnv):
    ROOT_BODY = "pelvis"
    HEAD_BODY = "torso_link"
    LFOOT_BODY = "left_ankle_link"
    RFOOT_BODY = "right_ankle_link"
    include_torque_obs = True
    num_external_obs = 0

    def __init__(self, path_to_yaml: str | None = None):
        self.cfg = load_config("h1_base.yaml", path_to_yaml)
        self.spec = h1.h1_spec()
        self.model = lower(self.spec)

        gains = self.cfg.pdgains.to_dict()
        kp, kd = zip(*[gains[j] for j in h1.LEG_JOINTS])
        self.kp = np.asarray(kp, dtype=np.float32)
        self.kd = np.asarray(kd, dtype=np.float32)

        pose = np.asarray(self.cfg.half_sitting_pose, dtype=np.float32)
        self.nominal_qpos = np.concatenate(
            [np.array([0, 0, h1.NOMINAL_HEIGHT], dtype=np.float32), np.array([1, 0, 0, 0], dtype=np.float32), pose]
        )
        self.reward_names = standing.REWARD_NAMES
        self._finalize()

        # fixed obs normalization (h1_env.py:38-55)
        nu = self.model.nu
        self.obs_mean = np.concatenate([np.zeros(5), pose, np.zeros(2 * nu)])
        self.obs_std = np.concatenate([[0.2, 0.2, 1, 1, 1], 0.5 * np.ones(nu), 4 * np.ones(nu), 100 * np.ones(nu)])
        self.obs_mean = np.tile(self.obs_mean, self.history_len)
        self.obs_std = np.tile(self.obs_std, self.history_len)

    def _reward(self, state: EnvState, physics, task, target) -> jnp.ndarray:
        root_q = physics.xquat[self.root_idx]
        head_off = maths.quat_rotate_inv(
            root_q, physics.xpos[self.head_idx] - physics.xpos[self.root_idx]
        )[:2]
        return standing.compute_reward(
            neutral_pose=self.neutral_pose,
            root_vel_local_xy=self._root_local_vel_xy(physics),
            yaw_vel=physics.qvel[5],
            root_height=physics.xpos[self.root_idx][2],
            head_offset_in_base_xy=head_off,
            pose=self._motor_pos(physics),
            torque=physics.act_torque,
        )

    def _done(self, physics) -> jnp.ndarray:
        selfcol = engine.self_collision(self.model, physics.xpos, physics.xquat)
        return standing.done(physics.qpos[2], selfcol)
