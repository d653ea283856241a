"""Unitree H1 walking environment.

Parity target: /root/reference/envs/h1/h1_walk.py: 35-D robot state (incl.
motor torques) + 8 external obs -> 43-D observations, mirror index lists,
fixed obs normalization, gait 0.5 s total / 0.4 swing / 0.1 stance, obs
noise + perturbations + dynamics randomization enabled. Provides the
imitation projector used to distill this env's expert into richer envs
(--imitate path, reference rl/algos/imitation.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.humanoid import HumanoidEnv, load_config
from learninghumanoidwalking_tpu.envs.walking_mixin import WalkingTaskMixin
from learninghumanoidwalking_tpu.models import h1
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import walking


class H1WalkEnv(WalkingTaskMixin, HumanoidEnv):
    ROOT_BODY = "pelvis"
    HEAD_BODY = "torso_link"
    LFOOT_BODY = "left_ankle_link"
    RFOOT_BODY = "right_ankle_link"
    include_torque_obs = True

    def __init__(self, path_to_yaml: str | None = None):
        self.cfg = load_config("h1_walk.yaml", path_to_yaml)
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
        self.reward_names = walking.REWARD_NAMES
        self._finalize()
        self._setup_walking()
        self._setup_mirror()

        # fixed obs normalization (h1_walk.py:149-170)
        nu = self.model.nu
        self.obs_mean = np.concatenate(
            [np.zeros(5), pose, np.zeros(nu), np.zeros(nu), [0, 0], [0.5, 0.5, 0.5, 0, 0, 0]]
        )
        self.obs_std = np.concatenate(
            [[0.2, 0.2, 1, 1, 1], 0.5 * np.ones(nu), 4 * np.ones(nu), 100 * np.ones(nu), [1, 1], [1, 1, 1, 0.5, 0.5, 0.5]]
        )
        self.obs_mean = np.tile(self.obs_mean, self.history_len)
        self.obs_std = np.tile(self.obs_std, self.history_len)

    def _setup_mirror(self) -> None:
        """Mirror indices over 35-D robot state + 8 ext (h1_walk.py:66-128).
        Motor blocks are left(5)-then-right(5); within a leg hip_yaw,
        hip_roll, hip_pitch, knee, ankle — yaw/roll flip sign under mirror."""
        base = [
            -0.1, 1,
            -2, 3, -4,
            # motor_pos: left block <- right block
            -10, -11, 12, 13, 14,
            -5, -6, 7, 8, 9,
            # motor_vel
            -20, -21, 22, 23, 24,
            -15, -16, 17, 18, 19,
            # motor_tau
            -30, -31, 32, 33, 34,
            -25, -26, 27, 28, 29,
        ]
        ext = [len(base) + i for i in range(self.num_external_obs)]
        self.clock_inds = ext[0:2]
        self.mirrored_obs = base + ext
        self.mirrored_acts = [-5, -6, 7, 8, 9, -0.1, -1, 2, 3, 4]

    def imitation_projector(self):
        """Identity projector: the H1 walk expert and this env share the
        observation space, so expert_obs = obs and all samples contribute
        (used when distilling the h1_walk expert into derived envs)."""

        def project(obs_batch: jnp.ndarray):
            from learninghumanoidwalking_tpu.rl.imitation import ImitationQuery

            return ImitationQuery(
                expert_obs=obs_batch,
                sample_mask=jnp.ones(obs_batch.shape[0]),
                action_indices=tuple(range(self.action_size)),
            )

        return project
