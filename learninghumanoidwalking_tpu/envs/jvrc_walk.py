"""JVRC-1 walking environment.

Parity target: /root/reference/envs/jvrc/jvrc_walk.py + jvrc_base.py:
29-D robot state (roll,pitch + root angvel(3) + motor pos/vel(12 each)),
8 external obs (clock + mode one-hot + mode ref) -> 37-D observations;
mirror index lists for symmetry learning; fixed obs normalization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.humanoid import HumanoidEnv, load_config
from learninghumanoidwalking_tpu.envs.walking_mixin import WalkingTaskMixin
from learninghumanoidwalking_tpu.models import jvrc
from learninghumanoidwalking_tpu.tasks import walking
from learninghumanoidwalking_tpu.physics.spec import lower


class JvrcWalkEnv(WalkingTaskMixin, HumanoidEnv):
    ROOT_BODY = "PELVIS_S"
    HEAD_BODY = "NECK_P_S"
    LFOOT_BODY = "L_ANKLE_P_S"
    RFOOT_BODY = "R_ANKLE_P_S"
    include_torque_obs = False

    def __init__(self, path_to_yaml: str | None = None):
        self.cfg = load_config("jvrc_base.yaml", path_to_yaml)
        self.spec = jvrc.jvrc_spec()
        self.model = lower(self.spec)

        self.kp = np.asarray(self.cfg.kp, dtype=np.float32)
        self.kd = np.asarray(self.cfg.kd, dtype=np.float32)

        pose = np.deg2rad(np.asarray(self.cfg.half_sitting_pose, dtype=np.float32))
        self.nominal_qpos = np.concatenate(
            [np.array([0, 0, jvrc.NOMINAL_HEIGHT], dtype=np.float32), np.array([1, 0, 0, 0], dtype=np.float32), pose]
        )
        self.reward_names = walking.REWARD_NAMES
        self._finalize()
        self._setup_walking()
        self._setup_mirror()

        # fixed obs normalization (jvrc_walk.py:45-63)
        self.obs_mean = np.concatenate([np.zeros(5), pose, np.zeros(12), [0, 0, 0.5, 0.5, 0.5, 0, 0, 0]])
        self.obs_std = np.concatenate(
            [[0.2, 0.2, 1, 1, 1], 0.5 * np.ones(12), 4 * np.ones(12), [1, 1, 1, 1, 1, 0.5, 0.5, 0.5]]
        )
        self.obs_mean = np.tile(self.obs_mean, self.history_len)
        self.obs_std = np.tile(self.obs_std, self.history_len)

    def _setup_mirror(self) -> None:
        """Mirror index lists over the 29-D robot state + 8 external obs
        (jvrc_base.py:73-110). Robot state layout: roll, pitch, angvel(3),
        motor_pos(12: R leg then L leg), motor_vel(12). Mirroring swaps the
        R/L motor blocks and negates roll/yaw quantities."""
        base = [
            -0.1, 1,            # roll (negated), pitch
            -2, 3, -4,          # angular velocity: wx, wy, wz (x/z negated)
            # motor_pos: right block <- left block (indices 11..16), with
            # sign flips on roll/yaw joints (hip_r, hip_y, ankle_r)
            11, -12, -13, 14, -15, 16,
            5, -6, -7, 8, -9, 10,
            # motor_vel: same pattern at +12
            23, -24, -25, 26, -27, 28,
            17, -18, -19, 20, -21, 22,
        ]
        ext = [len(base) + i for i in range(self.num_external_obs)]
        self.clock_inds = ext[0:2]
        self.mirrored_obs = base + ext
        # actions: swap legs, negate hip_r/hip_y/ankle_r (jvrc_base.py:110)
        self.mirrored_acts = [6, -7, -8, 9, -10, 11, 0.1, -1, -2, 3, -4, 5]
