"""Walking env constructed from an MJCF robot description file.

The reference ingests robots exclusively as MJCF compiled by MuJoCo
(/root/reference/envs/common/mujoco_env.py:24-26, with per-robot surgery in
envs/*/gen_xml.py). This is the equivalent consumer for the TPU stack: any
MJCF file within the importer's subset (physics/mjcf_import.py) becomes a
walking environment:

    make_env("mjcf:/path/to/robot.xml", path_to_yaml="robot.yaml")

The YAML supplies what MJCF does not express — which geoms are feet, which
bodies are root/head, PD gains, the nominal pose, and gait-task parameters
(see configs/mjcf_base.yaml for the schema). Observation normalization uses
the running Welford path (the reference default for envs without hand-set
stats); the mirror loss is enabled only if the YAML provides mirror index
lists.
"""

from __future__ import annotations

import numpy as np

from learninghumanoidwalking_tpu.envs.humanoid import HumanoidEnv, load_config
from learninghumanoidwalking_tpu.envs.walking_mixin import WalkingTaskMixin
from learninghumanoidwalking_tpu.physics.mjcf_import import import_mjcf
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import walking


class MjcfWalkEnv(WalkingTaskMixin, HumanoidEnv):
    include_torque_obs = False

    def __init__(self, xml_path: str, path_to_yaml: str | None = None):
        # deep-merge the robot YAML over the schema defaults so partial
        # robot files need only the robot-specific keys
        self.cfg = load_config("mjcf_base.yaml", None)
        if path_to_yaml:
            from learninghumanoidwalking_tpu.utils import load_yaml

            self.cfg = self.cfg.merged(load_yaml(path_to_yaml))
        robot = self.cfg.robot
        if robot is None or robot.left_foot_geoms is None:
            raise ValueError(
                "mjcf env needs a YAML with a `robot:` section naming "
                "left/right foot geoms and root/foot bodies "
                "(see configs/mjcf_base.yaml)"
            )
        spec = import_mjcf(
            xml_path,
            left_foot_geoms=tuple(robot.left_foot_geoms),
            right_foot_geoms=tuple(robot.right_foot_geoms),
            self_collision_pairs=tuple(tuple(p) for p in (robot.self_collision_pairs or [])),
        )
        self.spec = spec
        self.model = lower(spec)

        self.ROOT_BODY = str(robot.root_body)
        self.HEAD_BODY = str(robot.head_body or robot.root_body)
        self.LFOOT_BODY = str(robot.lfoot_body)
        self.RFOOT_BODY = str(robot.rfoot_body)

        nu = self.model.nu
        kp = self.cfg.kp if self.cfg.kp is not None else [100.0] * nu
        kd = self.cfg.kd if self.cfg.kd is not None else [10.0] * nu
        self.kp = np.asarray(kp, dtype=np.float32)
        self.kd = np.asarray(kd, dtype=np.float32)
        if self.kp.shape != (nu,) or self.kd.shape != (nu,):
            raise ValueError(f"kp/kd must have {nu} entries (model actuators)")

        pose_deg = self.cfg.half_sitting_pose or [0.0] * nu
        pose = np.deg2rad(np.asarray(pose_deg, dtype=np.float32))
        height = float(robot.nominal_height)
        self.nominal_qpos = np.concatenate(
            [np.array([0, 0, height], np.float32), np.array([1, 0, 0, 0], np.float32), pose]
        )
        self.reward_names = walking.REWARD_NAMES
        self._finalize()
        self._setup_walking()

        # mirror lists only if the YAML supplies them (obs indices cover the
        # robot state; external obs are appended automatically like the
        # built-in envs do)
        if robot.mirrored_obs is not None and robot.mirrored_acts is not None:
            base = list(robot.mirrored_obs)
            ext = [len(base) + i for i in range(self.num_external_obs)]
            self.clock_inds = ext[0:2]
            self.mirrored_obs = base + ext
            self.mirrored_acts = list(robot.mirrored_acts)
