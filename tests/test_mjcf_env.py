"""End-to-end MJCF-file env path: export a robot to MJCF on disk, build a
walking env from the file via make_env("mjcf:<path>"), and train one PPO
iteration — the importer consumed by a real env, not just roundtrip tests
(reference model-ingest: /root/reference/envs/common/mujoco_env.py:24-26)."""

import numpy as np
import jax

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.models.jvrc import jvrc_spec
from learninghumanoidwalking_tpu.physics.mjcf import export_mjcf


_YAML = """
kp: [200, 200, 200, 250, 80, 80, 200, 200, 200, 250, 80, 80]
kd: [20, 20, 20, 25, 8, 8, 20, 20, 20, 25, 8, 8]
half_sitting_pose: [-30, 0, 0, 50, 0, -24, -30, 0, 0, 50, 0, -24]
robot:
  left_foot_geoms: [L_foot]
  right_foot_geoms: [R_foot]
  root_body: PELVIS_S
  head_body: NECK_P_S
  lfoot_body: L_ANKLE_P_S
  rfoot_body: R_ANKLE_P_S
  nominal_height: 0.81
"""


def _write_env_files(tmp_path):
    xml_path = tmp_path / "robot.xml"
    xml_path.write_text(export_mjcf(jvrc_spec()))
    yaml_path = tmp_path / "robot.yaml"
    yaml_path.write_text(_YAML)
    return xml_path, yaml_path


def test_mjcf_env_constructs_and_steps(tmp_path):
    xml_path, yaml_path = _write_env_files(tmp_path)
    env = make_env(f"mjcf:{xml_path}", str(yaml_path))
    assert env.action_size == 12
    assert env.obs_mean is None  # running-norm path
    state = env.reset(jax.random.PRNGKey(0))
    state = env.step(state, np.zeros(12, np.float32))
    assert np.isfinite(np.asarray(state.obs)).all()
    assert np.isfinite(float(state.reward))


def test_mjcf_env_trains_one_iteration(tmp_path):
    from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig

    xml_path, yaml_path = _write_env_files(tmp_path)
    env = make_env(f"mjcf:{xml_path}", str(yaml_path))
    cfg = PPOConfig(
        num_envs=4, rollout_len=4, minibatch_size=16, epochs=1,
        max_traj_len=8, input_norm_iters=1, use_mirror=False,
    )
    ppo = PPO(env, cfg)
    ts = ppo.init_state(jax.random.PRNGKey(0))
    ts = ppo._warmup_iter(ts)
    ts, metrics = ppo._train_iter(ts)
    assert np.isfinite(metrics["actor_loss"])
    assert np.isfinite(metrics["mean_reward"])
