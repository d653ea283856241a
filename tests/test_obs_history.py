"""Observation-history stacking (obs_history_len > 1).

All shipped configs use history 1; this exercises the rolling-buffer path
(reference deque + flatten, base_humanoid_env.py:177-197) and the tiled
normalization vectors.
"""

import pytest

pytestmark = pytest.mark.fast  # cold-fast lane: small-batch compiles only

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from learninghumanoidwalking_tpu.envs.jvrc_walk import JvrcWalkEnv

YAML = """
sim_dt: 0.001
control_dt: 0.025
obs_history_len: 3
action_smoothing: 0.5
kp: [200, 200, 200, 250, 80, 80, 200, 200, 200, 250, 80, 80]
kd: [20, 20, 20, 25, 8, 8, 20, 20, 20, 25, 8, 8]
half_sitting_pose: [-30, 0, 0, 50, 0, -24, -30, 0, 0, 50, 0, -24]
task:
  goal_height: 0.80
  total_duration: 1.1
  swing_duration: 0.75
  stance_duration: 0.35
"""


def test_history_stacking():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(YAML)
        path = f.name
    env = JvrcWalkEnv(path)
    assert env.history_len == 3
    assert env.obs_size == env.base_obs_len * 3
    assert np.asarray(env.obs_mean).shape == (env.obs_size,)

    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # newest frame first; older slots zero right after reset
    assert bool(jnp.any(state.obs_history[0] != 0))
    assert bool(jnp.all(state.obs_history[1] == 0))
    assert bool(jnp.all(state.obs_history[2] == 0))

    step = jax.jit(env.step)
    s1 = step(state, jnp.zeros(env.action_size))
    # previous newest frame shifted to slot 1
    np.testing.assert_array_equal(np.asarray(s1.obs_history[1]), np.asarray(state.obs_history[0]))
    s2 = step(s1, jnp.zeros(env.action_size))
    np.testing.assert_array_equal(np.asarray(s2.obs_history[2]), np.asarray(state.obs_history[0]))
    assert s2.obs.shape == (env.obs_size,)
