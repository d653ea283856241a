"""Determinism tests (reference tests/test_determinism.py analog).

JAX makes the reference's guarantees structural: same PRNG key => bit-identical
params; different keys => different runs; deterministic eval trajectories.
"""

import jax
import jax.numpy as jnp
import pytest

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig


@pytest.fixture(scope="module")
def ppo():
    env = make_env("cartpole")
    cfg = PPOConfig(num_envs=8, rollout_len=8, minibatch_size=32, epochs=2, max_traj_len=50, seed=0)
    return PPO(env, cfg)


def _train2(ppo, seed):
    ts = ppo.init_state(jax.random.PRNGKey(seed))
    for _ in range(2):
        ts, _ = ppo._train_iter(ts)
    return ts


def test_same_seed_bit_identical(ppo):
    a, b = _train2(ppo, 42), _train2(ppo, 42)
    for x, y in zip(jax.tree.leaves(a.actor_params), jax.tree.leaves(b.actor_params)):
        assert bool(jnp.all(x == y))
    for x, y in zip(jax.tree.leaves(a.critic_params), jax.tree.leaves(b.critic_params)):
        assert bool(jnp.all(x == y))


def test_different_seeds_differ(ppo):
    a, b = _train2(ppo, 1), _train2(ppo, 2)
    assert any(bool(jnp.any(x != y)) for x, y in zip(jax.tree.leaves(a.actor_params), jax.tree.leaves(b.actor_params)))


def test_env_reset_deterministic():
    env = make_env("jvrc_walk")
    reset = jax.jit(env.reset)
    s1 = reset(jax.random.PRNGKey(7))
    s2 = reset(jax.random.PRNGKey(7))
    assert bool(jnp.all(s1.obs == s2.obs))
    assert bool(jnp.all(s1.physics.qpos == s2.physics.qpos))
    s3 = reset(jax.random.PRNGKey(8))
    assert bool(jnp.any(s3.task.mode != s1.task.mode)) or bool(jnp.any(s3.physics.qpos != s1.physics.qpos)) or bool(
        jnp.any(s3.task.mode_ref != s1.task.mode_ref)
    ) or bool(jnp.any(s3.task.phase != s1.task.phase))


def test_eval_rollout_deterministic(ppo):
    ts = ppo.init_state(jax.random.PRNGKey(5))
    m1 = ppo._eval_iter(ts, jax.random.PRNGKey(11))
    m2 = ppo._eval_iter(ts, jax.random.PRNGKey(11))
    assert float(m1["eval_mean_reward"]) == float(m2["eval_mean_reward"])


def test_per_env_keys_distinct():
    """Per-env PRNG keys must be collision-free (reference worker-seed test)."""
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    assert len({tuple(map(int, k)) for k in keys}) == 512
