"""Imitation contract tests (reference tests/test_imitation.py analog):
stub projectors on cartpole — non-empty mask => finite positive loss that
pulls the student toward the expert; empty mask => exactly zero; missing
projector with --imitate => error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl.imitation import ImitationQuery, imitation_loss
from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig


def test_imitation_loss_masked():
    query = ImitationQuery(
        expert_obs=jnp.ones((4, 3)), sample_mask=jnp.array([1.0, 1.0, 0.0, 0.0]), action_indices=(0, 1)
    )
    student = jnp.zeros((4, 2))
    expert = jnp.ones((4, 2))
    loss = imitation_loss(query, student, expert)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)


def test_imitation_loss_empty_mask_zero():
    query = ImitationQuery(expert_obs=jnp.ones((4, 3)), sample_mask=jnp.zeros(4), action_indices=(0,))
    loss = imitation_loss(query, jnp.ones((4, 1)) * 5, jnp.zeros((4, 1)))
    assert float(loss) == 0.0


def test_ppo_with_stub_projector_produces_loss():
    env = make_env("cartpole")
    cfg = PPOConfig(num_envs=4, rollout_len=4, minibatch_size=16, epochs=1, max_traj_len=20, seed=0)

    def projector(obs_batch):
        return ImitationQuery(
            expert_obs=obs_batch, sample_mask=jnp.ones(obs_batch.shape[0]), action_indices=(0,)
        )

    def expert_apply(params, obs):
        return jnp.ones((obs.shape[0], 1)) * 0.5  # constant expert action

    ppo = PPO(env, cfg, imitation_projector=projector, expert_apply=expert_apply, expert_params=None)
    ts = ppo.init_state(jax.random.PRNGKey(0))
    ts2, metrics = ppo._train_iter(ts)
    assert float(metrics["imitation_loss"]) > 0.0
    assert np.isfinite(float(metrics["imitation_loss"]))


def test_h1_walk_has_projector():
    env = make_env("h1_walk")
    proj = env.imitation_projector()
    q = proj(jnp.zeros((3, env.obs_size)))
    assert q.expert_obs.shape == (3, env.obs_size)
    assert q.action_indices == tuple(range(env.action_size))
