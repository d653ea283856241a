"""Persistence / evaluation tests (reference tests/test_evaluation.py analog):
checkpoint roundtrips give identical outputs, experiment metadata roundtrip,
deterministic vs stochastic actions, policy loading + rollout, resume.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learninghumanoidwalking_tpu.envs import make_env
from learninghumanoidwalking_tpu.rl.checkpoint import Checkpointer, find_latest_run
from learninghumanoidwalking_tpu.rl.ppo import PPO, PPOConfig


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    env = make_env("cartpole")
    cfg = PPOConfig(
        num_envs=8, rollout_len=8, minibatch_size=32, epochs=1, max_traj_len=50, eval_freq=1, seed=0, input_norm_iters=1
    )
    ppo = PPO(env, cfg)
    ck = Checkpointer(tmp)
    ck.save_experiment({"env": "cartpole", "yaml": None, "std_dev": 0.223, "learn_std": False, "seed": 0})
    ts = ppo.train(n_itr=2, checkpointer=ck, verbose=False)
    return env, ppo, ck, ts, tmp


def test_checkpoint_roundtrip_identical_outputs(trained):
    env, ppo, ck, ts, tmp = trained
    target = jax.tree.map(jnp.zeros_like, ts)
    restored = ck.restore(target)
    obs = jnp.ones((4, env.obs_size))
    m1, _ = ppo.actor_def.apply(ts.actor_params, obs)
    m2, _ = ppo.actor_def.apply(restored.actor_params, obs)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_experiment_roundtrip(trained):
    _, _, _, _, tmp = trained
    meta = Checkpointer.load_experiment(tmp)
    assert meta["env"] == "cartpole"


def test_find_latest_run(trained):
    _, _, _, _, tmp = trained
    assert find_latest_run(tmp) == tmp
    assert find_latest_run(tmp.parent) is not None


def test_deterministic_vs_stochastic(trained):
    env, ppo, _, ts, _ = trained
    from learninghumanoidwalking_tpu.rl import networks

    obs = jnp.ones((4, env.obs_size))
    mean, log_std = ppo.actor_def.apply(ts.actor_params, obs)
    a1 = networks.gaussian_sample(jax.random.PRNGKey(0), mean, log_std)
    a2 = networks.gaussian_sample(jax.random.PRNGKey(1), mean, log_std)
    assert bool(jnp.any(a1 != a2))
    assert bool(jnp.all(mean == ppo.actor_def.apply(ts.actor_params, obs)[0]))


def test_load_policy_and_rollout(trained):
    _, _, _, _, tmp = trained
    from learninghumanoidwalking_tpu.rl.eval import load_policy

    apply_fn, params, (env, meta, norm, _) = load_policy(tmp, best=True)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for _ in range(5):
        action = apply_fn(params, state.obs)
        state = step(state, action)
        total += float(state.reward)
    assert np.isfinite(total)


def test_resume(trained):
    env, ppo, ck, ts, tmp = trained
    target = ppo.init_state(jax.random.PRNGKey(9))
    restored = ck.restore(target)
    assert int(restored.iteration) >= 1
    ts2, metrics = ppo._train_iter(restored)
    assert np.isfinite(float(metrics["actor_loss"]))
