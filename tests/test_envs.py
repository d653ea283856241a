"""Environment contract tests, parametrized over the registry.

Mirrors the reference's per-env contract suite
(/root/reference/tests/test_environments.py): space shapes, reset validity,
NaN/Inf-free stepping including extreme actions, reward components summing to
the scalar reward, mirror/clock index validity, cross-env API consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learninghumanoidwalking_tpu.envs import ENVIRONMENTS, make_env

ENV_NAMES = sorted(ENVIRONMENTS)


class EnvHandle:
    """Env + shared jitted reset/step (compiled once per module)."""

    def __init__(self, env):
        self.env = env
        self.reset = jax.jit(env.reset)
        self.step = jax.jit(env.step)

    def __getattr__(self, name):
        return getattr(self.env, name)


@pytest.fixture(scope="module")
def envs():
    built = {}
    for name in ENV_NAMES:
        try:
            built[name] = EnvHandle(make_env(name))
        except ModuleNotFoundError as e:  # env not implemented yet
            built[name] = e
    return built


@pytest.fixture(autouse=True)
def _skip_unimplemented(request, envs):
    if "name" in getattr(request, "fixturenames", ()):  # parametrized tests
        name = request.getfixturevalue("name")
        if isinstance(envs.get(name), Exception):
            pytest.skip(f"{name} not implemented yet: {envs[name]}")


@pytest.fixture(scope="module")
def reset_states(envs):
    return {
        name: env.reset(jax.random.PRNGKey(0))
        for name, env in envs.items()
        if not isinstance(env, Exception)
    }


@pytest.mark.parametrize("name", ENV_NAMES)
def test_reset_valid(envs, reset_states, name):
    env, state = envs[name], reset_states[name]
    assert state.obs.shape == (env.obs_size,)
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert bool(jnp.all(jnp.isfinite(state.physics.qpos)))
    assert not bool(state.done)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_step_finite(envs, reset_states, name):
    env, state = envs[name], reset_states[name]
    step = env.step
    for i in range(3):
        action = jnp.sin(jnp.arange(env.action_size) + i) * 0.3
        state = step(state, action)
        assert state.obs.shape == (env.obs_size,)
        assert bool(jnp.all(jnp.isfinite(state.obs))), f"{name} obs not finite at step {i}"
        assert bool(jnp.isfinite(state.reward))


@pytest.mark.parametrize("name", ENV_NAMES)
def test_extreme_actions_finite(envs, reset_states, name):
    env, state = envs[name], reset_states[name]
    step = env.step
    for action in (jnp.full((env.action_size,), 10.0), jnp.full((env.action_size,), -10.0)):
        s = step(state, action)
        assert bool(jnp.all(jnp.isfinite(s.obs))), f"{name} blew up on extreme action"


@pytest.mark.parametrize("name", ENV_NAMES)
def test_reward_components_sum(envs, reset_states, name):
    env, state = envs[name], reset_states[name]
    state = env.step(state, jnp.zeros(env.action_size))
    total = float(state.reward)
    comps = np.asarray(state.reward_components)
    assert len(env.reward_names) == comps.shape[0]
    np.testing.assert_allclose(total, comps.sum(), rtol=1e-5)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_mirror_indices_valid(envs, name):
    env = envs[name]
    if env.mirrored_obs is None:
        pytest.skip("env has no mirror spec")
    base_len = env.base_obs_len
    assert len(env.mirrored_obs) == base_len
    srcs = sorted(int(round(abs(i))) if abs(abs(i) - 0.1) > 1e-9 else 0 for i in env.mirrored_obs)
    assert srcs == list(range(base_len)), f"{name}: mirror indices must be a permutation"
    assert len(env.mirrored_acts) == env.action_size
    from learninghumanoidwalking_tpu.rl.mirror import obs_symmetry_matrix, symmetry_matrix

    m_obs = obs_symmetry_matrix(env.mirrored_obs, env.clock_inds, env.history_len)
    m_act = symmetry_matrix(env.mirrored_acts)
    # mirroring twice = identity
    np.testing.assert_allclose(m_obs @ m_obs, np.eye(m_obs.shape[0]), atol=1e-6)
    np.testing.assert_allclose(m_act @ m_act, np.eye(m_act.shape[0]), atol=1e-6)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_obs_normalization_shapes(envs, name):
    env = envs[name]
    if env.obs_mean is None:
        pytest.skip("running normalization env")
    assert np.asarray(env.obs_mean).shape == (env.obs_size,)
    assert np.asarray(env.obs_std).shape == (env.obs_size,)
    assert np.all(np.asarray(env.obs_std) > 0)


@pytest.mark.parametrize("name", ENV_NAMES)
def test_vmapped_reset_and_step(envs, name):
    env = envs[name]
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states = jax.jit(jax.vmap(env.reset))(keys)
    actions = jnp.zeros((4, env.action_size))
    out = jax.jit(jax.vmap(env.step))(states, actions)
    assert out.obs.shape == (4, env.obs_size)
    assert bool(jnp.all(jnp.isfinite(out.obs)))


def test_api_consistency(envs):
    for name, env in envs.items():
        if isinstance(env, Exception):
            continue
        assert hasattr(env, "obs_size") and hasattr(env, "action_size")
        assert hasattr(env, "reward_names")
        assert callable(env.reset) and callable(env.step)
