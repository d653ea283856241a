"""Actor / critic networks (Flax Linen).

Capabilities matching /root/reference/rl/policies/{actor,critic,base}.py:
  * feed-forward Gaussian actor: 2x256 ReLU trunk -> mean head, fixed or
    learned per-dim exploration std (init 0.223), optional tanh bound
  * feed-forward critic: same trunk -> scalar value
  * LSTM actor/critic: 2x256 LSTMCell stack with explicit hidden state,
    hidden reset at episode boundaries (the reference resets per trajectory,
    actor.py:268-272)
  * column-normalized ("normc") gaussian init, output layers scaled x0.01
    (base.py:5-22)

Observation normalization is applied by the caller (the trainer owns the
normalization statistics and they are saved in checkpoints, keeping
checkpoints self-contained like the reference's embedded obs_mean/obs_std).

Design deviation: exploration std is parameterized as log_std (exp'd in the
distribution) rather than raw std, so a learned std cannot go negative.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def normc_init(scale: float = 1.0):
    """Column-normalized gaussian init (reference base.py:5-15)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype)
        w = w / jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
        return w * scale

    return init


class MLPTrunk(nn.Module):
    """2x256 ReLU trunk. `dtype` sets the COMPUTE precision of the hidden
    matmuls (params stay float32): bfloat16 runs them single-pass on the
    TPU MXU (~3x faster than float32's multi-pass emulation); the output
    heads stay float32 so action means / values keep full precision."""

    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, kernel_init=normc_init(1.0), dtype=self.dtype)(x))
        return x


class GaussianActor(nn.Module):
    """FF Gaussian actor (reference Gaussian_FF_Actor, actor.py:122-189)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    init_std: float = 0.223
    learn_std: bool = False
    bounded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = MLPTrunk(self.hidden, dtype=self.dtype)(obs)
        mean = nn.Dense(self.action_dim, kernel_init=normc_init(0.01), dtype=jnp.float32)(x)
        if self.bounded:
            mean = jnp.tanh(mean)
        if self.learn_std:
            log_std = self.param("log_std", lambda _: jnp.full((self.action_dim,), jnp.log(self.init_std)))
        else:
            log_std = jnp.full((self.action_dim,), jnp.log(self.init_std))
        return mean, jnp.broadcast_to(log_std, mean.shape)


class Critic(nn.Module):
    """FF value function (reference FF_V, critic.py:15-50)."""

    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        x = MLPTrunk(self.hidden, dtype=self.dtype)(obs)
        return nn.Dense(1, kernel_init=normc_init(0.01), dtype=jnp.float32)(x)[..., 0]


class LSTMCore(nn.Module):
    """Stacked LSTM cells with explicit carried state."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, carry, x):
        new_carry = []
        for i, h in enumerate(self.hidden):
            cell = nn.OptimizedLSTMCell(h, name=f"lstm{i}")
            c, x = cell(carry[i], x)
            new_carry.append(c)
        return tuple(new_carry), x

    @staticmethod
    def initial_carry(hidden: Sequence[int], batch_shape: tuple = ()):
        return tuple(
            (jnp.zeros(batch_shape + (h,)), jnp.zeros(batch_shape + (h,))) for h in hidden
        )


class GaussianLSTMActor(nn.Module):
    """Recurrent Gaussian actor (reference Gaussian_LSTM_Actor, actor.py:191-286)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    init_std: float = 0.223
    learn_std: bool = False
    bounded: bool = False

    @nn.compact
    def __call__(self, carry, obs):
        carry, x = LSTMCore(self.hidden)(carry, obs)
        mean = nn.Dense(self.action_dim, kernel_init=normc_init(0.01))(x)
        if self.bounded:
            mean = jnp.tanh(mean)
        if self.learn_std:
            log_std = self.param("log_std", lambda _: jnp.full((self.action_dim,), jnp.log(self.init_std)))
        else:
            log_std = jnp.full((self.action_dim,), jnp.log(self.init_std))
        return carry, (mean, jnp.broadcast_to(log_std, mean.shape))


class LSTMCritic(nn.Module):
    """Recurrent value function (reference LSTM_V, critic.py:52-112)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, carry, obs):
        carry, x = LSTMCore(self.hidden)(carry, obs)
        return carry, nn.Dense(1, kernel_init=normc_init(0.01))(x)[..., 0]


# --- Gaussian distribution helpers (reference rl/distributions/gaussian.py) --


def gaussian_logp(mean, log_std, action):
    """Sum of per-dim Normal log probs."""
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def gaussian_sample(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)


def gaussian_kl(mean_a, log_std_a, mean_b, log_std_b):
    """KL(a || b), summed over action dims."""
    var_a, var_b = jnp.exp(2 * log_std_a), jnp.exp(2 * log_std_b)
    return jnp.sum(
        log_std_b - log_std_a + (var_a + (mean_a - mean_b) ** 2) / (2 * var_b) - 0.5, axis=-1
    )
