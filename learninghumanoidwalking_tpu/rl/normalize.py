"""Running observation normalization (Welford parallel merge).

Replaces /root/reference/rl/envs/normalize.py:4-62 with a functional jnp
implementation. Used only when the env does not provide fixed
obs_mean/obs_std (the cartpole path). The PPO trainer updates these stats for
a fixed warmup period and then freezes them (reference ppo.py:441-457).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningNorm:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # ()

    @property
    def std(self) -> jnp.ndarray:
        return jnp.sqrt(jnp.maximum(self.var, 1e-8))

    def normalize(self, obs: jnp.ndarray) -> jnp.ndarray:
        return (obs - self.mean) / self.std


def init_norm(shape, mean=None, std=None) -> RunningNorm:
    if mean is not None:
        return RunningNorm(
            mean=jnp.asarray(mean, dtype=jnp.float32),
            var=jnp.square(jnp.asarray(std, dtype=jnp.float32)),
            count=jnp.asarray(1e8),  # effectively frozen
        )
    return RunningNorm(mean=jnp.zeros(shape), var=jnp.ones(shape), count=jnp.asarray(1e-4))


def update_norm(norm: RunningNorm, batch: jnp.ndarray) -> RunningNorm:
    """Welford parallel merge of batch moments (normalize.py:33-62)."""
    batch = batch.reshape(-1, batch.shape[-1])
    b_mean = jnp.mean(batch, axis=0)
    b_var = jnp.var(batch, axis=0)
    b_count = batch.shape[0]

    delta = b_mean - norm.mean
    tot = norm.count + b_count
    new_mean = norm.mean + delta * b_count / tot
    m_a = norm.var * norm.count
    m_b = b_var * b_count
    m2 = m_a + m_b + jnp.square(delta) * norm.count * b_count / tot
    return RunningNorm(mean=new_mean, var=m2 / tot, count=tot)
