"""Standalone action distributions.

Parity with /root/reference/rl/distributions/{beta,gaussian}.py — alternative
distributions kept available for experimentation (the shipped actors inline
their own Gaussian, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DiagonalGaussian:
    """Fixed-std diagonal Gaussian over unbounded actions
    (gaussian.py:8-33)."""

    def __init__(self, mean: jnp.ndarray, std: jnp.ndarray):
        self.mean = mean
        self.std = jnp.broadcast_to(std, mean.shape)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(key, self.mean.shape)

    def log_prob(self, x):
        z = (x - self.mean) / self.std
        return jnp.sum(-0.5 * z**2 - jnp.log(self.std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1)

    def entropy(self):
        return jnp.sum(jnp.log(self.std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


class Beta:
    """Beta(alpha, beta) over (0, 1) parameterized by softplus(logits)+1
    (beta.py:16-44)."""

    def __init__(self, alpha: jnp.ndarray, beta: jnp.ndarray):
        self.alpha = alpha
        self.beta = beta

    @staticmethod
    def from_logits(alpha_logits, beta_logits):
        return Beta(jax.nn.softplus(alpha_logits) + 1.0, jax.nn.softplus(beta_logits) + 1.0)

    def sample(self, key):
        return jax.random.beta(key, self.alpha, self.beta)

    def log_prob(self, x):
        x = jnp.clip(x, 1e-6, 1 - 1e-6)
        lp = (
            (self.alpha - 1) * jnp.log(x)
            + (self.beta - 1) * jnp.log1p(-x)
            - (jax.scipy.special.betaln(self.alpha, self.beta))
        )
        return jnp.sum(lp, axis=-1)

    def mean(self):
        return self.alpha / (self.alpha + self.beta)


class BoundedBeta(Beta):
    """Beta rescaled to [-1, 1] (beta.py:11-14)."""

    def sample(self, key):
        return 2.0 * super().sample(key) - 1.0

    def log_prob(self, x):
        return super().log_prob((x + 1.0) / 2.0)

    def mean(self):
        return 2.0 * super().mean() - 1.0
