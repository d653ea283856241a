"""Generalized Advantage Estimation as a reverse scan.

Replaces /root/reference/rl/storage/rollout_storage.py:53-85 (the per-path
backward GAE loop) with a batched `lax.scan(reverse=True)` over the time axis
of the on-device rollout. The reference's truncation-vs-termination
distinction (rollout_worker.py:162-167: bootstrap 0 if done, V(s') if
truncated) is preserved through the `terminated` flag: `next_value` is the
critic value of the post-step (pre-reset) observation and is zeroed only for
true terminations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,  # (T, B)
    values: jnp.ndarray,  # (T, B) V(s_t)
    next_values: jnp.ndarray,  # (T, B) V(s_{t+1}) pre-reset
    terminated: jnp.ndarray,  # (T, B) true episode ends (no bootstrap)
    done: jnp.ndarray,  # (T, B) terminated | truncated (advantage cut)
    gamma: float,
    lam: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), each (T, B)."""
    term = terminated.astype(rewards.dtype)
    cut = done.astype(rewards.dtype)

    def body(carry, xs):
        r, v, nv, tm, dn = xs
        delta = r + gamma * nv * (1.0 - tm) - v
        adv = delta + gamma * lam * (1.0 - dn) * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        body, jnp.zeros_like(rewards[0]), (rewards, values, next_values, term, cut), reverse=True
    )
    return advantages, advantages + values
