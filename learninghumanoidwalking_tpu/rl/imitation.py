"""Imitation-learning contract (expert distillation).

Replaces /root/reference/rl/algos/imitation.py:15-42: an env may provide an
`imitation_projector()` returning a pure function that maps a batch of policy
observations to an ImitationQuery. The PPO update feeds the expert
observations through a frozen expert policy and regresses the student's
deterministic actions (at `action_indices`) onto the expert's output, masked
by `sample_mask` (reference ppo.py:361-368). Fixed shapes: the mask selects
contributing samples via weighting rather than boolean indexing.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp


class ImitationQuery(NamedTuple):
    expert_obs: jnp.ndarray  # (N, expert_obs_dim)
    sample_mask: jnp.ndarray  # (N,) float/bool — which samples contribute
    action_indices: tuple  # static tuple of student action dims to supervise


ImitationProjector = Callable[[jnp.ndarray], ImitationQuery]


def imitation_loss(
    query: ImitationQuery, student_mean: jnp.ndarray, expert_mean: jnp.ndarray
) -> jnp.ndarray:
    """Masked MSE between student action means and frozen expert targets."""
    idx = jnp.asarray(query.action_indices, dtype=jnp.int32)
    pred = student_mean[:, idx]
    mask = query.sample_mask.astype(pred.dtype)[:, None]
    num = jnp.sum(mask) * pred.shape[-1]
    return jnp.sum(jnp.square(pred - expert_mean) * mask) / jnp.maximum(num, 1.0)
