"""Seeding utilities.

Replaces /root/reference/rl/utils/seeding.py. Under JAX, determinism is
structural: all stochasticity flows through explicit PRNG keys, so "global
seeding" reduces to choosing the root key; the reference's worker-seed
spreading (seeding.py:33-52) maps to jax.random.fold_in / split, which are
collision-free by construction.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def set_global_seeds(seed: int) -> jax.Array:
    """Seed host-side RNGs (plan generation, python-level shuffles) and
    return the root JAX key."""
    random.seed(seed)
    np.random.seed(seed % 2**32)
    return jax.random.PRNGKey(seed)


def env_keys(root_key: jax.Array, num_envs: int) -> jax.Array:
    """Per-env keys (the analog of per-worker seeds, seeding.py:33-52)."""
    return jax.random.split(root_key, num_envs)
