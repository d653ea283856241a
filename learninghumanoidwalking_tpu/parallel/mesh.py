"""Device-mesh utilities: multi-chip data parallelism for PPO training.

The reference's only parallelism is data-parallel env sampling over Ray CPU
actors with per-iteration weight broadcast / trajectory gather
(/root/reference/rl/algos/ppo.py:215-250, SURVEY.md §2.2). The TPU-native
equivalent: the env batch (every leading-(num_envs) leaf of the EnvState and
rollout) is sharded over the mesh 'data' axis, parameters / optimizer state /
normalization stats are replicated, and XLA inserts the gradient all-reduce
over ICI automatically — there is no explicit communication code, matching
the jax.sharding recipe (pick a mesh, annotate, let XLA insert collectives).

Weight "broadcast" is free (replicated params); per-iteration host<->device
traffic is a handful of metric scalars.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_train_state(ts, mesh: Mesh, num_envs: int):
    """Place a TrainState on the mesh: env batch sharded, everything else
    replicated. Works for any pytree whose env-batch leaves have a leading
    num_envs dimension."""
    data = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data)
        return jax.device_put(x, replicated)

    env_state = jax.tree.map(place, ts.env_state)
    rest = jax.tree.map(lambda x: jax.device_put(x, replicated),
                        ts.replace(env_state=None))
    return rest.replace(env_state=env_state)
