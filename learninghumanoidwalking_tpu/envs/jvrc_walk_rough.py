"""JVRC-1 robust walking on uneven, compliant terrain with full domain
randomization — the 'paper 1' robust-walking setup (BASELINE.json config 5;
the reference reaches it via WalkingTask(manip_hfield=True) heightfield
jitter, walking_task.py:173-179, plus compliant contact parameters and the
domain-randomization stack).

Terrain: N low yaw-rotated bump boxes (1.5–3.5 cm tall, matching the
reference's hfield z range of -0.015..-0.035) randomly placed around the
walking corridor, resampled per episode and occasionally mid-episode.
Contacts use a softer solref (longer timeconst) for compliant ground.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.envs.humanoid import load_config
from learninghumanoidwalking_tpu.envs.jvrc_walk import JvrcWalkEnv
from learninghumanoidwalking_tpu.models import jvrc
from learninghumanoidwalking_tpu.physics.engine import Terrain
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import walking

N_BUMPS = 24


@struct.dataclass
class RoughWalkState:
    walk: walking.WalkingState
    terrain: Terrain


def _sample_bumps(key) -> Terrain:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xy = jax.random.uniform(k1, (N_BUMPS, 2), minval=jnp.array([-2.0, -3.0]), maxval=jnp.array([8.0, 3.0]))
    half = jax.random.uniform(k2, (N_BUMPS, 2), minval=0.3, maxval=0.8)
    height = jax.random.uniform(k3, (N_BUMPS,), minval=0.015, maxval=0.035)
    yaw = jax.random.uniform(k4, (N_BUMPS,), minval=-jnp.pi, maxval=jnp.pi)
    # boxes sit half-buried so their top face is `height` above the floor
    pos = jnp.concatenate([xy, (height - 0.1)[:, None]], axis=1)
    size = jnp.concatenate([half, jnp.full((N_BUMPS, 1), 0.1)], axis=1)
    return Terrain(pos=pos, size=size, yaw=yaw, floor_z=jnp.zeros(()))


class JvrcWalkRoughEnv(JvrcWalkEnv):
    def __init__(self, path_to_yaml: str | None = None):
        # reuse the jvrc_walk setup, then swap in the terrain-enabled,
        # compliant-contact model and the DR-enabled config
        super().__init__(None)
        self.cfg = load_config("jvrc_rough.yaml", path_to_yaml)
        self.model = lower(jvrc.jvrc_spec(nterrain=N_BUMPS, timeconst=0.04))
        self._finalize()
        self._setup_walking()
        self._setup_mirror()

    # task hooks wrap the walking task with per-episode terrain -------------

    def _task_reset(self, key, iteration, physics):
        k1, k2 = jax.random.split(key)
        return RoughWalkState(walk=walking.reset(k1, self.period), terrain=_sample_bumps(k2))

    def _task_step(self, key, task, physics):
        k1, k2, k3 = jax.random.split(key, 3)
        walk = walking.step(k1, task.walk, self.period, self.dbl_support)
        # occasional terrain re-jitter while walking (walking_task.py:173-179)
        rejitter = jnp.logical_and(
            jax.random.randint(k2, (), 0, 200) == 0, walk.mode != walking.STANDING
        )
        new_terrain = _sample_bumps(k3)
        terrain = jax.tree.map(
            lambda a, b: jnp.where(rejitter, a, b), new_terrain, task.terrain
        )
        return RoughWalkState(walk=walk, terrain=terrain)

    def _external_obs(self, task) -> jnp.ndarray:
        return walking.external_obs(task.walk, self.period)

    def _terrain(self, task):
        return task.terrain

    def _reward(self, state, physics, task, target):
        # delegate to the walking reward with the inner walk state
        proxy = state.replace(task=task.walk)
        return super()._reward(proxy, physics, task.walk, target)
