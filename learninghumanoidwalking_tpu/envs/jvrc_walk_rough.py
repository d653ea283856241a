"""JVRC-1 robust walking on uneven, compliant terrain with full domain
randomization — the 'paper 1' robust-walking setup (BASELINE.json config 5;
the reference reaches it via WalkingTask(manip_hfield=True) heightfield
jitter, walking_task.py:173-179, plus compliant contact parameters and the
domain-randomization stack).

Terrain: a per-env continuous heightfield (16x16 node grid, 0.25 m cells,
heights U(0, 0.035) — the reference's hfield z range of 1.5-3.5 cm) sampled
bilinearly under every foot corner, resampled per episode and occasionally
mid-episode (the reference's mid-walk hfield re-jitter). Feet straddling a
slope get per-corner tilted contact normals — the continuous-contact case
the round-2 bump-box approximation could not produce. Contacts use a softer
solref (longer timeconst) for compliant ground.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from learninghumanoidwalking_tpu.envs.humanoid import load_config
from learninghumanoidwalking_tpu.envs.jvrc_walk import JvrcWalkEnv
from learninghumanoidwalking_tpu.models import jvrc
from learninghumanoidwalking_tpu.physics.engine import Terrain
from learninghumanoidwalking_tpu.physics.spec import lower
from learninghumanoidwalking_tpu.tasks import walking

HF_RES = 16  # nodes per side
HF_CELL = 0.25  # m between nodes: grid spans 3.75 m x 3.75 m
HF_X0Y0 = (-1.2, -1.875)  # forward walking corridor; flat beyond (clamped)
HF_MAX = 0.035  # reference hfield z range 0.015-0.035 m


def _sample_hfield(key) -> Terrain:
    heights = jax.random.uniform(key, (HF_RES, HF_RES), minval=0.0, maxval=HF_MAX)
    return Terrain(
        pos=jnp.zeros((0, 3)),
        size=jnp.zeros((0, 3)),
        yaw=jnp.zeros((0,)),
        floor_z=jnp.zeros(()),
        hfield=heights,
        hfield_x0y0=jnp.asarray(HF_X0Y0),
        hfield_cell=jnp.asarray([HF_CELL, HF_CELL]),
    )


@struct.dataclass
class RoughWalkState:
    walk: walking.WalkingState
    terrain: Terrain


class JvrcWalkRoughEnv(JvrcWalkEnv):
    def __init__(self, path_to_yaml: str | None = None):
        # reuse the jvrc_walk setup, then swap in the compliant-contact model
        # and the DR-enabled config
        super().__init__(None)
        self.cfg = load_config("jvrc_rough.yaml", path_to_yaml)
        self.spec = jvrc.jvrc_spec(timeconst=0.04)
        self.model = lower(self.spec)
        self._finalize()
        self.has_terrain = True  # hfield-only terrain (model.nterrain == 0)
        # hfield kernels carry per-env heightfield blocks and sit near the
        # VMEM scope like the box-terrain ones — exact R=1 semantics here
        # (see envs/humanoid.py reuse note; pd_substeps_kernel clamps too)
        self.physics_reuse = 1
        self._setup_walking()
        self._setup_mirror()

    # task hooks wrap the walking task with per-episode terrain -------------

    def _task_reset(self, key, iteration, physics):
        k1, k2 = jax.random.split(key)
        return RoughWalkState(walk=walking.reset(k1, self.period), terrain=_sample_hfield(k2))

    def _task_step(self, key, task, physics):
        k1, k2, k3 = jax.random.split(key, 3)
        walk = walking.step(k1, task.walk, self.period, self.dbl_support)
        # occasional terrain re-jitter while walking (walking_task.py:173-179)
        rejitter = jnp.logical_and(
            jax.random.randint(k2, (), 0, 200) == 0, walk.mode != walking.STANDING
        )
        new_terrain = _sample_hfield(k3)
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

    def render_markers(self, state) -> dict:
        """Walking-mode overlay (task state is wrapped in RoughWalkState) plus
        the episode's heightfield so eval renders show the actual terrain
        (rl/render_gl.py injects it as a real MuJoCo hfield asset)."""
        return {
            "mode": self.MODE_NAMES[int(state.task.walk.mode)],
            "mode_ref": np.asarray(state.task.walk.mode_ref),
            "hfield": np.asarray(state.task.terrain.hfield),
            "hfield_x0y0": np.asarray(state.task.terrain.hfield_x0y0),
            "hfield_cell": np.asarray(state.task.terrain.hfield_cell),
        }
