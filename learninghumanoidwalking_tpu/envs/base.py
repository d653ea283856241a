"""Functional environment API.

The reference exposes a gym-like stateful env (BaseHumanoidEnv.step/reset,
/root/reference/envs/common/base_humanoid_env.py:199-276). The TPU-native
equivalent is a *pure functional* env: `reset(key) -> EnvState` and
`step(state, action) -> EnvState`, where EnvState is a pytree that lives on
device and is vmapped over thousands of environments inside a jitted
`lax.scan` rollout. All stochasticity threads through an explicit PRNG key.

Env objects themselves are static Python configuration (model arrays, gains,
obs layout) closed over by the jitted functions — the analog of the compiled
MjModel plus the reference's env attributes (observation_space, action_space,
mirrored_obs/acts, obs_mean/obs_std).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Per-environment dynamic state (one env; batch via vmap)."""

    physics: Any  # PhysicsState
    dyn: Any  # DynParams (domain-randomization surface)
    task: Any  # task-specific pytree (phase, mode, targets, terrain, ...)
    obs: jnp.ndarray  # current observation (with history stacking applied)
    obs_history: jnp.ndarray  # (history_len, base_obs_len) rolling buffer
    prev_prediction: jnp.ndarray  # last raw policy output (action smoothing)
    prev_action: jnp.ndarray  # last smoothed+offset joint target (reward calc)
    prev_torque: jnp.ndarray  # last joint torques (reward calc)
    reward: jnp.ndarray  # () scalar reward of the last step
    reward_components: jnp.ndarray  # (n_reward_terms,) fixed-order vector
    done: jnp.ndarray  # () bool
    steps: jnp.ndarray  # () int32 episode step counter
    iteration: jnp.ndarray  # () int32 training iteration (curriculum)
    key: jnp.ndarray  # PRNG key
    motor: Any = None  # MotorState when the motor-dynamics hook is enabled


class Env:
    """Static environment definition. Subclasses implement reset/step.

    Required attributes (set in __init__):
      obs_size, action_size: int
      base_obs_len, history_len: int
      reward_names: tuple[str, ...] (fixed order of reward_components)
      control_dt, sim_dt: float
      model: physics Model
    Optional attributes:
      obs_mean, obs_std: np arrays (fixed normalization; absent -> running)
      mirrored_obs, mirrored_acts: signed index lists for symmetry learning
      clock_inds: list[int] (observation indices holding the phase clock)
    """

    obs_mean = None
    obs_std = None
    mirrored_obs = None
    mirrored_acts = None
    clock_inds = None

    def reset(self, key: jnp.ndarray, iteration: jnp.ndarray | None = None) -> EnvState:
        raise NotImplementedError

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        raise NotImplementedError

    # Batched entry points used by the trainer. Default: plain vmap. Heavy
    # envs override these to route physics through the batch-in-lanes engine
    # (physics/batched.py) while vmapping only the cheap task/obs logic.

    def step_batch(self, states: EnvState, actions: jnp.ndarray) -> EnvState:
        import jax

        return jax.vmap(self.step)(states, actions)

    def reset_batch(self, keys: jnp.ndarray, iteration: jnp.ndarray | None = None) -> EnvState:
        import jax

        if iteration is None:
            return jax.vmap(lambda k: self.reset(k))(keys)
        return jax.vmap(self.reset)(keys, iteration)

    # -- helpers shared by all envs -----------------------------------------

    def stack_history(self, obs_history: jnp.ndarray, obs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Push obs into the rolling history buffer; newest first.

        Matches the reference's deque-with-appendleft + flatten
        (base_humanoid_env.py:177-197).
        """
        new_hist = jnp.roll(obs_history, 1, axis=0).at[0].set(obs)
        return new_hist, new_hist.reshape(-1)
