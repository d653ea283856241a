"""Cartpole swing-up environment (the framework's minimal on-ramp env).

Behavioral parity with /root/reference/envs/cartpole/cartpole_env.py:
  * sim_dt 5 ms, control_dt 20 ms (frame_skip 4)
  * obs (5,): [cart_pos, cos(angle), sin(angle), cart_vel, pole_vel]
  * action (1,): target cart position, clipped to +-0.8 before PD
  * PD kp=100 kd=10 at joint level, applied directly as ctrl (the reference's
    CartpoleRobot does not divide by gear, cartpole_env.py:42-52, so the
    actuator multiplies the PD torque by gear=50)
  * reward: hybrid linear+exp upright + center + velocity + action terms
  * termination: |cart_pos| > 0.99
  * no fixed obs_mean/obs_std -> exercises PPO's running normalization path
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.envs.base import Env, EnvState
from learninghumanoidwalking_tpu.models.cartpole import cartpole_spec
from learninghumanoidwalking_tpu.physics import engine
from learninghumanoidwalking_tpu.physics.model import default_dyn_params
from learninghumanoidwalking_tpu.physics.spec import lower

REWARD_NAMES = ("upright", "center", "velocity", "action")


class CartpoleEnv(Env):
    def __init__(self, path_to_yaml: str | None = None):
        self.sim_dt = 0.005
        self.control_dt = 0.02
        self.frame_skip = int(round(self.control_dt / self.sim_dt))
        self.spec = cartpole_spec()
        self.model = lower(self.spec)
        self.kp = jnp.array([100.0])
        self.kd = jnp.array([10.0])
        self.base_obs_len = 5
        self.history_len = 1
        self.obs_size = 5
        self.action_size = 1
        self.reward_names = REWARD_NAMES

    def _obs(self, physics) -> jnp.ndarray:
        x, theta = physics.qpos[0], physics.qpos[1]
        return jnp.stack([x, jnp.cos(theta), jnp.sin(theta), physics.qvel[0], physics.qvel[1]])

    def reset(self, key: jnp.ndarray, iteration=None) -> EnvState:
        k1, k2, k3, key = jax.random.split(key, 4)
        pole = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        qpos = jnp.array([0.0, 0.0]).at[1].set(pole) + jax.random.uniform(k2, (2,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(k3, (2,), minval=-0.1, maxval=0.1)
        physics = engine.make_state(self.model, qpos, qvel)
        obs = self._obs(physics)
        if iteration is None:
            iteration = jnp.zeros((), dtype=jnp.int32)
        return EnvState(
            physics=physics,
            dyn=default_dyn_params(self.model, self.kp, self.kd),
            task=None,
            obs=obs,
            obs_history=obs[None],
            prev_prediction=jnp.zeros(1),
            prev_action=jnp.zeros(1),
            prev_torque=jnp.zeros(1),
            reward=jnp.zeros(()),
            reward_components=jnp.zeros(len(REWARD_NAMES)),
            done=jnp.zeros((), dtype=bool),
            steps=jnp.zeros((), dtype=jnp.int32),
            iteration=jnp.asarray(iteration, dtype=jnp.int32),
            key=key,
        )

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        target = jnp.clip(action, -0.8, 0.8)

        def substep(physics, _):
            tau = self.kp * (target - physics.qpos[:1]) + self.kd * (0.0 - physics.qvel[:1])
            physics = engine.step(self.model, state.dyn, physics, tau, self.sim_dt)
            return physics, None

        physics, _ = jax.lax.scan(substep, state.physics, None, length=self.frame_skip)

        obs = self._obs(physics)
        components = self._reward(obs, target)
        done = jnp.abs(obs[0]) > 0.99
        return state.replace(
            physics=physics,
            obs=obs,
            obs_history=obs[None],
            prev_prediction=action,
            prev_action=target,
            reward=jnp.sum(components),
            reward_components=components,
            done=done,
            steps=state.steps + 1,
        )

    def _reward(self, obs: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        cart_pos, cos_angle, pole_vel = obs[0], obs[1], obs[4]
        # hybrid upright term: linear part gives gradient from any angle,
        # exp part sharpens near upright (cartpole_env.py:151-186)
        upright = 0.35 * (1.0 + cos_angle) / 2.0 + 0.35 * jnp.exp(-2.0 * (1.0 - cos_angle) ** 2)
        center = 0.1 * jnp.exp(-2.0 * cart_pos**2)
        velocity = 0.1 * jnp.exp(-0.05 * pole_vel**2)
        action_r = 0.1 * jnp.exp(-jnp.sum(action**2))
        return jnp.stack([upright, center, velocity, action_r])
