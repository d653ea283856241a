"""learninghumanoidwalking_tpu — a TPU-native humanoid locomotion RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
rohanpsingh/LearningHumanoidWalking (reference mounted read-only at
/root/reference): PPO training of humanoid walking/stepping/standing policies
with a batched, fully on-device rigid-body physics engine replacing the MuJoCo
C engine, and jit-vmapped rollouts replacing Ray CPU workers.

Layers (bottom-up), mirroring the reference's layer map (SURVEY.md §1):
  physics/   batched rigid-body engine (FK, CRBA-style mass matrix, bias
             forces, contacts, semi-implicit Euler) — replaces mujoco C lib
  models/    declarative robot specs (cartpole, JVRC-1, Unitree H1) — replaces
             MJCF submodules + gen_xml model surgery
  robots/    PD-controlled frame-skipped substep loop — replaces
             robots/robot_base.py
  tasks/     pure-function rewards, walking/stepping/standing task state
  envs/      functional reset/step environments + registry
  rl/        on-device PPO (scan rollouts, GAE, mirror-symmetry loss,
             imitation, obs normalization, Orbax checkpoints)
  parallel/  jax.sharding mesh utilities for multi-chip data parallelism
  ops/       Pallas TPU kernels for hot paths
"""

__version__ = "0.1.0"
