"""State accessors over (Model, PhysicsState).

The functional analog of the reference's RobotInterface
(/root/reference/envs/common/robot_interface.py): pure read-out functions for
quantities the MuJoCo wrapper exposes via sensors and mj_* calls — CoM,
subtree momentum, body velocities in world/local frames, actuated joint
state. Env classes use a few of these inline; the full set is provided for
API parity and downstream analysis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.physics.model import Model, PhysicsState
from learninghumanoidwalking_tpu.utils import maths


def body_coms(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(nbody, 3) world CoM of each body."""
    rmats = jax.vmap(maths.quat_to_mat)(state.xquat)
    return state.xpos + jnp.einsum("bij,bj->bi", rmats, model.body_ipos)


def robot_com(model: Model, state: PhysicsState) -> jnp.ndarray:
    """Whole-robot CoM (robot_interface.get_robot_com via subtree_com,
    :410-420)."""
    coms = body_coms(model, state)
    mass = model.body_mass
    return jnp.sum(mass[:, None] * coms, axis=0) / jnp.sum(mass)


def body_linear_momentum(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(3,) total linear momentum (subtree_linvel * mass equivalent,
    robot_interface.py:422-430)."""
    coms = body_coms(model, state)
    w, v0 = state.cvel[:, :3], state.cvel[:, 3:]
    v_com = v0 + jnp.cross(w, coms)
    return jnp.sum(model.body_mass[:, None] * v_com, axis=0)


def body_angular_momentum(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(3,) angular momentum about the robot CoM (subtree_angmom equivalent,
    robot_interface.py:432-440)."""
    coms = body_coms(model, state)
    com = robot_com(model, state)
    rmats = jax.vmap(maths.quat_to_mat)(state.xquat)
    iq = jax.vmap(maths.quat_to_mat)(model.body_iquat)
    rot = jnp.einsum("bij,bjk->bik", rmats, iq)
    i_world = jnp.einsum("bij,bj,bkj->bik", rot, model.body_inertia, rot)
    w, v0 = state.cvel[:, :3], state.cvel[:, 3:]
    v_com = v0 + jnp.cross(w, coms)
    spin = jnp.einsum("bij,bj->bi", i_world, w)
    orbital = jnp.cross(coms - com[None, :], model.body_mass[:, None] * v_com)
    return jnp.sum(spin + orbital, axis=0)


def body_velocity(model: Model, state: PhysicsState, body: int, local: bool = False):
    """(linear, angular) velocity of a body frame origin
    (mj_objectVelocity equivalent, robot_interface.py:357-364)."""
    w = state.cvel[body, :3]
    v = state.cvel[body, 3:] + jnp.cross(w, state.xpos[body])
    if local:
        q = state.xquat[body]
        v = maths.quat_rotate_inv(q, v)
        w = maths.quat_rotate_inv(q, w)
    return v, w


def act_joint_positions(model: Model, state: PhysicsState) -> jnp.ndarray:
    return state.qpos[jnp.asarray(model.actuator_qpos, dtype=jnp.int32)]


def act_joint_velocities(model: Model, state: PhysicsState) -> jnp.ndarray:
    return state.qvel[jnp.asarray(model.actuator_dof, dtype=jnp.int32)]


def act_joint_torques(model: Model, state: PhysicsState) -> jnp.ndarray:
    """Joint-level actuator torques (gear * ctrl; robot_interface.py:151-169)."""
    return state.act_torque


def total_mass(model: Model) -> float:
    return float(np.sum(np.asarray(model.body_mass)))
