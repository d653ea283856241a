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


# ---------------------------------------------------------------------------
# name / address lookups (robot_interface.py:87-149) — static metadata, so
# these return plain Python values usable at trace time
# ---------------------------------------------------------------------------


def jnt_id_by_name(model: Model, name: str) -> int:
    """Body index owning the named joint (get_jnt_id_by_name, :87-88)."""
    return model.joint_names.index(name)


def jnt_qposadr_by_name(model: Model, name: str) -> int:
    """(get_jnt_qposadr_by_name, :90-91)."""
    return model.body_qpos_adr[model.joint_names.index(name)]


def jnt_qveladr_by_name(model: Model, name: str) -> int:
    """(get_jnt_qveladr_by_name, :93-94)."""
    return model.body_dof_adr[model.joint_names.index(name)]


def motor_names(model: Model) -> tuple:
    """(get_motor_names, :124-126)."""
    return model.actuator_names


def actuated_joint_inds(model: Model) -> tuple:
    """Body indices of actuated joints (get_actuated_joint_inds, :128-134)."""
    return model.actuator_body


def actuated_joint_names(model: Model) -> tuple:
    """(get_actuated_joint_names, :136-142)."""
    return tuple(model.joint_names[b] for b in model.actuator_body)


def motor_qposadr(model: Model) -> tuple:
    """(get_motor_qposadr, :144-149)."""
    return model.actuator_qpos


def gear_ratios(model: Model):
    """(get_gear_ratios, :118-122)."""
    return model.actuator_gear


def act_joint_ranges(model: Model):
    """(nu, 2) actuated-joint position limits (get_act_joint_ranges,
    :201-207). Joint limits are not enforced by the engine (the shipped
    robots rely on PD targets + termination, as the reference envs do), so
    this reports the ctrlrange-derived bounds."""
    return model.actuator_ctrlrange


def actuator_ctrl_range(model: Model):
    """(get_actuator_ctrl_range, :216-221)."""
    return model.actuator_ctrlrange


# ---------------------------------------------------------------------------
# raw state accessors (robot_interface.py:75-85, 229-250)
# ---------------------------------------------------------------------------


def qpos(state: PhysicsState) -> jnp.ndarray:
    return state.qpos


def qvel(state: PhysicsState) -> jnp.ndarray:
    return state.qvel


def qacc(state: PhysicsState) -> jnp.ndarray:
    return state.qacc


def cvel(state: PhysicsState) -> jnp.ndarray:
    return state.cvel


def root_body_pos(model: Model, state: PhysicsState, root: int = 1) -> jnp.ndarray:
    """(get_root_body_pos, :229-230)."""
    return state.xpos[root]


def root_body_vel(model: Model, state: PhysicsState, root: int = 1):
    """6-vel of the root body frame (get_root_body_vel, :232-234)."""
    return body_velocity(model, state, root)


def object_xpos_by_name(model: Model, state: PhysicsState, name: str) -> jnp.ndarray:
    """(get_object_xpos_by_name OBJ_BODY, :382-390)."""
    return state.xpos[model.body_names.index(name)]


def object_xquat_by_name(model: Model, state: PhysicsState, name: str) -> jnp.ndarray:
    """(get_object_xquat_by_name OBJ_BODY, :392-402)."""
    return state.xquat[model.body_names.index(name)]


def object_affine_by_name(model: Model, state: PhysicsState, name: str) -> jnp.ndarray:
    """(4, 4) homogeneous transform (get_object_affine_by_name, :404-408)."""
    bi = model.body_names.index(name)
    rot = maths.quat_to_mat(state.xquat[bi])
    top = jnp.concatenate([rot, state.xpos[bi][:, None]], axis=1)
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])])


def body_ext_force(model: Model, params, body: int) -> jnp.ndarray:
    """Applied external wrench on a body (get_body_ext_force, :96-97 reads
    xfrc_applied; ours lives in DynParams.xfrc)."""
    return params.xfrc[body]


# ---------------------------------------------------------------------------
# contacts / GRF (robot_interface.py:252-355)
# ---------------------------------------------------------------------------


def _foot_slot_mask(model: Model, geoms) -> jnp.ndarray:
    from learninghumanoidwalking_tpu.physics import engine as _eng

    spg = _eng.slots_per_geom(model)
    sel = []
    for gi in model.foot_geoms:
        sel += [1.0 if gi in geoms else 0.0] * spg
    return jnp.asarray(sel)


def body_floor_contacts(model: Model, state: PhysicsState, geoms) -> jnp.ndarray:
    """Active-contact mask restricted to the given foot geoms
    (get_body_floor_contacts, :252-267)."""
    return state.contact.mask * _foot_slot_mask(model, geoms)


def rfoot_floor_contacts(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_rfoot_floor_contacts, :269-284)."""
    return body_floor_contacts(model, state, model.right_foot_geoms)


def lfoot_floor_contacts(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_lfoot_floor_contacts, :286-301)."""
    return body_floor_contacts(model, state, model.left_foot_geoms)


def body_contact_force(model: Model, state: PhysicsState, geoms) -> jnp.ndarray:
    """Summed |contact force| over the given geoms' active slots
    (get_body_contact_force, :327-341)."""
    fmag = jnp.linalg.norm(state.contact.force, axis=-1) * state.contact.mask
    return jnp.sum(fmag * _foot_slot_mask(model, geoms))


def rfoot_grf(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_rfoot_grf, :303-313)."""
    return body_contact_force(model, state, model.right_foot_geoms)


def lfoot_grf(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_lfoot_grf, :315-325)."""
    return body_contact_force(model, state, model.left_foot_geoms)


def check_rfoot_floor_collision(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(check_rfoot_floor_collision, :442-446)."""
    return jnp.any(rfoot_floor_contacts(model, state) > 0)


def check_lfoot_floor_collision(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(check_lfoot_floor_collision, :448-452)."""
    return jnp.any(lfoot_floor_contacts(model, state) > 0)


def check_bad_collisions(model: Model, state: PhysicsState) -> jnp.ndarray:
    """Non-foot body touching the ground. In the fixed-slot contact system
    only feet carry contact slots, so the reference's check (:454-470)
    reduces to the self-collision proxy + termination heuristics the tasks
    already use; provided for surface parity."""
    from learninghumanoidwalking_tpu.physics import engine as _eng

    return _eng.self_collision(model, state.xpos, state.xquat)


def rfoot_body_pos(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_rfoot_body_pos, :242-245)."""
    return state.xpos[model.geom_body[model.right_foot_geoms[0]]]


def lfoot_body_pos(model: Model, state: PhysicsState) -> jnp.ndarray:
    """(get_lfoot_body_pos, :247-250)."""
    return state.xpos[model.geom_body[model.left_foot_geoms[0]]]


def rfoot_body_vel(model: Model, state: PhysicsState):
    """(get_rfoot_body_vel, :366-372)."""
    return body_velocity(model, state, model.geom_body[model.right_foot_geoms[0]])


def lfoot_body_vel(model: Model, state: PhysicsState):
    """(get_lfoot_body_vel, :374-380)."""
    return body_velocity(model, state, model.geom_body[model.left_foot_geoms[0]])


def interaction_force(model: Model, state: PhysicsState) -> jnp.ndarray:
    """Total |contact force| across all active slots (get_interaction_force,
    :343-355 sums contact forces between the robot and the world)."""
    return jnp.sum(jnp.linalg.norm(state.contact.force, axis=-1) * state.contact.mask)
