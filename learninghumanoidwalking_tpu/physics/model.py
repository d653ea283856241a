"""Core physics data structures: Model (static), DynParams (per-env), PhysicsState.

The Model is the TPU-native analog of MuJoCo's compiled MjModel
(/root/reference/envs/common/mujoco_env.py:24-26): a set of static arrays
describing the kinematic tree, inertias, geoms, actuators, and contact
candidates. Structural metadata (tree topology, dof bookkeeping, names) is
kept as Python tuples marked as non-pytree fields so that jitted functions can
unroll over the (small, fixed) tree.

DynParams carries everything the reference mutates on MjModel/MjData at
runtime for domain randomization (/root/reference/envs/common/
domain_randomization.py:29-56 — dof damping/frictionloss, body mass/ipos —
plus xfrc_applied wrenches and randomized PD/back-EMF params), re-expressed as
per-env *state* so the traced model stays constant.

PhysicsState is the analog of MjData's used surface: qpos/qvel plus the
forward-kinematics and contact caches consumed by observations and rewards.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

# Joint type codes (static Python ints in Model metadata).
FREE = 0
HINGE = 1
SLIDE = 2

# Geom type codes.
PLANE = 0
SPHERE = 1
CAPSULE = 2
BOX = 3


@struct.dataclass
class Model:
    """Static physics model. Array leaves are jnp arrays; metadata is static."""

    # --- structural metadata (static, hashable) ---
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    # parent body index per body (world = 0, parent[0] = -1)
    body_parent: tuple = struct.field(pytree_node=False)
    # joint type per body (FREE/HINGE/SLIDE) or -1 for welded bodies
    jnt_type: tuple = struct.field(pytree_node=False)
    # first qpos / dof address per body (or -1)
    body_qpos_adr: tuple = struct.field(pytree_node=False)
    body_dof_adr: tuple = struct.field(pytree_node=False)
    body_dof_num: tuple = struct.field(pytree_node=False)
    # per-dof owning body
    dof_body: tuple = struct.field(pytree_node=False)
    # names
    body_names: tuple = struct.field(pytree_node=False)
    joint_names: tuple = struct.field(pytree_node=False)  # per body, "" if welded
    actuator_names: tuple = struct.field(pytree_node=False)
    geom_names: tuple = struct.field(pytree_node=False)
    # actuator -> (body index, dof address) of the actuated joint (1-dof joints only)
    actuator_body: tuple = struct.field(pytree_node=False)
    actuator_dof: tuple = struct.field(pytree_node=False)
    actuator_qpos: tuple = struct.field(pytree_node=False)
    # geoms
    geom_body: tuple = struct.field(pytree_node=False)
    geom_type: tuple = struct.field(pytree_node=False)
    # contact candidates: foot (box) geoms colliding with the floor plane
    foot_geoms: tuple = struct.field(pytree_node=False)  # geom indices
    # which foot each contact-geom belongs to: 'left' geom indices / 'right'
    left_foot_geoms: tuple = struct.field(pytree_node=False)
    right_foot_geoms: tuple = struct.field(pytree_node=False)
    # self-collision candidate pairs (geom index pairs, distance check only)
    self_pairs: tuple = struct.field(pytree_node=False)
    # number of contact slots (4 corners per foot geom vs floor)
    ncon: int = struct.field(pytree_node=False)
    # number of terrain boxes supported (0 = flat floor only)
    nterrain: int = struct.field(pytree_node=False)

    # --- array data ---
    body_pos: jnp.ndarray  # (nb, 3) frame offset in parent
    body_quat: jnp.ndarray  # (nb, 4)
    body_ipos: jnp.ndarray  # (nb, 3) CoM offset in body frame
    body_iquat: jnp.ndarray  # (nb, 4) inertial frame rotation
    body_mass: jnp.ndarray  # (nb,)
    body_inertia: jnp.ndarray  # (nb, 3) diagonal inertia in inertial frame
    jnt_axis: jnp.ndarray  # (nb, 3) joint axis in body frame
    jnt_pos: jnp.ndarray  # (nb, 3) joint anchor in body frame
    dof_armature: jnp.ndarray  # (nv,)
    dof_damping: jnp.ndarray  # (nv,)
    dof_frictionloss: jnp.ndarray  # (nv,)
    actuator_gear: jnp.ndarray  # (nu,)
    actuator_ctrlrange: jnp.ndarray  # (nu, 2); +-inf when unlimited
    geom_pos: jnp.ndarray  # (ng, 3)
    geom_quat: jnp.ndarray  # (ng, 4)
    geom_size: jnp.ndarray  # (ng, 3)
    geom_friction: jnp.ndarray  # (ng,) sliding friction coefficient
    # contact solver parameters (MuJoCo-like solref/solimp semantics)
    timeconst: jnp.ndarray  # () solref[0], default 0.02
    dampratio: jnp.ndarray  # () solref[1], default 1.0
    imp_min: jnp.ndarray  # () solimp d0, default 0.9
    imp_max: jnp.ndarray  # () solimp dmax, default 0.95
    imp_width: jnp.ndarray  # () solimp width, default 0.001
    gravity: jnp.ndarray  # (3,)

    @property
    def total_mass(self) -> jnp.ndarray:
        return jnp.sum(self.body_mass)


@struct.dataclass
class DynParams:
    """Per-environment dynamic parameters (domain randomization surface)."""

    dof_damping: jnp.ndarray  # (nv,)
    dof_frictionloss: jnp.ndarray  # (nv,)
    body_mass: jnp.ndarray  # (nb,)
    body_ipos: jnp.ndarray  # (nb, 3)
    xfrc: jnp.ndarray  # (nb, 6) applied world wrench (force(3), torque(3))
    kp: jnp.ndarray  # (nu,) PD gains (possibly randomized, robot_base.py:44-47)
    kd: jnp.ndarray  # (nu,)
    bemf_gain: jnp.ndarray  # (nu,) back-EMF torque damping tau_d (robot_base.py:53-59)


def default_dyn_params(model: Model, kp: jnp.ndarray, kd: jnp.ndarray) -> DynParams:
    return DynParams(
        dof_damping=model.dof_damping,
        dof_frictionloss=model.dof_frictionloss,
        body_mass=model.body_mass,
        body_ipos=model.body_ipos,
        xfrc=jnp.zeros((model.nbody, 6)),
        kp=jnp.asarray(kp, dtype=jnp.float32),
        kd=jnp.asarray(kd, dtype=jnp.float32),
        bemf_gain=jnp.zeros((model.nu,)),
    )


@struct.dataclass
class Contact:
    """Fixed-size contact buffer (padded; `mask` marks live slots)."""

    pos: jnp.ndarray  # (ncon, 3) contact point in world
    frame: jnp.ndarray  # (ncon, 3, 3) rows = (normal, tangent1, tangent2)
    dist: jnp.ndarray  # (ncon,) signed distance (< 0 when penetrating)
    geom: jnp.ndarray  # (ncon,) foot geom index of each slot
    force: jnp.ndarray  # (ncon, 3) solved force in contact frame (n, t1, t2)
    mask: jnp.ndarray  # (ncon,) 1.0 if contact active


@struct.dataclass
class PhysicsState:
    """Dynamic physics state + forward caches (the MjData-equivalent surface)."""

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray  # (nv,)
    act_torque: jnp.ndarray  # (nu,) joint-level actuator torques (gear * ctrl)
    xpos: jnp.ndarray  # (nb, 3) body frame origins in world
    xquat: jnp.ndarray  # (nb, 4)
    cvel: jnp.ndarray  # (nb, 6) spatial velocity (omega, v_at_world_origin)
    contact: Contact
    time: jnp.ndarray  # () simulation time

    # derived helpers ------------------------------------------------------
    def body_vel_world(self, body: int) -> jnp.ndarray:
        """Linear velocity of a body frame origin, world frame."""
        w, v0 = self.cvel[body, :3], self.cvel[body, 3:]
        return v0 + jnp.cross(w, self.xpos[body])

    def body_ang_world(self, body: int) -> jnp.ndarray:
        return self.cvel[body, :3]


def tree_replace(obj: Any, **updates: Any) -> Any:
    """Convenience: dataclass replace for flax.struct objects."""
    return obj.replace(**updates)
