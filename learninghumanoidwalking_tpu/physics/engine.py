"""Batched rigid-body engine: the TPU-native replacement for the MuJoCo C core.

Implements exactly the engine surface the reference exercises (SURVEY.md §2.1;
/root/reference/envs/common/robot_interface.py, mujoco_env.py):

  * generalized coordinates (one optional free root joint + hinge/slide),
  * forward kinematics + body spatial velocities,
  * joint-space inertia matrix (composite, via world-frame body Jacobians),
  * bias forces (Coriolis/centrifugal/gravity) via velocity-product recursion,
  * plane-box (+ terrain-box) contacts with MuJoCo-like soft-constraint
    semantics (solref/solimp impedance, PGS on the dual with friction cones),
  * semi-implicit Euler with implicit joint damping (MuJoCo Euler integrator
    semantics),
  * applied body wrenches (xfrc_applied), armature, frictionloss.

Everything is a pure function over (Model, DynParams, PhysicsState) written
for a single env; batching is jax.vmap over thousands of envs, which turns the
small fixed-shape tree operations into wide VPU/MXU-friendly batched ops. The
kinematic tree is unrolled in Python at trace time (nbody <= ~15), so XLA sees
straight-line code with static shapes.

Design notes vs the reference: MuJoCo's `mj_step` (robot_interface.py:535-545)
maps to `step()`; `mj_forward` after `set_state` (mujoco_env.py:126-127) maps
to `forward()`. Spatial algebra uses Featherstone world-frame coordinates with
motion vectors (omega, v_at_origin).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.physics import model as mdl
from learninghumanoidwalking_tpu.physics.model import BOX, FREE, HINGE, SLIDE, Contact, DynParams, Model, PhysicsState
from learninghumanoidwalking_tpu.utils import maths

# Contact margin: contacts activate when signed distance < margin (MuJoCo
# default margin is 0; we keep slots for dist < MARGIN to get smooth onset).
CONTACT_MARGIN = 0.0
# PGS sweeps for the dual contact solve.
SOLVER_ITERATIONS = 10

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
    dtype=np.float32,
)


@struct.dataclass
class Terrain:
    """Per-env terrain boxes (stepping-stone style), world-frame.

    Replaces the reference's runtime mutation of 20 terrain box bodies
    (/root/reference/tasks/stepping_task.py:320-334) with per-env state arrays.
    Boxes are yaw-rotated rectangular prisms; feet collide with their top face.
    """

    pos: jnp.ndarray  # (nt, 3) box center
    size: jnp.ndarray  # (nt, 3) half-sizes
    yaw: jnp.ndarray  # (nt,) rotation about z
    # floor z offset: stepping FORWARD mode drops the floor by 2 m
    # (stepping_task.py:330-333); encoded here instead of moving a geom.
    floor_z: jnp.ndarray  # ()


def flat_terrain(nterrain: int) -> Terrain:
    """Inactive terrain: boxes far below the floor."""
    return Terrain(
        pos=jnp.tile(jnp.array([0.0, 0.0, -100.0]), (nterrain, 1)),
        size=jnp.tile(jnp.array([0.5, 0.5, 0.1]), (nterrain, 1)),
        yaw=jnp.zeros((nterrain,)),
        floor_z=jnp.zeros(()),
    )


def _ancestor_dof_mask(model: Model) -> np.ndarray:
    """(nbody, nv) bool mask: dof d affects body i (static, trace-time)."""
    mask = np.zeros((model.nbody, model.nv), dtype=bool)
    for i in range(1, model.nbody):
        p = model.body_parent[i]
        mask[i] = mask[p]
        adr, num = model.body_dof_adr[i], model.body_dof_num[i]
        if num > 0:
            mask[i, adr : adr + num] = True
    return mask


def fk(model: Model, qpos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics: world position/orientation of every body frame."""
    xpos = [jnp.zeros(3)]
    xquat = [maths.quat_identity()]
    for i in range(1, model.nbody):
        p = model.body_parent[i]
        x_pre = xpos[p] + maths.quat_rotate(xquat[p], model.body_pos[i])
        q_pre = maths.quat_mul(xquat[p], model.body_quat[i])
        jt = model.jnt_type[i]
        adr = model.body_qpos_adr[i]
        if jt == FREE:
            x = qpos[adr : adr + 3]
            q = maths.quat_normalize(qpos[adr + 3 : adr + 7])
        elif jt == HINGE:
            angle = qpos[adr]
            axis = model.jnt_axis[i]
            half = 0.5 * angle
            qj = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
            q = maths.quat_mul(q_pre, qj)
            anchor = model.jnt_pos[i]
            x = x_pre + maths.quat_rotate(q_pre, anchor) - maths.quat_rotate(q, anchor)
        elif jt == SLIDE:
            q = q_pre
            x = x_pre + maths.quat_rotate(q_pre, model.jnt_axis[i] * qpos[adr])
        else:  # welded
            q = q_pre
            x = x_pre
        xpos.append(x)
        xquat.append(q)
    return jnp.stack(xpos), jnp.stack(xquat)


def motion_subspace(model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray) -> jnp.ndarray:
    """(nv, 6) world-frame screw axes S_d, motion = (omega, v_at_origin)."""
    rows = []
    for i in range(1, model.nbody):
        jt = model.jnt_type[i]
        if jt == -1:
            continue
        rot = maths.quat_to_mat(xquat[i])
        if jt == FREE:
            zero = jnp.zeros(3)
            for k in range(3):  # translational dofs, world axes
                e = jnp.zeros(3).at[k].set(1.0)
                rows.append(jnp.concatenate([zero, e]))
            for k in range(3):  # rotational dofs, body axes, anchored at body origin
                u = rot[:, k]
                rows.append(jnp.concatenate([u, jnp.cross(xpos[i], u)]))
        elif jt == HINGE:
            u = rot @ model.jnt_axis[i]
            anchor = xpos[i] + rot @ model.jnt_pos[i]
            rows.append(jnp.concatenate([u, jnp.cross(anchor, u)]))
        else:  # SLIDE
            u = rot @ model.jnt_axis[i]
            rows.append(jnp.concatenate([jnp.zeros(3), u]))
    return jnp.stack(rows)


def body_velocities(model: Model, s_mat: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """(nbody, 6) spatial velocity of each body (omega, v_at_origin)."""
    sv = s_mat * qvel[:, None]  # (nv, 6)
    cvel = [jnp.zeros(6)]
    for i in range(1, model.nbody):
        v = cvel[model.body_parent[i]]
        adr, num = model.body_dof_adr[i], model.body_dof_num[i]
        for d in range(adr, adr + num):
            v = v + sv[d]
        cvel.append(v)
    return jnp.stack(cvel)


def body_jacobians(model: Model, s_mat: jnp.ndarray) -> jnp.ndarray:
    """(nbody, 6, nv) spatial Jacobian of each body (S masked to ancestors)."""
    mask = jnp.asarray(_ancestor_dof_mask(model), dtype=s_mat.dtype)  # (nb, nv)
    return s_mat.T[None, :, :] * mask[:, None, :]


def spatial_inertias(
    model: Model, params: DynParams, xpos: jnp.ndarray, xquat: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nbody, 6, 6) world spatial inertia and (nbody, 3) world CoM per body."""
    inertias = []
    coms = []
    mass_ratio = params.body_mass / jnp.maximum(model.body_mass, 1e-9)
    for i in range(model.nbody):
        if i == 0:
            inertias.append(jnp.zeros((6, 6)))
            coms.append(jnp.zeros(3))
            continue
        rot = maths.quat_to_mat(xquat[i]) @ maths.quat_to_mat(model.body_iquat[i])
        # inertia scales with randomized mass (domain_randomization.py:49-51)
        diag = model.body_inertia[i] * mass_ratio[i]
        i_com = rot @ jnp.diag(diag) @ rot.T
        com = xpos[i] + maths.quat_rotate(xquat[i], params.body_ipos[i])
        inertias.append(maths.spatial_inertia(params.body_mass[i], i_com, com))
        coms.append(com)
    return jnp.stack(inertias), jnp.stack(coms)


def mass_matrix(model: Model, jac: jnp.ndarray, inertias: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix, plus armature on the diagonal."""
    m_mat = jnp.einsum("baj,bak,bkl->jl", jac, inertias, jac)
    return m_mat + jnp.diag(model.dof_armature)


def bias_force(
    model: Model,
    s_mat: jnp.ndarray,
    jac: jnp.ndarray,
    inertias: jnp.ndarray,
    cvel: jnp.ndarray,
    qvel: jnp.ndarray,
) -> jnp.ndarray:
    """qfrc_bias (nv,): Coriolis + centrifugal + gravity (RNEA with qacc=0)."""
    # gravity via base-acceleration trick: a_world = -g_spatial
    a = [jnp.concatenate([jnp.zeros(3), -model.gravity])]
    sv = s_mat * qvel[:, None]
    for i in range(1, model.nbody):
        p = model.body_parent[i]
        adr, num = model.body_dof_adr[i], model.body_dof_num[i]
        vj = jnp.zeros(6)
        for d in range(adr, adr + num):
            vj = vj + sv[d]
        a.append(a[p] + maths.motion_cross(cvel[i], vj))
    acc = jnp.stack(a)
    momentum = jnp.einsum("bij,bj->bi", inertias, cvel)
    f = jnp.einsum("bij,bj->bi", inertias, acc)
    f = f + jax.vmap(maths.force_cross)(cvel, momentum)
    return jnp.einsum("baj,ba->j", jac, f)


def geom_world_pose(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, gi: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    bi = model.geom_body[gi]
    pos = xpos[bi] + maths.quat_rotate(xquat[bi], model.geom_pos[gi])
    quat = maths.quat_mul(xquat[bi], model.geom_quat[gi])
    return pos, quat


def support_height(terrain: Terrain | None, xy: jnp.ndarray) -> jnp.ndarray:
    """Terrain support height under a world xy point: max of the floor plane
    and the top faces of all terrain boxes whose (yaw-rotated) footprint
    contains the point. This is the TPU-native encoding of the reference's
    20 repositionable terrain box bodies (stepping_task.py:320-334): box sides
    are not collidable, only the walking surfaces."""
    if terrain is None:
        return jnp.zeros(())
    c, s = jnp.cos(terrain.yaw), jnp.sin(terrain.yaw)
    dx = xy[0] - terrain.pos[:, 0]
    dy = xy[1] - terrain.pos[:, 1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (jnp.abs(lx) <= terrain.size[:, 0]) & (jnp.abs(ly) <= terrain.size[:, 1])
    tops = jnp.where(inside, terrain.pos[:, 2] + terrain.size[:, 2], -jnp.inf)
    return jnp.maximum(terrain.floor_z, jnp.max(tops))


def _foot_floor_contacts(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, gi: int, terrain: Terrain | None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """4 deepest corners of foot box `gi` vs the support surface.

    Returns (pos (4,3), dist (4,)). Matches MuJoCo plane-box collision which
    emits up to 4 corner contacts.
    """
    pos, quat = geom_world_pose(model, xpos, xquat, gi)
    rot = maths.quat_to_mat(quat)
    corners = pos[None, :] + (_BOX_CORNERS * model.geom_size[gi][None, :]) @ rot.T  # (8,3)
    if terrain is None:
        dist = corners[:, 2]
    else:
        dist = corners[:, 2] - jax.vmap(lambda c: support_height(terrain, c[:2]))(corners)
    order = jnp.argsort(dist)[:4]
    return corners[order], dist[order]


def detect_contacts(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, terrain: Terrain | None
) -> Contact:
    """Fill the fixed-size contact buffer (foot boxes vs floor [+ terrain])."""
    if model.ncon == 0:
        return Contact(
            pos=jnp.zeros((0, 3)),
            frame=jnp.zeros((0, 3, 3)),
            dist=jnp.zeros((0,)),
            geom=jnp.zeros((0,), dtype=jnp.int32),
            force=jnp.zeros((0, 3)),
            mask=jnp.zeros((0,)),
        )
    all_pos, all_dist, all_geom = [], [], []
    for gi in model.foot_geoms:
        pos, dist = _foot_floor_contacts(model, xpos, xquat, gi, terrain)
        all_pos.append(pos)
        all_dist.append(dist)
        all_geom.append(jnp.full((4,), gi, dtype=jnp.int32))
    pos = jnp.concatenate(all_pos)
    dist = jnp.concatenate(all_dist)
    geom = jnp.concatenate(all_geom)
    ncon = model.ncon
    frame = jnp.tile(jnp.eye(3)[jnp.array([2, 0, 1])][None], (ncon, 1, 1))  # rows: n, t1, t2
    mask = (dist < CONTACT_MARGIN).astype(pos.dtype)
    return Contact(pos=pos, frame=frame, dist=dist, geom=geom, force=jnp.zeros((ncon, 3)), mask=mask)


def contact_jacobian(model: Model, jac: jnp.ndarray, contact: Contact) -> jnp.ndarray:
    """(ncon, 3, nv): world-frame velocity of each contact point, projected
    onto the contact frame rows (normal, t1, t2)."""
    geom_to_body = np.asarray(model.geom_body, dtype=np.int32)
    body_idx = jnp.asarray(geom_to_body)[contact.geom]  # (ncon,)
    jac_c = jac[body_idx]  # (ncon, 6, nv)
    ang, lin = jac_c[:, :3, :], jac_c[:, 3:, :]
    # point velocity = v_origin + omega x p  ->  J_p = J_lin + skew(-p) @ J_ang
    px = jax.vmap(maths.skew)(contact.pos)  # (ncon, 3, 3)
    jp = lin - jnp.einsum("cij,cjv->civ", px, ang)
    return jnp.einsum("cfi,civ->cfv", contact.frame, jp)


def _pgs_solve(
    a_mat: jnp.ndarray, b_vec: jnp.ndarray, mu: jnp.ndarray, mask: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """Projected Gauss-Seidel on the dual contact problem.

    Solves A f = b with per-contact projection onto the friction cone
    {f_n >= 0, |f_t| <= mu f_n}. a_mat: (3nc, 3nc); b_vec: (3nc,);
    mu, mask: (nc,). Returns f: (nc, 3) in contact frames.
    """
    nc = mu.shape[0]
    diag = jnp.clip(jnp.diagonal(a_mat), 1e-8, None)

    def sweep(_, f_flat):
        def per_contact(c, f_flat):
            idx = 3 * c
            a_rows = jax.lax.dynamic_slice(a_mat, (idx, 0), (3, a_mat.shape[1]))
            b_c = jax.lax.dynamic_slice(b_vec, (idx,), (3,))
            d_c = jax.lax.dynamic_slice(diag, (idx,), (3,))
            f_c = jax.lax.dynamic_slice(f_flat, (idx,), (3,))
            resid = b_c - a_rows @ f_flat
            f_new = f_c + resid / d_c
            # friction cone projection
            fn = jnp.maximum(f_new[0], 0.0)
            ft = f_new[1:]
            ft_norm = jnp.linalg.norm(ft) + 1e-9
            scale = jnp.minimum(1.0, mu[c] * fn / ft_norm)
            f_new = jnp.concatenate([fn[None], ft * scale]) * mask[c]
            return jax.lax.dynamic_update_slice(f_flat, f_new, (idx,))

        return jax.lax.fori_loop(0, nc, per_contact, f_flat)

    f_flat = jax.lax.fori_loop(0, iterations, sweep, jnp.zeros(3 * nc))
    return f_flat.reshape(nc, 3)


def _smooth_dynamics(
    model: Model,
    params: DynParams,
    state: PhysicsState,
    ctrl: jnp.ndarray,
    dt: float,
):
    """Everything up to (but excluding) the contact solve."""
    xpos, xquat = fk(model, state.qpos)
    s_mat = motion_subspace(model, xpos, xquat)
    cvel = body_velocities(model, s_mat, state.qvel)
    jac = body_jacobians(model, s_mat)
    inertias, _ = spatial_inertias(model, params, xpos, xquat)
    m_mat = mass_matrix(model, jac, inertias)
    qfrc_bias = bias_force(model, s_mat, jac, inertias, cvel, state.qvel)

    # actuation: force = gear * ctrl at the actuated dof (clipped to ctrlrange)
    ctrl = jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1])
    act_force = model.actuator_gear * ctrl
    qfrc_act = jnp.zeros(model.nv).at[jnp.asarray(model.actuator_dof, dtype=jnp.int32)].add(act_force)

    # passive: smooth frictionloss; damping handled implicitly via (M + h D)
    qfrc_passive = -params.dof_frictionloss * jnp.tanh(state.qvel / 0.02)
    qfrc_damp = -params.dof_damping * state.qvel

    # applied wrenches (xfrc_applied; domain_randomization.py:20-26). The
    # wrench (force at body origin, torque) maps to dofs through J^T.
    xf = params.xfrc  # (nb, 6): (force, torque)
    moment = jnp.cross(xpos, xf[:, :3]) + xf[:, 3:]
    f_spatial = jnp.concatenate([moment, xf[:, :3]], axis=1)  # (nb, 6)
    qfrc_xfrc = jnp.einsum("baj,ba->j", jac, f_spatial)

    qfrc_smooth = qfrc_act + qfrc_passive + qfrc_damp + qfrc_xfrc - qfrc_bias

    # implicit joint damping (MuJoCo Euler integrator semantics)
    mh = m_mat + dt * jnp.diag(params.dof_damping)
    chol = jax.scipy.linalg.cho_factor(mh)
    qacc_smooth = jax.scipy.linalg.cho_solve(chol, qfrc_smooth)
    return xpos, xquat, s_mat, cvel, jac, chol, qacc_smooth, act_force


def _constraint_solve(
    model: Model,
    state_qvel: jnp.ndarray,
    jac: jnp.ndarray,
    chol,
    qacc_smooth: jnp.ndarray,
    contact: Contact,
    dt: float,
) -> tuple[jnp.ndarray, Contact]:
    """MuJoCo-like soft contact solve; returns (qacc, contact with forces)."""
    nc = model.ncon
    if nc == 0:
        return qacc_smooth, contact

    jc = contact_jacobian(model, jac, contact)  # (nc, 3, nv)
    jc_flat = jc.reshape(3 * nc, model.nv)
    # A = J M^-1 J^T + R
    minv_jt = jax.scipy.linalg.cho_solve(chol, jc_flat.T)  # (nv, 3nc)
    a_mat = jc_flat @ minv_jt

    # impedance d(r) from solimp, reference acceleration from solref
    pen = jnp.minimum(contact.dist, 0.0)
    imp = model.imp_min + (model.imp_max - model.imp_min) * jnp.clip(
        -pen / model.imp_width, 0.0, 1.0
    )  # (nc,)
    k = 1.0 / jnp.maximum(model.imp_max**2 * model.timeconst**2 * model.dampratio**2, 1e-12)
    b = 2.0 / jnp.maximum(model.imp_max * model.timeconst, 1e-12)
    vel_c = jnp.einsum("cfv,v->cf", jc, state_qvel)  # (nc, 3)
    aref = -b * vel_c
    aref = aref.at[:, 0].add(-k * imp * pen)
    r_reg = (1.0 - imp) / jnp.maximum(imp, 1e-6)  # (nc,)
    r_diag = jnp.repeat(r_reg, 3) * jnp.clip(jnp.diagonal(a_mat), 1e-8, None)
    a_mat = a_mat + jnp.diag(r_diag)
    # deactivate masked slots: unit diagonal rows keep PGS well-posed
    mask3 = jnp.repeat(contact.mask, 3)
    a_mat = a_mat * (mask3[:, None] * mask3[None, :]) + jnp.diag(1.0 - mask3)

    b_vec = (aref.reshape(-1) - jc_flat @ qacc_smooth) * mask3
    mu = jnp.asarray(model.geom_friction)[contact.geom]
    force = _pgs_solve(a_mat, b_vec, mu, contact.mask, SOLVER_ITERATIONS)

    qfrc_con = jc_flat.T @ force.reshape(-1)
    qacc = qacc_smooth + jax.scipy.linalg.cho_solve(chol, qfrc_con)
    return qacc, contact.replace(force=force)


def _integrate(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Semi-implicit Euler position update (qvel already advanced)."""
    new_qpos = qpos
    for i in range(1, model.nbody):
        jt = model.jnt_type[i]
        if jt == -1:
            continue
        qadr, dadr = model.body_qpos_adr[i], model.body_dof_adr[i]
        if jt == FREE:
            pos = qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
            quat = maths.quat_integrate(qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt)
            new_qpos = jax.lax.dynamic_update_slice(new_qpos, jnp.concatenate([pos, quat]), (qadr,))
        else:
            new_qpos = new_qpos.at[qadr].set(qpos[qadr] + dt * qvel[dadr])
    return new_qpos


def step(
    model: Model,
    params: DynParams,
    state: PhysicsState,
    ctrl: jnp.ndarray,
    dt: float,
    terrain: Terrain | None = None,
) -> PhysicsState:
    """Advance physics by one sim_dt (mj_step equivalent)."""
    xpos, xquat, s_mat, cvel, jac, chol, qacc_smooth, act_force = _smooth_dynamics(
        model, params, state, ctrl, dt
    )
    contact = detect_contacts(model, xpos, xquat, terrain)
    qacc, contact = _constraint_solve(model, state.qvel, jac, chol, qacc_smooth, contact, dt)

    qvel = state.qvel + dt * qacc
    qpos = _integrate(model, state.qpos, qvel, dt)

    # refresh kinematic caches at the new state (so observations/rewards see
    # post-step poses, like MuJoCo's in-step mj_step1 sync,
    # robot_interface.py:543-563)
    xpos2, xquat2 = fk(model, qpos)
    s2 = motion_subspace(model, xpos2, xquat2)
    cvel2 = body_velocities(model, s2, qvel)
    return PhysicsState(
        qpos=qpos,
        qvel=qvel,
        qacc=qacc,
        act_torque=act_force,
        xpos=xpos2,
        xquat=xquat2,
        cvel=cvel2,
        contact=contact,
        time=state.time + dt,
    )


def forward(
    model: Model,
    params: DynParams,
    state: PhysicsState,
    dt: float,
    terrain: Terrain | None = None,
) -> PhysicsState:
    """Recompute derived quantities without integrating (mj_forward)."""
    ctrl = jnp.zeros(model.nu)
    xpos, xquat, s_mat, cvel, jac, chol, qacc_smooth, act_force = _smooth_dynamics(
        model, params, state, ctrl, dt
    )
    contact = detect_contacts(model, xpos, xquat, terrain)
    qacc, contact = _constraint_solve(model, state.qvel, jac, chol, qacc_smooth, contact, dt)
    return state.replace(
        qacc=qacc, xpos=xpos, xquat=xquat, cvel=cvel, contact=contact, act_torque=jnp.zeros(model.nu)
    )


def make_state(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray) -> PhysicsState:
    """Fresh PhysicsState with caches filled via FK (cheap forward)."""
    xpos, xquat = fk(model, qpos)
    s_mat = motion_subspace(model, xpos, xquat)
    cvel = body_velocities(model, s_mat, qvel)
    ncon = model.ncon
    contact = Contact(
        pos=jnp.zeros((ncon, 3)),
        frame=jnp.tile(jnp.eye(3)[jnp.array([2, 0, 1])][None], (ncon, 1, 1)),
        dist=jnp.full((ncon,), 1e3),
        geom=jnp.zeros((ncon,), dtype=jnp.int32),
        force=jnp.zeros((ncon, 3)),
        mask=jnp.zeros((ncon,)),
    )
    return PhysicsState(
        qpos=jnp.asarray(qpos, dtype=jnp.float32),
        qvel=jnp.asarray(qvel, dtype=jnp.float32),
        qacc=jnp.zeros(model.nv),
        act_torque=jnp.zeros(model.nu),
        xpos=xpos,
        xquat=xquat,
        cvel=cvel,
        contact=contact,
        time=jnp.zeros(()),
    )


def self_collision(model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray) -> jnp.ndarray:
    """Boolean: any self-collision candidate pair overlapping (sphere proxies).

    Replaces robot_interface.check_self_collisions (:472-484); used only for
    termination, so a boolean distance check over declared sphere-proxy pairs
    suffices (no forces).
    """
    if not model.self_pairs:
        return jnp.zeros((), dtype=bool)
    flags = []
    for g1, g2 in model.self_pairs:
        p1, _ = geom_world_pose(model, xpos, xquat, g1)
        p2, _ = geom_world_pose(model, xpos, xquat, g2)
        r1 = model.geom_size[g1][0]
        r2 = model.geom_size[g2][0]
        flags.append(jnp.linalg.norm(p1 - p2) < (r1 + r2))
    return jnp.any(jnp.stack(flags))
