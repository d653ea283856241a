"""Batched rigid-body engine: the TPU-native replacement for the MuJoCo C core.

Implements exactly the engine surface the reference exercises (SURVEY.md §2.1;
/root/reference/envs/common/robot_interface.py, mujoco_env.py):

  * generalized coordinates (one optional free root joint + hinge/slide),
  * forward kinematics + body spatial velocities,
  * joint-space inertia matrix (composite, via world-frame body Jacobians),
  * bias forces (Coriolis/centrifugal/gravity),
  * plane-box (+ terrain support-height) contacts with MuJoCo-like
    soft-constraint semantics (solref/solimp impedance, friction cones),
  * semi-implicit Euler with implicit joint damping (MuJoCo Euler semantics),
  * applied body wrenches (xfrc_applied), armature, frictionloss.

Everything is a pure function over (Model, DynParams, PhysicsState) written
for a single env; batching is jax.vmap over thousands of envs.

TPU-first structure: XLA kernel count is the limiting resource for this
workload (hundreds of tiny fused ops per 1 ms substep, 25 substeps per
control step), so the implementation avoids per-body Python loops wherever
the math allows:

  * tree propagation (velocities, velocity-product accelerations) is
    expressed through the static ancestor-dof mask as ONE matmul each:
    v_body = mask @ (S * qvel), a_vp = mask @ cross-terms;
  * per-dof screw axes, spatial inertias, and the integrator are stacked
    gathers/scatters over static index arrays;
  * the dual contact problem is solved with a fully-batched projected
    Jacobi iteration (a (3nc x 3nc) matmul per sweep) instead of a
    sequential per-contact Gauss-Seidel loop;
  * forward kinematics runs ONCE per substep: each step consumes the pose
    cache the previous step (or make_state/forward) wrote.

Only the FK chain itself remains a (short, ~tree-depth) sequential loop.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from learninghumanoidwalking_tpu.physics.linalg_small import cho_solve_outer, cholesky_outer
from learninghumanoidwalking_tpu.physics.model import FREE, HINGE, SLIDE, Contact, DynParams, Model, PhysicsState
from learninghumanoidwalking_tpu.utils import maths

# Contacts activate when signed distance < margin (MuJoCo default margin 0).
CONTACT_MARGIN = 0.0
# Projected-Jacobi sweeps for the dual contact solve.
SOLVER_ITERATIONS = 30
SOLVER_RELAXATION = 0.95

_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)],
    dtype=np.float32,
)
# Contact corners: the 4 bottom-face corners of each foot box. MuJoCo's
# plane-box collider emits the <=4 deepest corners; for feet these are the
# bottom face except when the foot is flipped >90 deg, which the tasks
# terminate long before. Using a static corner set avoids per-substep TPU
# argsorts and keeps the contact system at 4 slots per foot.
#
# Known limitation vs MuJoCo's full box-box manifold: contacts are only
# generated AT the foot's corners, so a terrain-box EDGE pressing into the
# middle of the sole (foot overhanging a stone edge) produces no contact
# point there. The stepping task targets stone centers (reach radius 0.20 m
# vs stone half-length 0.15 m, stepping_task.py:225-240), where all corners
# land on the stone and the case does not bind.
_BOTTOM_CORNERS = np.array(
    [[sx, sy, -1.0] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)],
    dtype=np.float32,
)


# --------------------------------------------------------------------------
# gather-free static row selection
#
# TPU gathers/scatters cost ~1000x a small matvec on this workload (each
# dynamic gather at B=1024 measured ~0.2 ms vs 0.0002 ms for an einsum), so
# all static index selections in the hot path go through slices (contiguous
# case, which all shipped robots satisfy by construction) or one-hot matmuls.
# --------------------------------------------------------------------------


def take_rows(x: jnp.ndarray, idx) -> jnp.ndarray:
    """x[idx] for a static index tuple, without emitting a gather."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.size == 0:
        return x[:0]
    if np.all(np.diff(idx) == 1):
        return jax.lax.slice_in_dim(x, int(idx[0]), int(idx[0]) + idx.size, axis=0)
    oh = jnp.asarray(np.eye(x.shape[0], dtype=np.float32)[idx])
    flat = x.reshape(x.shape[0], -1)
    return (oh @ flat).reshape((idx.size,) + x.shape[1:])


def put_rows(n: int, idx, vals: jnp.ndarray) -> jnp.ndarray:
    """Zeros(n, ...) with vals placed at static rows idx, without a scatter."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.size and np.all(np.diff(idx) == 1):
        lo = int(idx[0])
        hi = lo + idx.size
        pads = []
        if lo > 0:
            pads.append(jnp.zeros((lo,) + vals.shape[1:], vals.dtype))
        pads.append(vals)
        if hi < n:
            pads.append(jnp.zeros((n - hi,) + vals.shape[1:], vals.dtype))
        return jnp.concatenate(pads)
    oh = jnp.asarray(np.eye(n, dtype=np.float32)[:, idx] if idx.size else np.zeros((n, 0), np.float32))
    flat = vals.reshape(idx.size, -1) if idx.size else jnp.zeros((0, int(np.prod(vals.shape[1:]))))
    return (oh @ flat).reshape((n,) + vals.shape[1:])


@struct.dataclass
class Terrain:
    """Per-env terrain, world-frame: boxes and/or a continuous heightfield.

    Boxes replace the reference's runtime mutation of 20 terrain box bodies
    (/root/reference/tasks/stepping_task.py:320-334) with per-env state
    arrays; feet collide with box top AND side faces via an SDF query.

    The optional heightfield replaces the reference's jittered hfield geom
    (/root/reference/tasks/walking_task.py:173-179; asset in
    envs/jvrc/gen_xml.py): a regular (H, W) grid of heights RELATIVE to
    floor_z, bilinearly interpolated, substituting for the flat floor plane
    in the contact query (so a foot straddling a slope gets per-corner
    tilted contact normals). All-None hfield leaves = flat floor; the
    pytree structure difference re-specializes the jitted step.
    """

    pos: jnp.ndarray  # (nt, 3) box center
    size: jnp.ndarray  # (nt, 3) half-sizes
    yaw: jnp.ndarray  # (nt,) rotation about z
    floor_z: jnp.ndarray  # () floor plane height (FORWARD stepping drops it -2)
    hfield: jnp.ndarray | None = None  # (H, W) heights above floor_z; [i, j] = node (x_j, y_i)
    hfield_x0y0: jnp.ndarray | None = None  # (2,) world xy of node [0, 0]
    hfield_cell: jnp.ndarray | None = None  # (2,) node spacing (dx, dy)


def flat_terrain(nterrain: int) -> Terrain:
    return Terrain(
        pos=jnp.tile(jnp.array([0.0, 0.0, -100.0]), (nterrain, 1)),
        size=jnp.tile(jnp.array([0.5, 0.5, 0.1]), (nterrain, 1)),
        yaw=jnp.zeros((nterrain,)),
        floor_z=jnp.zeros(()),
    )


# --------------------------------------------------------------------------
# static (trace-time) structure tables, derived from Model metadata
# --------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _static_tables(
    nbody: int,
    nv: int,
    body_parent: tuple,
    jnt_type: tuple,
    body_dof_adr: tuple,
    body_dof_num: tuple,
    body_qpos_adr: tuple,
):
    """Ancestor masks and stacked per-dof index arrays (all numpy constants)."""
    anc = np.zeros((nbody, nv), dtype=np.float32)
    for i in range(1, nbody):
        anc[i] = anc[body_parent[i]]
        adr, num = body_dof_adr[i], body_dof_num[i]
        if num > 0:
            anc[i, adr : adr + num] = 1.0

    # 1-dof joints, stacked
    j_dof, j_body, j_is_hinge, j_qpos = [], [], [], []
    free_body = -1
    for i in range(1, nbody):
        jt = jnt_type[i]
        if jt == FREE:
            free_body = i
        elif jt in (HINGE, SLIDE):
            j_dof.append(body_dof_adr[i])
            j_body.append(i)
            j_is_hinge.append(1.0 if jt == HINGE else 0.0)
            j_qpos.append(body_qpos_adr[i])
    return dict(
        anc=anc,
        j_dof=np.asarray(j_dof, dtype=np.int32),
        j_body=np.asarray(j_body, dtype=np.int32),
        j_is_hinge=np.asarray(j_is_hinge, dtype=np.float32),
        j_qpos=np.asarray(j_qpos, dtype=np.int32),
        free_body=free_body,
    )


def _tables(model: Model) -> dict:
    return _static_tables(
        model.nbody,
        model.nv,
        model.body_parent,
        model.jnt_type,
        tuple(model.body_dof_adr),
        tuple(model.body_dof_num),
        tuple(model.body_qpos_adr),
    )


# --------------------------------------------------------------------------
# kinematics
# --------------------------------------------------------------------------


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


def motion_subspace(model: Model, xpos: jnp.ndarray, rmats: jnp.ndarray) -> jnp.ndarray:
    """(nv, 6) world-frame screw axes S_d, motion = (omega, v_at_origin).

    Gather-free: dofs are laid out in body order (free root first, then
    1-dof joints), so the matrix is a concatenation of the free-joint block
    and the stacked joint block.
    """
    t = _tables(model)
    blocks = []

    if t["free_body"] >= 0:
        fb = t["free_body"]
        rot = rmats[fb]
        # translational dofs (world axes), then rotational (body axes about
        # the body origin)
        lin = jnp.concatenate([jnp.zeros((3, 3)), jnp.eye(3)], axis=1)  # (3, 6)
        ang = jnp.concatenate([rot.T, jnp.cross(xpos[fb][None, :], rot.T)], axis=1)  # (3, 6)
        blocks.append(jnp.concatenate([lin, ang]))

    if t["j_dof"].size:
        rots = take_rows(rmats, t["j_body"])  # (nj, 3, 3)
        axes_local = take_rows(model.jnt_axis, t["j_body"])
        pos_local = take_rows(model.jnt_pos, t["j_body"])
        axes = jnp.einsum("nij,nj->ni", rots, axes_local)
        anchors = take_rows(xpos, t["j_body"]) + jnp.einsum("nij,nj->ni", rots, pos_local)
        hinge = jnp.asarray(t["j_is_hinge"])[:, None]
        s_ang = hinge * axes
        s_lin = hinge * jnp.cross(anchors, axes) + (1.0 - hinge) * axes
        blocks.append(jnp.concatenate([s_ang, s_lin], axis=1))

    return jnp.concatenate(blocks) if blocks else jnp.zeros((0, 6))


def body_jacobians(model: Model, s_mat: jnp.ndarray) -> jnp.ndarray:
    """(nbody, 6, nv) spatial Jacobians: S masked to each body's ancestors."""
    anc = jnp.asarray(_tables(model)["anc"])  # (nb, nv)
    return s_mat.T[None, :, :] * anc[:, None, :]


def body_velocities(model: Model, s_mat: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """(nbody, 6) spatial velocities: v_i = anc_mask_i @ (S * qvel)."""
    anc = jnp.asarray(_tables(model)["anc"])
    return anc @ (s_mat * qvel[:, None])


def spatial_inertias(
    model: Model, params: DynParams, xpos: jnp.ndarray, xquat: jnp.ndarray, rmats: jnp.ndarray
) -> jnp.ndarray:
    """(nbody, 6, 6) world-frame spatial inertia of each body, stacked."""
    iquat_mats = jax.vmap(maths.quat_to_mat)(model.body_iquat)  # could be folded into Model
    rot = jnp.einsum("bij,bjk->bik", rmats, iquat_mats)  # (nb, 3, 3)
    mass_ratio = params.body_mass / jnp.maximum(model.body_mass, 1e-9)
    diag = model.body_inertia * mass_ratio[:, None]  # (nb, 3)
    i_com = jnp.einsum("bij,bj,bkj->bik", rot, diag, rot)  # R diag R^T
    com = xpos + jnp.einsum("bij,bj->bi", rmats, params.body_ipos)
    cx = jax.vmap(maths.skew)(com)  # (nb, 3, 3)
    m = params.body_mass[:, None, None]
    ibar = i_com - m * jnp.einsum("bij,bjk->bik", cx, cx)
    top = jnp.concatenate([ibar, m * cx], axis=2)
    bot = jnp.concatenate([m * jnp.transpose(cx, (0, 2, 1)), m * jnp.broadcast_to(jnp.eye(3), cx.shape)], axis=2)
    inertias = jnp.concatenate([top, bot], axis=1)
    # zero out the world body
    return inertias.at[0].set(0.0)


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
    """qfrc_bias (nv,): Coriolis + centrifugal + gravity (zero-qacc RNEA).

    Velocity-product accelerations via the ancestor mask:
    a_i = a_0 + sum_{d in path(i)} v_{body(d)} x (S_d qdot_d).
    """
    t = _tables(model)
    anc = jnp.asarray(t["anc"])
    sv = s_mat * qvel[:, None]  # (nv, 6)
    v_dof = take_rows(cvel, model.dof_body)  # (nv, 6) velocity of each dof's body
    cross_terms = jax.vmap(maths.motion_cross)(v_dof, sv)  # (nv, 6)
    a0 = jnp.concatenate([jnp.zeros(3), -model.gravity])
    acc = a0[None, :] + anc @ cross_terms  # (nb, 6)

    momentum = jnp.einsum("bij,bj->bi", inertias, cvel)
    f = jnp.einsum("bij,bj->bi", inertias, acc) + jax.vmap(maths.force_cross)(cvel, momentum)
    return jnp.einsum("baj,ba->j", jac, f)


# --------------------------------------------------------------------------
# contacts
# --------------------------------------------------------------------------


def geom_world_pose(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, gi: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    bi = model.geom_body[gi]
    pos = xpos[bi] + maths.quat_rotate(xquat[bi], model.geom_pos[gi])
    quat = maths.quat_mul(xquat[bi], model.geom_quat[gi])
    return pos, quat


def _tent_weights(n: int, u: jnp.ndarray) -> jnp.ndarray:
    """(n,) bilinear interpolation weights for fractional index u: the tent
    function max(0, 1 - |i - u|) over node indices i. One dense contraction
    with these weights IS linear interpolation — no gathers, so the lookup
    maps onto TPU vector lanes instead of scalar loads."""
    idx = jnp.arange(n, dtype=u.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(idx - u))


def hfield_query(terrain: Terrain, xy: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Heightfield surface under world xy: (height above floor_z, unit
    normal). Bilinear tent-weight contraction h = w_y^T G w_x; the normal
    comes from central differences at quarter-cell offsets (exact for the
    piecewise-planar cells MuJoCo's triangulated hfields produce, away from
    cell edges)."""
    grid = terrain.hfield  # (H, W)
    hgt, wid = grid.shape
    cell = terrain.hfield_cell
    u = jnp.clip((xy[0] - terrain.hfield_x0y0[0]) / cell[0], 0.0, wid - 1.0)
    v = jnp.clip((xy[1] - terrain.hfield_x0y0[1]) / cell[1], 0.0, hgt - 1.0)

    def sample(uu, vv):
        # contract W first, then H — same order as batched/kernel twins so
        # float32 rounding stays aligned across the three engine paths
        return _tent_weights(hgt, vv) @ (grid @ _tent_weights(wid, uu))

    h = sample(u, v)
    # central differences over the ACTUAL (clip-shrunk at the border) span,
    # so gradients stay unbiased at the grid edge
    e = 0.25
    up, um = jnp.clip(u + e, 0.0, wid - 1.0), jnp.clip(u - e, 0.0, wid - 1.0)
    vp, vm = jnp.clip(v + e, 0.0, hgt - 1.0), jnp.clip(v - e, 0.0, hgt - 1.0)
    dh_dx = (sample(up, v) - sample(um, v)) / ((up - um) * cell[0])
    dh_dy = (sample(u, vp) - sample(u, vm)) / ((vp - vm) * cell[1])
    n = jnp.stack([-dh_dx, -dh_dy, jnp.ones(())])
    return h, n / jnp.linalg.norm(n)


def support_height(terrain: Terrain | None, xy: jnp.ndarray) -> jnp.ndarray:
    """Support surface height under world xy: max of the floor plane (or the
    heightfield surface when one is present) and the top faces of terrain
    boxes whose yaw-rotated footprint contains the point (encodes the
    reference's 20 repositionable terrain boxes, stepping_task.py:320-334).
    Used for the non-penetrating distance report; penetrating contacts use
    the full box SDF (terrain_contact)."""
    if terrain is None:
        return jnp.zeros(())
    ground = terrain.floor_z
    if terrain.hfield is not None:
        ground = ground + hfield_query(terrain, xy)[0]
    if terrain.pos.shape[0] == 0:  # hfield-only terrain: no boxes
        return ground
    c, s = jnp.cos(terrain.yaw), jnp.sin(terrain.yaw)
    dx = xy[0] - terrain.pos[:, 0]
    dy = xy[1] - terrain.pos[:, 1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (jnp.abs(lx) <= terrain.size[:, 0]) & (jnp.abs(ly) <= terrain.size[:, 1])
    tops = jnp.where(inside, terrain.pos[:, 2] + terrain.size[:, 2], -jnp.inf)
    return jnp.maximum(ground, jnp.max(tops))


def terrain_contact(terrain: Terrain, p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-vs-terrain-BOX contact query: (signed distance, outward unit
    normal), excluding the floor plane (which gets its own contact slot —
    see detect_contacts).

    Full-box collision: a point inside a terrain box is pushed out through
    its nearest face — top faces AND side faces (risers), matching MuJoCo's
    box geoms for the stepping stones
    (/root/reference/tasks/stepping_task.py:320-334). Among all penetrated
    boxes the shallowest penetration wins (cheapest push-out). Boxes whose
    bottom face rests at or below the floor plane are treated as COLUMNS
    (no bottom face): a box standing on the floor cannot push a foot down
    through it — in MuJoCo that face is unreachable because the floor keeps
    bodies out; with a signed-distance query it must be removed explicitly.
    """
    c, s = jnp.cos(terrain.yaw), jnp.sin(terrain.yaw)
    dx = p[0] - terrain.pos[:, 0]
    dy = p[1] - terrain.pos[:, 1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    lz = p[2] - terrain.pos[:, 2]
    sz_half = terrain.size[:, 2]
    ex = jnp.abs(lx) - terrain.size[:, 0]
    ey = jnp.abs(ly) - terrain.size[:, 1]
    resting = (terrain.pos[:, 2] - sz_half) <= terrain.floor_z + 1e-4
    ez = jnp.where(resting, lz - sz_half, jnp.abs(lz) - sz_half)
    sgz = jnp.where(resting, 1.0, jnp.sign(lz))
    inside = (ex < 0.0) & (ey < 0.0) & (ez < 0.0)
    pen = jnp.maximum(jnp.maximum(ex, ey), ez)  # negative inside
    # outward normal along the least-penetrated axis (ties prefer the top)
    is_z = (ez >= ex) & (ez >= ey)
    is_x = ex >= ey
    sx_, sy_ = jnp.sign(lx), jnp.sign(ly)
    nx = jnp.where(is_z, 0.0, jnp.where(is_x, sx_ * c, -sy_ * s))
    ny = jnp.where(is_z, 0.0, jnp.where(is_x, sx_ * s, sy_ * c))
    nz = jnp.where(is_z, sgz, 0.0)
    box_n = jnp.stack([nx, ny, nz], axis=1)  # (nt, 3)

    pen_mask = inside
    any_pen = jnp.any(pen_mask)
    score = jnp.where(pen_mask, pen, -1e9)
    best = jnp.max(score)
    sel = ((score == best) & pen_mask).astype(p.dtype)
    sel = sel / jnp.maximum(jnp.sum(sel), 1.0)
    n_pen = box_n.T @ sel
    n_pen = n_pen / jnp.maximum(jnp.linalg.norm(n_pen), 1e-6)
    z_up = jnp.array([0.0, 0.0, 1.0])
    normal = jnp.where(any_pen, n_pen, z_up)
    dist = jnp.where(any_pen, best, 1e3)
    return dist, normal


def frame_from_normal(n: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) contact frame with rows (normal, t1, t2) from a unit normal.

    For n = +z this reproduces the static (z, x, y) frame the flat-floor
    path uses, so flat-ground behavior is unchanged."""
    h2 = n[0] * n[0] + n[1] * n[1]
    h = jnp.sqrt(jnp.maximum(h2, 1e-12))
    t1 = jnp.where(h2 > 0.25, jnp.stack([-n[1] / h, n[0] / h, jnp.zeros(())]), jnp.array([1.0, 0.0, 0.0]))
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def slots_per_geom(model: Model) -> int:
    """Contact slots per foot geom: 4 bottom corners vs the floor plane,
    plus (terrain models only) 4 corner-vs-box-SDF slots. Two slots per
    corner mirror MuJoCo emitting SEPARATE plane-box and box-box contacts:
    a foot can be held up by the floor AND pushed back by a riser at once."""
    return 4 if model.nterrain == 0 else 8


def _foot_floor_contacts(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, gi: int, terrain: Terrain | None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Contact slots for foot box `gi`: (pos (S,3), dist (S,), frame (S,3,3))
    with S = slots_per_geom. Slots 0-3: corners vs floor plane (static z-up
    frame); slots 4-7 (terrain only): corners vs terrain-box SDF."""
    pos, quat = geom_world_pose(model, xpos, xquat, gi)
    rot = maths.quat_to_mat(quat)
    corners = pos[None, :] + (_BOTTOM_CORNERS * model.geom_size[gi][None, :]) @ rot.T  # (4,3)
    z_frame = jnp.tile(jnp.eye(3)[jnp.array([2, 0, 1])][None], (4, 1, 1))
    if terrain is None:
        return corners, corners[:, 2], z_frame
    if terrain.hfield is not None:
        # the heightfield surface REPLACES the flat floor in slots 0-3:
        # signed distance along the local surface normal is the vertical gap
        # scaled by n_z (plane through the surface point under the corner)
        hz, hn = jax.vmap(lambda c: hfield_query(terrain, c[:2]))(corners)
        floor_dist = (corners[:, 2] - (terrain.floor_z + hz)) * hn[:, 2]
        ground_frame = jax.vmap(frame_from_normal)(hn)
    else:
        floor_dist = corners[:, 2] - terrain.floor_z
        ground_frame = z_frame
    if terrain.pos.shape[0] == 0:  # hfield-only terrain: no box slots
        return corners, floor_dist, ground_frame
    box_dist, normal = jax.vmap(lambda c: terrain_contact(terrain, c))(corners)
    box_frame = jax.vmap(frame_from_normal)(normal)
    return (
        jnp.concatenate([corners, corners]),
        jnp.concatenate([floor_dist, box_dist]),
        jnp.concatenate([ground_frame, box_frame]),
    )


def detect_contacts(
    model: Model, xpos: jnp.ndarray, xquat: jnp.ndarray, terrain: Terrain | None
) -> Contact:
    """Fill the fixed-size contact buffer (foot boxes vs floor/terrain)."""
    if model.ncon == 0:
        return Contact(
            pos=jnp.zeros((0, 3)),
            frame=jnp.zeros((0, 3, 3)),
            dist=jnp.zeros((0,)),
            geom=jnp.zeros((0,), dtype=jnp.int32),
            force=jnp.zeros((0, 3)),
            mask=jnp.zeros((0,)),
        )
    spg = slots_per_geom(model)
    all_pos, all_dist, all_geom, all_frame = [], [], [], []
    for gi in model.foot_geoms:
        pos, dist, frame = _foot_floor_contacts(model, xpos, xquat, gi, terrain)
        all_pos.append(pos)
        all_dist.append(dist)
        all_geom.append(jnp.full((spg,), gi, dtype=jnp.int32))
        all_frame.append(frame)
    pos = jnp.concatenate(all_pos)
    dist = jnp.concatenate(all_dist)
    geom = jnp.concatenate(all_geom)
    frame = jnp.concatenate(all_frame)  # rows: n, t1, t2
    ncon = model.ncon
    mask = (dist < CONTACT_MARGIN).astype(pos.dtype)
    return Contact(pos=pos, frame=frame, dist=dist, geom=geom, force=jnp.zeros((ncon, 3)), mask=mask)


def contact_jacobian(model: Model, jac: jnp.ndarray, contact: Contact) -> jnp.ndarray:
    """(ncon, 3, nv): contact-point velocities projected onto contact frames.

    Gather-free: contact slots map to foot geoms statically (8 per geom in
    declaration order), so each geom's body Jacobian is selected with a static
    scalar index and broadcast over its slots.
    """
    spg = slots_per_geom(model)
    jac_blocks = []
    for gi in model.foot_geoms:
        bi = model.geom_body[gi]
        jac_blocks.append(jnp.broadcast_to(jac[bi][None], (spg,) + jac[bi].shape))
    jac_c = jnp.concatenate(jac_blocks)  # (ncon, 6, nv)
    ang, lin = jac_c[:, :3, :], jac_c[:, 3:, :]
    px = jax.vmap(maths.skew)(contact.pos)  # (ncon, 3, 3)
    jp = lin - jnp.einsum("cij,cjv->civ", px, ang)
    return jnp.einsum("cfi,civ->cfv", contact.frame, jp)


def _jacobi_solve(
    a_mat: jnp.ndarray, b_vec: jnp.ndarray, mu: jnp.ndarray, mask: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """Projected Jacobi iteration on the dual contact problem.

    Solves A f = b with per-contact friction-cone projection
    {f_n >= 0, |f_t| <= mu f_n}. Fully batched: each sweep is one
    (3nc x 3nc) matvec + elementwise projection, mapping cleanly onto the
    MXU/VPU under vmap (vs. a 2*nc-deep sequential Gauss-Seidel chain).
    Per-row absolute row sums scale the step (Gershgorin bound: eigenvalues
    of D^-1 A lie in [0, 1] for SPD A when D = abs row sums), keeping the
    iteration contractive for the strongly-coupled 4-corner foot systems
    where plain diagonal Jacobi oscillates.
    """
    nc = mu.shape[0]
    diag = jnp.clip(jnp.sum(jnp.abs(a_mat), axis=1), 1e-8, None)

    def sweep(f, _):
        r = b_vec - a_mat @ f
        f = f + SOLVER_RELAXATION * r / diag
        f3 = f.reshape(nc, 3)
        fn = jnp.maximum(f3[:, 0], 0.0)
        ft = f3[:, 1:]
        ft_norm = jnp.linalg.norm(ft, axis=1, keepdims=True) + 1e-9
        scale = jnp.minimum(1.0, mu[:, None] * fn[:, None] / ft_norm)
        f3 = jnp.concatenate([fn[:, None], ft * scale], axis=1) * mask[:, None]
        return f3.reshape(-1), None

    f, _ = jax.lax.scan(sweep, jnp.zeros(3 * nc), None, length=iterations)
    return f.reshape(nc, 3)


# --------------------------------------------------------------------------
# dynamics + integration
# --------------------------------------------------------------------------


def _smooth_dynamics(
    model: Model,
    params: DynParams,
    state: PhysicsState,
    ctrl: jnp.ndarray,
    dt: float,
):
    """Everything up to (but excluding) the contact solve. Consumes the FK
    caches in `state` (xpos/xquat are kept fresh by step/make_state/forward,
    mirroring MuJoCo's in-step mjData sync, robot_interface.py:543-563)."""
    xpos, xquat = state.xpos, state.xquat
    rmats = jax.vmap(maths.quat_to_mat)(xquat)
    s_mat = motion_subspace(model, xpos, rmats)
    cvel = body_velocities(model, s_mat, state.qvel)
    jac = body_jacobians(model, s_mat)
    inertias = spatial_inertias(model, params, xpos, xquat, rmats)
    m_mat = mass_matrix(model, jac, inertias)
    qfrc_bias = bias_force(model, s_mat, jac, inertias, cvel, state.qvel)

    # actuation: force = gear * ctrl at the actuated dof (clipped to ctrlrange)
    ctrl = jnp.clip(ctrl, model.actuator_ctrlrange[:, 0], model.actuator_ctrlrange[:, 1])
    act_force = model.actuator_gear * ctrl
    qfrc_act = put_rows(model.nv, model.actuator_dof, act_force)

    # passive: smooth frictionloss; joint damping is integrated implicitly
    qfrc_passive = -params.dof_frictionloss * jnp.tanh(state.qvel / 0.02)
    qfrc_damp = -params.dof_damping * state.qvel

    # applied wrenches (xfrc_applied; domain_randomization.py:20-26)
    xf = params.xfrc  # (nb, 6): (force, torque)
    moment = jnp.cross(xpos, xf[:, :3]) + xf[:, 3:]
    f_spatial = jnp.concatenate([moment, xf[:, :3]], axis=1)
    qfrc_xfrc = jnp.einsum("baj,ba->j", jac, f_spatial)

    qfrc_smooth = qfrc_act + qfrc_passive + qfrc_damp + qfrc_xfrc - qfrc_bias

    # implicit joint damping (MuJoCo Euler integrator semantics)
    mh = m_mat + dt * jnp.diag(params.dof_damping)
    # unrolled Cholesky: the axon runtime's linalg custom call costs ~2 ms
    # per substep at B=1024 (see physics/linalg_small.py)
    chol = cholesky_outer(mh)
    qacc_smooth = cho_solve_outer(chol, qfrc_smooth)
    return xpos, xquat, jac, chol, qacc_smooth, act_force


def _constraint_solve(
    model: Model,
    state_qvel: jnp.ndarray,
    jac: jnp.ndarray,
    chol,
    qacc_smooth: jnp.ndarray,
    contact: Contact,
) -> tuple[jnp.ndarray, Contact]:
    """MuJoCo-like soft contact solve; returns (qacc, contact with forces)."""
    nc = model.ncon
    if nc == 0:
        return qacc_smooth, contact

    jc = contact_jacobian(model, jac, contact)  # (nc, 3, nv)
    jc_flat = jc.reshape(3 * nc, model.nv)
    minv_jt = cho_solve_outer(chol, jc_flat.T)  # (nv, 3nc)
    a_mat = jc_flat @ minv_jt

    # impedance d(r) from solimp, reference acceleration from solref
    pen = jnp.minimum(contact.dist, 0.0)
    imp = model.imp_min + (model.imp_max - model.imp_min) * jnp.clip(
        -pen / model.imp_width, 0.0, 1.0
    )
    k = 1.0 / jnp.maximum(model.imp_max**2 * model.timeconst**2 * model.dampratio**2, 1e-12)
    b = 2.0 / jnp.maximum(model.imp_max * model.timeconst, 1e-12)
    vel_c = jnp.einsum("cfv,v->cf", jc, state_qvel)
    aref = -b * vel_c
    aref = aref.at[:, 0].add(-k * imp * pen)
    r_reg = (1.0 - imp) / jnp.maximum(imp, 1e-6)
    r_diag = jnp.repeat(r_reg, 3) * jnp.clip(jnp.diagonal(a_mat), 1e-8, None)
    a_mat = a_mat + jnp.diag(r_diag)
    # deactivate masked slots with unit diagonal rows
    mask3 = jnp.repeat(contact.mask, 3)
    a_mat = a_mat * (mask3[:, None] * mask3[None, :]) + jnp.diag(1.0 - mask3)

    b_vec = (aref.reshape(-1) - jc_flat @ qacc_smooth) * mask3
    # per-slot friction is static: slots map to foot geoms in declaration order
    mu_static = np.repeat(
        [float(np.asarray(model.geom_friction)[gi]) for gi in model.foot_geoms],
        slots_per_geom(model),
    ).astype(np.float32)
    force = _jacobi_solve(a_mat, b_vec, jnp.asarray(mu_static), contact.mask, SOLVER_ITERATIONS)

    qfrc_con = jc_flat.T @ force.reshape(-1)
    qacc = qacc_smooth + cho_solve_outer(chol, qfrc_con)
    return qacc, contact.replace(force=force)


def _integrate(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Semi-implicit Euler position update (qvel already advanced)."""
    t = _tables(model)
    new_qpos = qpos
    if t["j_qpos"].size:
        new_qpos = new_qpos + put_rows(model.nq, t["j_qpos"], dt * take_rows(qvel, t["j_dof"]))
    fb = t["free_body"]
    if fb >= 0:
        qadr, dadr = model.body_qpos_adr[fb], model.body_dof_adr[fb]
        pos = qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
        quat = maths.quat_integrate(qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt)
        new_qpos = jax.lax.dynamic_update_slice(new_qpos, jnp.concatenate([pos, quat]), (qadr,))
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
    xpos, xquat, jac, chol, qacc_smooth, act_force = _smooth_dynamics(model, params, state, ctrl, dt)
    contact = detect_contacts(model, xpos, xquat, terrain)
    qacc, contact = _constraint_solve(model, state.qvel, jac, chol, qacc_smooth, contact)

    qvel = state.qvel + dt * qacc
    # runaway guard: contact penetration -> force -> velocity feedback can
    # overflow f32 within one control step; clamp far above physical speeds
    qvel = jnp.clip(qvel, -1e4, 1e4)
    qpos = _integrate(model, state.qpos, qvel, dt)

    # refresh kinematic caches at the new state so the next substep (and
    # observation/reward reads) see post-step poses
    xpos2, xquat2 = fk(model, qpos)
    rmats2 = jax.vmap(maths.quat_to_mat)(xquat2)
    s2 = motion_subspace(model, xpos2, rmats2)
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
    """Recompute derived quantities without integrating (mj_forward).

    Refreshes the FK caches from qpos first, so it is safe after set_state.
    """
    xpos, xquat = fk(model, state.qpos)
    rmats = jax.vmap(maths.quat_to_mat)(xquat)
    s_mat = motion_subspace(model, xpos, rmats)
    cvel = body_velocities(model, s_mat, state.qvel)
    state = state.replace(xpos=xpos, xquat=xquat, cvel=cvel)
    ctrl = jnp.zeros(model.nu)
    xpos, xquat, jac, chol, qacc_smooth, act_force = _smooth_dynamics(model, params, state, ctrl, dt)
    contact = detect_contacts(model, xpos, xquat, terrain)
    qacc, contact = _constraint_solve(model, state.qvel, jac, chol, qacc_smooth, contact)
    return state.replace(qacc=qacc, contact=contact, act_torque=jnp.zeros(model.nu))


def make_state(model: Model, qpos: jnp.ndarray, qvel: jnp.ndarray) -> PhysicsState:
    """Fresh PhysicsState with caches filled via FK."""
    qpos = jnp.asarray(qpos, dtype=jnp.float32)
    qvel = jnp.asarray(qvel, dtype=jnp.float32)
    xpos, xquat = fk(model, qpos)
    rmats = jax.vmap(maths.quat_to_mat)(xquat)
    s_mat = motion_subspace(model, xpos, rmats)
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
        qpos=qpos,
        qvel=qvel,
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
    termination, so a boolean distance check over declared proxy pairs
    suffices (no forces)."""
    if not model.self_pairs:
        return jnp.zeros((), dtype=bool)
    flags = []
    for g1, g2 in model.self_pairs:  # static geom/body indices -> no gathers
        p1, _ = geom_world_pose(model, xpos, xquat, g1)
        p2, _ = geom_world_pose(model, xpos, xquat, g2)
        r1r2 = float(np.asarray(model.geom_size)[g1, 0] + np.asarray(model.geom_size)[g2, 0])
        flags.append(jnp.sum(jnp.square(p1 - p2)) < r1r2 * r1r2)
    return jnp.any(jnp.stack(flags))
