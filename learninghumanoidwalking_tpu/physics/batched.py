"""Batch-in-lanes physics engine: explicit-batch twin of engine.py.

Why this exists: TPU XLA tiles the LAST TWO dimensions of every array into
(8 sublanes x 128 lanes) registers. The vmapped single-env engine produces
intermediates shaped (B, ..., 3/4/6/18) whose tiny trailing dims are padded to
128 lanes — up to 40x wasted bandwidth — and (B, 48, 48) contact matrices that
are re-read with 2.7x padding every solver sweep. Measured on a v5e: a
(B, 3) quat-rotate chain runs 5x slower than the (3, B) form, and the full
vmapped substep scales superlinearly with B.

This module implements the SAME math as engine.py with the batch as the
TRAILING dimension of every array — lanes stay full, sublane padding is
<= 1.33x — plus a Cholesky-preconditioned projected solve for contacts
(3 A-matrix sweeps instead of 30). engine.py remains the readable reference
implementation; tests assert both paths agree to float tolerance, and the
golden MuJoCo comparison gates them both.

Boundary convention: public entry points accept/return the standard
leading-batch PhysicsState pytrees used by the env layer, transposing once
per call (the state is ~150 floats/env — negligible next to 25 substeps).

Internal layouts:
  qpos (nq, B), qvel (nv, B), xpos (nb, 3, B), xquat (nb, 4, B),
  rmats (nb, 3, 3, B), S (nv, 6, B), cvel (nb, 6, B),
  inertias (nb, 6, 6, B), M (nv, nv, B), contacts (nc, ..., B).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from learninghumanoidwalking_tpu.physics import engine as eng
from learninghumanoidwalking_tpu.physics.model import FREE, HINGE, SLIDE, Contact, DynParams, Model, PhysicsState
from learninghumanoidwalking_tpu.physics.engine import Terrain, _tables
from learninghumanoidwalking_tpu.physics.linalg_small import cho_solve_outer, cholesky_outer

# number of preconditioned projected-refinement sweeps for the contact solve
PROJ_REFINE_ITERS = 4

_BOTTOM = eng._BOTTOM_CORNERS  # (4, 3)


# --------------------------------------------------------------------------
# trailing-batch vector math (axis 0 = component axis, trailing axes = batch)
# --------------------------------------------------------------------------


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_rotate(q, v):
    qv = q[1:]
    t = 2.0 * _cross(qv, v)
    return v + q[0] * t + _cross(qv, t)


def _quat_rotate_inv(q, v):
    qc = jnp.concatenate([q[:1], -q[1:]])
    return _quat_rotate(qc, v)


def _quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True)), eps)


def _quat_to_mat(q):
    """(4, B) -> (3, 3, B)."""
    w, x, y, z = q
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
        ]
    )


def _mat_vec(m, v):
    """(3, 3, B) @ (3, B) -> (3, B)."""
    return jnp.einsum("ijb,jb->ib", m, v)


def _motion_cross(v, m):
    w, v0 = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return jnp.concatenate([_cross(w, mw), _cross(w, mv) + _cross(v0, mw)])


def _force_cross(v, f):
    w, v0 = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([_cross(w, n) + _cross(v0, fl), _cross(w, fl)])


def _quat_integrate(q, omega, dt):
    """(4, B), (3, B): q * exp(0.5 dt omega_local)."""
    angle = jnp.sqrt(jnp.sum(omega * omega, axis=0)) * dt
    half = 0.5 * angle
    s = 0.5 * dt * jnp.sinc(half / jnp.pi)
    dq = jnp.concatenate([jnp.cos(half)[None], s * omega])
    return _quat_normalize(_quat_mul(q, dq))


# --------------------------------------------------------------------------
# kinematics / dynamics (trailing batch)
# --------------------------------------------------------------------------


def fk_b(model: Model, qpos: jnp.ndarray):
    """qpos (nq, B) -> xpos (nb, 3, B), xquat (nb, 4, B)."""
    batch = qpos.shape[1:]
    zero3 = jnp.zeros((3,) + batch)
    ident = jnp.concatenate([jnp.ones((1,) + batch), jnp.zeros((3,) + batch)])
    xpos = [zero3]
    xquat = [ident]
    for i in range(1, model.nbody):
        p = model.body_parent[i]
        bpos = np.asarray(model.body_pos)[i].reshape(3, *([1] * len(batch)))
        bquat = np.asarray(model.body_quat)[i].reshape(4, *([1] * len(batch)))
        x_pre = xpos[p] + _quat_rotate(xquat[p], jnp.asarray(bpos))
        q_pre = _quat_mul(xquat[p], jnp.broadcast_to(jnp.asarray(bquat), (4,) + batch))
        jt = model.jnt_type[i]
        adr = model.body_qpos_adr[i]
        if jt == FREE:
            x = qpos[adr : adr + 3]
            q = _quat_normalize(qpos[adr + 3 : adr + 7])
        elif jt == HINGE:
            angle = qpos[adr]
            axis = np.asarray(model.jnt_axis)[i]
            half = 0.5 * angle
            qj = jnp.stack([jnp.cos(half), axis[0] * jnp.sin(half), axis[1] * jnp.sin(half), axis[2] * jnp.sin(half)])
            q = _quat_mul(q_pre, qj)
            anchor = jnp.asarray(np.asarray(model.jnt_pos)[i].reshape(3, *([1] * len(batch))))
            anchor = jnp.broadcast_to(anchor, (3,) + batch)
            x = x_pre + _quat_rotate(q_pre, anchor) - _quat_rotate(q, anchor)
        elif jt == SLIDE:
            q = q_pre
            axis = np.asarray(model.jnt_axis)[i].reshape(3, *([1] * len(batch)))
            x = x_pre + jnp.asarray(axis) * qpos[adr][None]
        else:
            q = q_pre
            x = x_pre
        xpos.append(x)
        xquat.append(q)
    return jnp.stack(xpos), jnp.stack(xquat)


def motion_subspace_b(model: Model, xpos, rmats):
    """-> S (nv, 6, B)."""
    t = _tables(model)
    batch = xpos.shape[2:]
    blocks = []
    if t["free_body"] >= 0:
        fb = t["free_body"]
        rot = rmats[fb]  # (3, 3, B)
        zeros33 = jnp.zeros((3, 3) + batch)
        eye33 = jnp.broadcast_to(jnp.eye(3).reshape(3, 3, *([1] * len(batch))), (3, 3) + batch)
        lin = jnp.concatenate([zeros33, eye33], axis=1)  # (3 dofs, 6, B)
        # rotational dofs: axes = body frame columns rot[:, k]
        axes = jnp.stack([rot[:, k] for k in range(3)])  # (3 dofs, 3, B)
        xp = jnp.broadcast_to(xpos[fb][None], (3, 3) + batch)
        ang = jnp.concatenate([axes, jnp.stack([_cross(xpos[fb], axes[k]) for k in range(3)])], axis=1)
        blocks.append(jnp.concatenate([lin, ang]))
    if t["j_body"].size:
        rows = []
        for n, bi in enumerate(t["j_body"]):
            rot = rmats[bi]
            axis_l = np.asarray(model.jnt_axis)[bi]
            pos_l = np.asarray(model.jnt_pos)[bi]
            axis_w = axis_l[0] * rot[:, 0] + axis_l[1] * rot[:, 1] + axis_l[2] * rot[:, 2]  # (3, B)
            if t["j_is_hinge"][n] > 0.5:
                anchor = xpos[bi] + (pos_l[0] * rot[:, 0] + pos_l[1] * rot[:, 1] + pos_l[2] * rot[:, 2])
                rows.append(jnp.concatenate([axis_w, _cross(anchor, axis_w)]))
            else:
                rows.append(jnp.concatenate([jnp.zeros_like(axis_w), axis_w]))
        blocks.append(jnp.stack(rows))
    return jnp.concatenate(blocks)


def smooth_forces_b(model: Model, params_t, qpos, qvel, xpos, xquat, rmats, ctrl):
    """Per-substep FRESH half of the smooth dynamics: kinematic quantities
    and generalized forces (everything that must track the current state
    even when the mass-matrix factorization is reused across substeps).

    params_t: DynParams transposed to trailing batch (leaves (..., B)).
    Returns (jac (nb,6,nv,B), s_mat (nv,6,B), cvel (nb,6,B),
    inertias (nb,6,6,B), qfrc_smooth (nv,B), act_force (nu,B))."""
    t = _tables(model)
    anc = jnp.asarray(t["anc"])  # (nb, nv)

    s_mat = motion_subspace_b(model, xpos, rmats)  # (nv, 6, B)
    sv = s_mat * qvel[:, None]  # (nv, 6, B)
    cvel = jnp.einsum("nv,vsb->nsb", anc, sv)  # (nb, 6, B)

    # spatial inertias (nb, 6, 6, B)
    from learninghumanoidwalking_tpu.physics.spec import _quat_to_mat_np

    iq_mats = np.stack([_quat_to_mat_np(q) for q in np.asarray(model.body_iquat)])
    rot = jnp.einsum("nijb,njk->nikb", rmats, jnp.asarray(iq_mats))  # (nb,3,3,B)
    mass_ratio = params_t.body_mass / jnp.maximum(
        jnp.asarray(np.asarray(model.body_mass))[:, None], 1e-9
    )  # (nb, B)
    diag = jnp.asarray(np.asarray(model.body_inertia))[:, :, None] * mass_ratio[:, None]  # (nb,3,B)
    i_com = jnp.einsum("nijb,njb,nkjb->nikb", rot, diag, rot)
    com = xpos + jnp.einsum("nijb,njb->nib", rmats, params_t.body_ipos)
    zero = jnp.zeros_like(com[:, 0])
    cx = jnp.stack(
        [
            jnp.stack([zero, -com[:, 2], com[:, 1]], axis=1),
            jnp.stack([com[:, 2], zero, -com[:, 0]], axis=1),
            jnp.stack([-com[:, 1], com[:, 0], zero], axis=1),
        ],
        axis=1,
    )  # (nb, 3, 3, B)
    m_ = params_t.body_mass[:, None, None]  # (nb,1,1,B)
    ibar = i_com - m_ * jnp.einsum("nijb,njkb->nikb", cx, cx)
    eye3 = jnp.broadcast_to(jnp.eye(3)[None, :, :, None], cx.shape)
    top = jnp.concatenate([ibar, m_ * cx], axis=2)
    bot = jnp.concatenate([m_ * jnp.swapaxes(cx, 1, 2), m_ * eye3], axis=2)
    inertias = jnp.concatenate([top, bot], axis=1)  # (nb, 6, 6, B)

    # body jacobians (nb, 6, nv, B) = S^T masked by ancestors
    jac = s_mat.transpose(1, 0, 2)[None] * anc[:, None, :, None]  # (nb,6,nv,B)

    # bias (gravity trick: base acceleration = -g)
    v_dof = jnp.einsum("vn,nsb->vsb", jnp.asarray(np.eye(model.nbody, dtype=np.float32)[np.asarray(model.dof_body)]), cvel)
    cross_terms = _motion_cross(v_dof.transpose(1, 0, 2), sv.transpose(1, 0, 2)).transpose(1, 0, 2)  # (nv,6,B)
    g = np.concatenate([np.zeros(3), -np.asarray(model.gravity)]).astype(np.float32)
    acc = jnp.asarray(g)[None, :, None] + jnp.einsum("nv,vsb->nsb", anc, cross_terms)
    momentum = jnp.einsum("nijb,njb->nib", inertias, cvel)
    f = jnp.einsum("nijb,njb->nib", inertias, acc)
    f = f + _force_cross(cvel.transpose(1, 0, 2), momentum.transpose(1, 0, 2)).transpose(1, 0, 2)
    qfrc_bias = jnp.einsum("najb,nab->jb", jac, f)

    # actuation
    lo = np.asarray(model.actuator_ctrlrange)[:, 0][:, None]
    hi = np.asarray(model.actuator_ctrlrange)[:, 1][:, None]
    ctrl = jnp.clip(ctrl, jnp.asarray(lo), jnp.asarray(hi))
    act_force = jnp.asarray(np.asarray(model.actuator_gear))[:, None] * ctrl  # (nu, B)
    qfrc_act = _put_rows_b(model.nv, model.actuator_dof, act_force)

    qfrc_passive = -params_t.dof_frictionloss * jnp.tanh(qvel / 0.02)
    qfrc_damp = -params_t.dof_damping * qvel

    xf = params_t.xfrc  # (nb, 6, B): (force, torque)
    moment = _cross(xpos.transpose(1, 0, 2), xf[:, :3].transpose(1, 0, 2)).transpose(1, 0, 2) + xf[:, 3:]
    f_spatial = jnp.concatenate([moment, xf[:, :3]], axis=1)
    qfrc_xfrc = jnp.einsum("najb,nab->jb", jac, f_spatial)

    qfrc_smooth = qfrc_act + qfrc_passive + qfrc_damp + qfrc_xfrc - qfrc_bias
    return jac, s_mat, cvel, inertias, qfrc_smooth, act_force


def factorize_b(model: Model, params_t, jac, inertias, dt):
    """REFRESH-time factorization: CRBA mass matrix + implicit-damping
    Cholesky. M(q) varies on the configuration timescale (~40 Hz), not the
    1 kHz substep timescale, so pd_substeps_batched recomputes this only
    every `reuse_interval` substeps (PERFORMANCE.md round-5 lever)."""
    m_mat = jnp.einsum("najb,nakb,nklb->jlb", jac, inertias, jac)
    m_mat = m_mat + jnp.asarray(np.diag(np.asarray(model.dof_armature)))[:, :, None]
    mh = m_mat + dt * _diag_embed_b(params_t.dof_damping)
    # unrolled Cholesky (trailing batch, no transposes, no custom calls)
    return cholesky_outer(mh)  # (nv, nv, B)


def smooth_dynamics_b(model: Model, params_t, qpos, qvel, xpos, xquat, rmats, ctrl, dt):
    """Trailing-batch smooth dynamics (fresh factorization; composition of
    smooth_forces_b + factorize_b, kept as the readable R=1 reading).

    Returns (jac (nb,6,nv,B), chol (nv,nv,B), qacc_smooth (nv,B),
    act_force (nu,B), s_mat, cvel)."""
    jac, s_mat, cvel, inertias, qfrc_smooth, act_force = smooth_forces_b(
        model, params_t, qpos, qvel, xpos, xquat, rmats, ctrl
    )
    chol = factorize_b(model, params_t, jac, inertias, dt)
    qacc_smooth = cho_solve_outer(chol, qfrc_smooth)
    return jac, chol, qacc_smooth, act_force, s_mat, cvel


def _diag_embed_b(v):
    """(n, B) -> (n, n, B) diagonal."""
    n = v.shape[0]
    return jnp.asarray(np.eye(n, dtype=np.float32))[:, :, None] * v[None]


def _put_rows_b(n, idx, vals):
    """Trailing-batch put_rows (contiguous or one-hot)."""
    idx = np.asarray(idx)
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
    oh = jnp.asarray(np.eye(n, dtype=np.float32)[:, idx])
    return jnp.einsum("ni,i...->n...", oh, vals)


def _take_rows_b(x, idx):
    idx = np.asarray(idx)
    if idx.size == 0:
        return x[:0]
    if np.all(np.diff(idx) == 1):
        return jax.lax.slice_in_dim(x, int(idx[0]), int(idx[0]) + idx.size, axis=0)
    oh = jnp.asarray(np.eye(x.shape[0], dtype=np.float32)[idx])
    return jnp.einsum("in,n...->i...", oh, x)


def _cho_solve_b(chol, rhs):
    """chol (n, n, B) from cholesky_outer; rhs (n, B) or (n, k, B)."""
    return cho_solve_outer(chol, rhs)


# --------------------------------------------------------------------------
# contacts (trailing batch)
# --------------------------------------------------------------------------


def _hfield_sample_b(terrain_t: Terrain, u, v):
    """Bilinear tent-weight contraction at fractional indices u, v (..., B)
    over the trailing-batch grid (H, W, B) (engine.hfield_query twin)."""
    grid = terrain_t.hfield
    hgt, wid = grid.shape[0], grid.shape[1]
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.arange(wid, dtype=u.dtype)[:, None] - u[..., None, :]))
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.arange(hgt, dtype=v.dtype)[:, None] - v[..., None, :]))
    # contract W first, then H (same order as engine/kernel twins)
    racc = jnp.einsum("hwb,...wb->...hb", grid, wu)
    return jnp.sum(wv * racc, axis=-2)


def _hfield_query_b(terrain_t: Terrain, x, y):
    """x, y (..., B) -> (height above floor_z (..., B), normal (..., 3, B))."""
    grid = terrain_t.hfield
    hgt, wid = grid.shape[0], grid.shape[1]
    cell = terrain_t.hfield_cell  # (2, B)
    u = jnp.clip((x - terrain_t.hfield_x0y0[0]) / cell[0], 0.0, wid - 1.0)
    v = jnp.clip((y - terrain_t.hfield_x0y0[1]) / cell[1], 0.0, hgt - 1.0)
    h = _hfield_sample_b(terrain_t, u, v)
    # actual clip-shrunk span in the denominator (engine.hfield_query twin)
    e = 0.25
    up, um = jnp.clip(u + e, 0.0, wid - 1.0), jnp.clip(u - e, 0.0, wid - 1.0)
    vp, vm = jnp.clip(v + e, 0.0, hgt - 1.0), jnp.clip(v - e, 0.0, hgt - 1.0)
    dh_dx = (_hfield_sample_b(terrain_t, up, v) - _hfield_sample_b(terrain_t, um, v)) / ((up - um) * cell[0])
    dh_dy = (_hfield_sample_b(terrain_t, u, vp) - _hfield_sample_b(terrain_t, u, vm)) / ((vp - vm) * cell[1])
    n = jnp.stack([-dh_dx, -dh_dy, jnp.ones_like(h)], axis=-2)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-2, keepdims=True))
    return h, n


def _support_height_b(terrain_t: Terrain | None, x, y):
    """x, y: (..., B) world coords -> support height (..., B)."""
    if terrain_t is None:
        return jnp.zeros_like(x)
    # terrain_t leaves: pos (nt, 3, B), size (nt, 3, B), yaw (nt, B), floor_z (B,)
    ground = terrain_t.floor_z
    if terrain_t.hfield is not None:
        ground = ground + _hfield_query_b(terrain_t, x, y)[0]
    if terrain_t.pos.shape[0] == 0:
        return jnp.broadcast_to(ground, x.shape)
    c = jnp.cos(terrain_t.yaw)
    s = jnp.sin(terrain_t.yaw)
    dx = x[..., None, :] - terrain_t.pos[:, 0]
    dy = y[..., None, :] - terrain_t.pos[:, 1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    inside = (jnp.abs(lx) <= terrain_t.size[:, 0]) & (jnp.abs(ly) <= terrain_t.size[:, 1])
    tops = jnp.where(inside, terrain_t.pos[:, 2] + terrain_t.size[:, 2], -jnp.inf)
    return jnp.maximum(ground, jnp.max(tops, axis=-2))


def _terrain_contact_b(terrain_t: Terrain, p):
    """Trailing-batch twin of engine.terrain_contact: p (3, B) ->
    (dist (B,), normal (3, B)). Box-only SDF (the floor plane has its own
    contact slot): side faces (risers) collide; boxes resting on/below the
    floor are treated as columns (no bottom face)."""
    c = jnp.cos(terrain_t.yaw)
    s = jnp.sin(terrain_t.yaw)  # (nt, B)
    dx = p[0][None] - terrain_t.pos[:, 0]
    dy = p[1][None] - terrain_t.pos[:, 1]
    lz = p[2][None] - terrain_t.pos[:, 2]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    sz_half = terrain_t.size[:, 2]
    ex = jnp.abs(lx) - terrain_t.size[:, 0]
    ey = jnp.abs(ly) - terrain_t.size[:, 1]
    resting = (terrain_t.pos[:, 2] - sz_half) <= terrain_t.floor_z[None] + 1e-4
    ez = jnp.where(resting, lz - sz_half, jnp.abs(lz) - sz_half)
    sgz = jnp.where(resting, 1.0, jnp.sign(lz))
    inside = (ex < 0.0) & (ey < 0.0) & (ez < 0.0)
    pen = jnp.maximum(jnp.maximum(ex, ey), ez)
    is_z = (ez >= ex) & (ez >= ey)
    is_x = ex >= ey
    sx_, sy_ = jnp.sign(lx), jnp.sign(ly)
    nx = jnp.where(is_z, 0.0, jnp.where(is_x, sx_ * c, -sy_ * s))
    ny = jnp.where(is_z, 0.0, jnp.where(is_x, sx_ * s, sy_ * c))
    nz = jnp.where(is_z, sgz, 0.0)

    any_pen = jnp.any(inside, axis=0)  # (B,)
    score = jnp.where(inside, pen, -1e9)
    best = jnp.max(score, axis=0)
    sel = ((score == best[None]) & inside).astype(p.dtype)
    sel = sel / jnp.maximum(jnp.sum(sel, axis=0, keepdims=True), 1.0)
    n = jnp.stack([jnp.sum(sel * nx, 0), jnp.sum(sel * ny, 0), jnp.sum(sel * nz, 0)])
    n = n / jnp.maximum(jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True)), 1e-6)
    z_up = jnp.array([0.0, 0.0, 1.0])[:, None]
    normal = jnp.where(any_pen[None], n, z_up)
    dist = jnp.where(any_pen, best, 1e3)
    return dist, normal


def _frame_from_normal_b(n):
    """(3, B) unit normal -> frame rows (3, 3, B): (n, t1, t2). For n=+z this
    is the static (z, x, y) frame (see engine.frame_from_normal)."""
    h2 = n[0] * n[0] + n[1] * n[1]
    h = jnp.sqrt(jnp.maximum(h2, 1e-12))
    horiz = h2 > 0.25
    t1 = jnp.stack(
        [
            jnp.where(horiz, -n[1] / h, 1.0),
            jnp.where(horiz, n[0] / h, 0.0),
            jnp.zeros_like(h),
        ]
    )
    t2 = _cross(n, t1)
    return jnp.stack([n, t1, t2])


def detect_contacts_b(model: Model, xpos, xquat, rmats, terrain_t):
    """-> (cpos (nc, 3, B), dist (nc, B), mask (nc, B), frame (nc, 3, 3, B)).

    Terrain models emit TWO slots per corner — floor plane (static z frame)
    then terrain-box SDF — mirroring engine.detect_contacts."""
    batch = xpos.shape[2:]
    all_pos, all_dist, all_frame = [], [], []
    for gi in model.foot_geoms:
        bi = model.geom_body[gi]
        gpos_l = np.asarray(model.geom_pos)[gi]
        gquat_l = np.asarray(model.geom_quat)[gi]
        size = np.asarray(model.geom_size)[gi]
        rot_b = rmats[bi]  # (3, 3, B)
        # geom rotation = body rot @ const geom quat rot
        from learninghumanoidwalking_tpu.physics.spec import _quat_to_mat_np

        gr = _quat_to_mat_np(gquat_l)
        rot_g = jnp.einsum("ijb,jk->ikb", rot_b, jnp.asarray(gr))
        gpos = xpos[bi] + _mat_vec(rot_b, jnp.broadcast_to(jnp.asarray(gpos_l)[:, None], (3,) + xpos.shape[2:]))
        corners_l = _BOTTOM * size[None, :]  # (4, 3)
        # world corners: (4, 3, B)
        cw = gpos[None] + jnp.einsum("ijb,cj->cib", rot_g, jnp.asarray(corners_l))
        z_frame = jnp.broadcast_to(
            jnp.eye(3)[np.array([2, 0, 1])][None, :, :, None], (4, 3, 3) + batch
        )
        if terrain_t is None:
            all_pos.append(cw)
            all_dist.append(cw[:, 2])
            all_frame.append(z_frame)
        else:
            if terrain_t.hfield is not None:
                # heightfield replaces the flat floor in the 4 corner slots:
                # vertical gap to the surface, scaled onto the local normal
                hz, hn = _hfield_query_b(terrain_t, cw[:, 0], cw[:, 1])  # (4,B), (4,3,B)
                floor_dist = (cw[:, 2] - (terrain_t.floor_z[None] + hz)) * hn[:, 2]
                ground_frame = jnp.stack([_frame_from_normal_b(hn[ci]) for ci in range(4)])
            else:
                floor_dist = cw[:, 2] - terrain_t.floor_z[None]
                ground_frame = z_frame
            if terrain_t.pos.shape[0] == 0:  # hfield-only: no box slots
                all_pos.append(cw)
                all_dist.append(floor_dist)
                all_frame.append(ground_frame)
                continue
            dists, frames = [], []
            for ci in range(4):
                d, n = _terrain_contact_b(terrain_t, cw[ci])
                dists.append(d)
                frames.append(_frame_from_normal_b(n))
            all_pos.append(jnp.concatenate([cw, cw]))
            all_dist.append(jnp.concatenate([floor_dist, jnp.stack(dists)]))
            all_frame.append(jnp.concatenate([ground_frame, jnp.stack(frames)]))
    cpos = jnp.concatenate(all_pos)  # (nc, 3, B)
    dist = jnp.concatenate(all_dist)  # (nc, B)
    frame = jnp.concatenate(all_frame)  # (nc, 3, 3, B)
    mask = (dist < eng.CONTACT_MARGIN).astype(cpos.dtype)
    return cpos, dist, mask, frame


def contact_jacobian_b(model: Model, jac, cpos, cframe):
    """-> Jc (nc, 3, nv, B): contact-point velocities in the contact frame
    rows (normal, t1, t2)."""
    spg = eng.slots_per_geom(model)
    blocks = []
    slot = 0
    for gi in model.foot_geoms:
        bi = model.geom_body[gi]
        jb = jac[bi]  # (6, nv, B)
        ang, lin = jb[:3], jb[3:]
        for c in range(spg):
            p = cpos[slot]  # (3, B)
            # v_point = lin + ang x p  per dof: lin[:, v] - p x ang[:, v]
            jp = lin - jnp.stack(
                [
                    p[1] * ang[2] - p[2] * ang[1],
                    p[2] * ang[0] - p[0] * ang[2],
                    p[0] * ang[1] - p[1] * ang[0],
                ]
            )
            blocks.append(jnp.einsum("fib,ivb->fvb", cframe[slot], jp))
            slot += 1
    return jnp.stack(blocks)  # (nc, 3, nv, B)


def constraint_solve_b(model: Model, qvel, jac, chol, qacc_smooth, cpos, dist, mask, cframe):
    """Soft-contact solve, trailing batch. Returns (qacc (nv,B), force (nc,3,B)).

    Instead of many Jacobi sweeps, uses the exact (Cholesky) solve of the
    regularized dual as a preconditioner with a few projected refinements:
    each sweep is exact on the current active set, so 3-4 sweeps reach the
    same forces 30 plain sweeps did (validated against engine.py and MuJoCo).
    """
    nc = model.ncon
    if nc == 0:
        return qacc_smooth, jnp.zeros((0, 3) + qvel.shape[1:])

    jc = contact_jacobian_b(model, jac, cpos, cframe)  # (nc, 3, nv, B)
    jc_flat = jc.reshape(3 * nc, model.nv, -1)  # (3nc, nv, B)
    minv_jt = _cho_solve_b(chol, jc_flat.transpose(1, 0, 2))  # (nv, 3nc, B)
    a_mat = jnp.einsum("ivb,vjb->ijb", jc_flat, minv_jt)  # (3nc, 3nc, B)

    pen = jnp.minimum(dist, 0.0)  # (nc, B)
    imp_min = float(np.asarray(model.imp_min))
    imp_max = float(np.asarray(model.imp_max))
    width = float(np.asarray(model.imp_width))
    timeconst = float(np.asarray(model.timeconst))
    dampratio = float(np.asarray(model.dampratio))
    imp = imp_min + (imp_max - imp_min) * jnp.clip(-pen / width, 0.0, 1.0)
    k = 1.0 / max(imp_max**2 * timeconst**2 * dampratio**2, 1e-12)
    b_c = 2.0 / max(imp_max * timeconst, 1e-12)

    vel_c = jnp.einsum("cfvb,vb->cfb", jc, qvel)  # (nc, 3, B)
    aref = -b_c * vel_c
    aref = aref.at[:, 0].add(-k * imp * pen)

    diag_a = jnp.diagonal(a_mat, axis1=0, axis2=1).transpose(1, 0)  # (3nc, B)
    r_reg = jnp.repeat((1.0 - imp) / jnp.maximum(imp, 1e-6), 3, axis=0)  # (3nc, B)
    r_diag = r_reg * jnp.clip(diag_a, 1e-8, None)
    mask3 = jnp.repeat(mask, 3, axis=0)  # (3nc, B)
    a_mat = a_mat * (mask3[:, None] * mask3[None, :]) + _diag_embed_b(1.0 - mask3 + r_diag * mask3)

    b_vec = (aref.reshape(3 * nc, -1) - jnp.einsum("ivb,vb->ib", jc_flat, qacc_smooth)) * mask3

    mu = np.repeat(
        [float(np.asarray(model.geom_friction)[gi]) for gi in model.foot_geoms],
        eng.slots_per_geom(model),
    ).astype(np.float32)
    mu = jnp.asarray(mu)[:, None]

    chol_a = cholesky_outer(a_mat)  # (3nc, 3nc, B)

    def project(f):
        f3 = f.reshape(nc, 3, -1)
        fn = jnp.maximum(f3[:, 0], 0.0)
        ft = f3[:, 1:]
        ft_norm = jnp.sqrt(jnp.sum(ft * ft, axis=1, keepdims=True)) + 1e-9
        scale = jnp.minimum(1.0, (mu * fn)[:, None] / ft_norm)
        f3 = jnp.concatenate([fn[:, None], ft * scale], axis=1) * mask[:, None]
        return f3.reshape(3 * nc, -1)

    def sweep(f, _):
        r = b_vec - jnp.einsum("ijb,jb->ib", a_mat, f)
        f = project(f + _cho_solve_b(chol_a, r))
        return f, None

    f0 = project(_cho_solve_b(chol_a, b_vec))
    force, _ = jax.lax.scan(sweep, f0, None, length=PROJ_REFINE_ITERS - 1)

    qfrc_con = jnp.einsum("ivb,ib->vb", jc_flat, force)
    qacc = qacc_smooth + _cho_solve_b(chol, qfrc_con)
    return qacc, force.reshape(nc, 3, -1)


# --------------------------------------------------------------------------
# integration + step
# --------------------------------------------------------------------------


def integrate_b(model: Model, qpos, qvel, dt):
    t = _tables(model)
    new_qpos = qpos
    if t["j_qpos"].size:
        new_qpos = new_qpos + _put_rows_b(model.nq, t["j_qpos"], dt * _take_rows_b(qvel, t["j_dof"]))
    fb = t["free_body"]
    if fb >= 0:
        qadr, dadr = model.body_qpos_adr[fb], model.body_dof_adr[fb]
        pos = qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
        quat = _quat_integrate(qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt)
        head = new_qpos[:qadr] if qadr > 0 else new_qpos[:0]
        tail = new_qpos[qadr + 7 :]
        new_qpos = jnp.concatenate([head, pos, quat, tail])
    return new_qpos


def step_b(model: Model, params_t: DynParams, qpos, qvel, ctrl, dt, terrain_t=None, cache=None):
    """One substep, trailing batch. Returns (qpos, qvel, qacc, act_force,
    cpos, dist, mask, force, frame, cache) — all trailing-batch.

    cache: optional (jac, chol) from an earlier refresh substep. When given,
    the contact solve and both M-solves run against the LAGGED Cholesky and
    LAGGED contact basis (body jacobians), while FK, S, cvel, bias forces and
    contact offsets/frames/impedance stay current — the factorization-reuse
    scheme (lag error O(|qvel| R dt), gated by the R=5 MuJoCo golden and the
    kernel equivalence test). cache=None factorizes fresh (exact, R=1
    semantics) and returns the new cache."""
    xpos, xquat = fk_b(model, qpos)
    rmats = _quat_to_mat(xquat.transpose(1, 0, 2)).transpose(2, 0, 1, 3)  # (nb,3,3,B)
    jac, s_mat, cvel, inertias, qfrc_smooth, act_force = smooth_forces_b(
        model, params_t, qpos, qvel, xpos, xquat, rmats, ctrl
    )
    if cache is None:
        cache = (jac, factorize_b(model, params_t, jac, inertias, dt))
    jac_c, chol = cache
    qacc_smooth = cho_solve_outer(chol, qfrc_smooth)
    cpos, dist, mask, cframe = detect_contacts_b(model, xpos, xquat, rmats, terrain_t)
    qacc, force = constraint_solve_b(model, qvel, jac_c, chol, qacc_smooth, cpos, dist, mask, cframe)
    qvel = qvel + dt * qacc
    # runaway guard: contact penetration -> force -> velocity feedback can
    # overflow f32 within one control step; clamp far above physical speeds
    qvel = jnp.clip(qvel, -1e4, 1e4)
    qpos = integrate_b(model, qpos, qvel, dt)
    return qpos, qvel, qacc, act_force, cpos, dist, mask, force, cframe, cache


# --------------------------------------------------------------------------
# public boundary: leading-batch PhysicsState in/out
# --------------------------------------------------------------------------


def _t2(x):  # (B, a) <-> (a, B)
    return jnp.swapaxes(x, 0, 1) if x.ndim >= 2 else x


def _params_to_trailing(params: DynParams) -> DynParams:
    return DynParams(
        dof_damping=_t2(params.dof_damping),
        dof_frictionloss=_t2(params.dof_frictionloss),
        body_mass=_t2(params.body_mass),
        body_ipos=jnp.transpose(params.body_ipos, (1, 2, 0)),
        xfrc=jnp.transpose(params.xfrc, (1, 2, 0)),
        kp=_t2(params.kp),
        kd=_t2(params.kd),
        bemf_gain=_t2(params.bemf_gain),
    )


def _terrain_to_trailing(terrain: Terrain | None) -> Terrain | None:
    if terrain is None:
        return None
    return Terrain(
        pos=jnp.transpose(terrain.pos, (1, 2, 0)),
        size=jnp.transpose(terrain.size, (1, 2, 0)),
        yaw=_t2(terrain.yaw),
        floor_z=terrain.floor_z,
        hfield=None if terrain.hfield is None else jnp.transpose(terrain.hfield, (1, 2, 0)),
        hfield_x0y0=None if terrain.hfield_x0y0 is None else _t2(terrain.hfield_x0y0),
        hfield_cell=None if terrain.hfield_cell is None else _t2(terrain.hfield_cell),
    )


def pd_substeps_batched(
    model: Model,
    params: DynParams,  # leading-batch (B, ...)
    physics: PhysicsState,  # leading-batch
    target: jnp.ndarray,  # (B, nu)
    frame_skip: int,
    sim_dt: float,
    terrain: Terrain | None = None,
    settle: bool = False,
    motor=None,
    reuse_interval: int = 1,
) -> PhysicsState:
    """Batched drop-in for robots.pd.pd_substeps over a whole env batch.

    Transposes to trailing-batch once, scans frame_skip substeps, and
    rebuilds the leading-batch PhysicsState (with FK caches refreshed).
    With settle=True, applies zero torque (reset settling steps).

    motor: optional (motor_params, MotorState-leading-batch) pair. When
    given, the commanded PD torque passes through the learned motor hook
    every substep (robots.motor, robot_interface.py:510-533) and the
    return value becomes (PhysicsState, MotorState) — the batched twin of
    robots.motor.pd_substeps_motor, keeping motor-enabled envs on the
    batch-in-lanes fast path instead of the vmapped single-env engine.

    reuse_interval R: recompute the mass-matrix factorization + contact
    basis only on substeps 0, R, 2R, ... (must divide frame_skip; anything
    else falls back to 1 = exact semantics). See step_b's cache contract.
    """
    params_t = _params_to_trailing(params)
    terrain_t = _terrain_to_trailing(terrain)
    qpos = _t2(physics.qpos)
    qvel = _t2(physics.qvel)
    tgt = _t2(target)
    if motor is not None:
        from learninghumanoidwalking_tpu.robots.motor import MotorState, motor_substep_torque_b

        motor_params, mstate = motor
        # (B, H, nu) -> (H, nu, B)
        m_carry0 = (
            jnp.transpose(mstate.qdot_hist, (1, 2, 0)),
            jnp.transpose(mstate.ctau_hist, (1, 2, 0)),
            mstate.count,
        )
    else:
        m_carry0 = None

    reuse = int(reuse_interval or 1)
    if reuse < 1 or frame_skip % reuse != 0:
        reuse = 1

    def substep(carry, cache):
        qpos, qvel, m_carry = carry
        if settle:
            ctrl = jnp.zeros((model.nu,) + qpos.shape[1:])
        else:
            q = _take_rows_b(qpos, model.actuator_qpos)
            v = _take_rows_b(qvel, model.actuator_dof)
            tau = params_t.kp * (tgt - q) - params_t.kd * v - params_t.bemf_gain * v
            if m_carry is not None:
                qd_h, ct_h, count = m_carry
                tau, qd_h, ct_h, count = motor_substep_torque_b(motor_params, qd_h, ct_h, count, v, tau)
                m_carry = (qd_h, ct_h, count)
            ctrl = tau / jnp.asarray(np.asarray(model.actuator_gear))[:, None]
        out = step_b(model, params_t, qpos, qvel, ctrl, sim_dt, terrain_t, cache=cache)
        qpos, qvel = out[0], out[1]
        return (qpos, qvel, m_carry), out[2:9], out[9]

    def group(carry, _):
        # substep 0 of the group refreshes the factorization; the remaining
        # reuse-1 substeps run against the lagged cache
        carry, extras, cache = substep(carry, None)
        if reuse > 1:
            def inner(c, _):
                c, ex, _ = substep(c, cache)
                return c, ex

            carry, tail = jax.lax.scan(inner, carry, None, length=reuse - 1)
            extras = jax.tree.map(lambda x: x[-1], tail)
        return carry, extras

    (qpos, qvel, m_carry), tail = jax.lax.scan(
        group, (qpos, qvel, m_carry0), None, length=frame_skip // reuse
    )
    qacc, act_force, cpos, dist, mask, force, cframe = [jax.tree.map(lambda x: x[-1], t) for t in tail]

    # rebuild leading-batch state with fresh FK caches
    xpos, xquat = fk_b(model, qpos)
    rmats = _quat_to_mat(xquat.transpose(1, 0, 2)).transpose(2, 0, 1, 3)
    s_mat = motion_subspace_b(model, xpos, rmats)
    anc = jnp.asarray(_tables(model)["anc"])
    cvel = jnp.einsum("nv,vsb->nsb", anc, s_mat * qvel[:, None])

    batch = qpos.shape[1]
    ncon = model.ncon
    contact = Contact(
        pos=jnp.transpose(cpos, (2, 0, 1)),
        frame=jnp.transpose(cframe, (3, 0, 1, 2)),
        dist=_t2(dist),
        geom=jnp.broadcast_to(
            jnp.asarray(
                np.repeat([gi for gi in model.foot_geoms], eng.slots_per_geom(model)), dtype=jnp.int32
            )[None],
            (batch, ncon),
        ),
        force=jnp.transpose(force, (2, 0, 1)),
        mask=_t2(mask),
    )
    out_state = PhysicsState(
        qpos=_t2(qpos),
        qvel=_t2(qvel),
        qacc=_t2(qacc),
        act_torque=_t2(act_force),
        xpos=jnp.transpose(xpos, (2, 0, 1)),
        xquat=jnp.transpose(xquat, (2, 0, 1)),
        cvel=jnp.transpose(cvel, (2, 0, 1)),
        contact=contact,
        time=physics.time + frame_skip * sim_dt,
    )
    if motor is not None:
        qd_h, ct_h, count = m_carry
        mstate_out = MotorState(
            qdot_hist=jnp.transpose(qd_h, (2, 0, 1)),
            ctau_hist=jnp.transpose(ct_h, (2, 0, 1)),
            count=count,
        )
        return out_state, mstate_out
    return out_state
