"""Pallas TPU mega-kernel: a full control step (frame_skip PD+physics
substeps) in ONE kernel launch.

Motivation (measured on the axon v5e runtime):
  * every XLA fusion boundary in the substep costs an HBM round trip on
    sublane-padded little arrays, capping the jnp engines at ~1 us per
    env-substep regardless of batch size;
  * a pallas_call has a fixed ~1.5 ms dispatch cost but per-op cost inside
    the kernel is negligible — so the win comes from fusing ALL 25 substeps
    of a control tick into one launch with the whole working set in VMEM.

Layout: grid over env tiles of TB lanes; every per-env quantity is a
(rows, TB) block (sublanes x lanes). "Scalars" are (1, TB) slices; vectors
are (3/4/6, TB) blocks; matrices are Python lists of row blocks. The tree,
masses, and geometry are static Python constants baked into the kernel, so
the generated code is straight-line VPU arithmetic.

Scope: all envs. Flat-floor and terrain contacts (the stepping/rough envs
pass their per-env Terrain boxes as support-height inputs). Domain
randomization enters through the dyn-param inputs like everywhere else.

Correctness gate: tests/test_kernel.py compares this kernel (interpret mode)
against physics/batched.py step-for-step; the MuJoCo golden suite gates the
shared semantics.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learninghumanoidwalking_tpu.physics import engine as eng
from learninghumanoidwalking_tpu.physics.engine import _tables
from learninghumanoidwalking_tpu.physics.model import FREE, HINGE, SLIDE, Model
from learninghumanoidwalking_tpu.physics.spec import _quat_to_mat_np

PROJ_REFINE_ITERS = 3


# ---------------------------------------------------------------------------
# (rows, TB) block helpers — everything stays >= 2D for Mosaic
# ---------------------------------------------------------------------------


def _cross(a, b):
    """(3,TB) x (3,TB)."""
    return jnp.concatenate(
        [
            a[1:2] * b[2:3] - a[2:3] * b[1:2],
            a[2:3] * b[0:1] - a[0:1] * b[2:3],
            a[0:1] * b[1:2] - a[1:2] * b[0:1],
        ]
    )


def _qmul(q1, q2):
    w1, x1, y1, z1 = q1[0:1], q1[1:2], q1[2:3], q1[3:4]
    w2, x2, y2, z2 = q2[0:1], q2[1:2], q2[2:3], q2[3:4]
    return jnp.concatenate(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _qrot(q, v):
    qv = q[1:4]
    t = 2.0 * _cross(qv, v)
    return v + q[0:1] * t + _cross(qv, t)


def _qnormalize(q):
    n = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True) + 1e-12)
    return q / n


def _qmat(q):
    """quat (4,TB) -> R as list of 3 row blocks, each (3,TB)."""
    w, x, y, z = q[0:1], q[1:2], q[2:3], q[3:4]
    r0 = jnp.concatenate([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)])
    r1 = jnp.concatenate([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)])
    r2 = jnp.concatenate([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)])
    return [r0, r1, r2]


def _matvec3(rows, v):
    """rows: list of 3 (3,TB) row blocks; v (3,TB) -> (3,TB)."""
    return jnp.concatenate([jnp.sum(rows[i] * v, axis=0, keepdims=True) for i in range(3)])


def _matvec3_t(rows, v):
    """R^T v."""
    return (
        rows[0] * v[0:1] + rows[1] * v[1:2] + rows[2] * v[2:3]
    )


def _matvec_np3(const_rows: np.ndarray, v):
    """constant 3x3 (numpy) times (3,TB)."""
    out = []
    for i in range(3):
        out.append(const_rows[i, 0] * v[0:1] + const_rows[i, 1] * v[1:2] + const_rows[i, 2] * v[2:3])
    return jnp.concatenate(out)


def _dot(a, b):
    """(k,TB)·(k,TB) -> (1,TB)."""
    return jnp.sum(a * b, axis=0, keepdims=True)


def _const(val, tb):
    return jnp.full((1, *tb), float(val), dtype=jnp.float32)


# ---------------------------------------------------------------------------
# kernel body builder
# ---------------------------------------------------------------------------


def _build_substep(model: Model, dt: float, tb: int, hfield_shape=None):
    """Returns fn(qpos (nq,TB), qvel (nv,TB), ctx) -> (qpos, qvel, extras).

    ctx carries the dyn-param blocks. All model structure is static;
    hfield_shape (H, W) statically enables heightfield ground contacts
    (ctx gains hfield (H*W,TB), hf_x0y0 (2,TB), hf_cell (2,TB))."""
    t = _tables(model)
    nb, nv, nq, nu = model.nbody, model.nv, model.nq, model.nu
    parent = model.body_parent
    body_pos = np.asarray(model.body_pos)
    body_quat = np.asarray(model.body_quat)
    jnt_axis = np.asarray(model.jnt_axis)
    jnt_pos = np.asarray(model.jnt_pos)
    body_inertia = np.asarray(model.body_inertia)
    body_mass_np = np.asarray(model.body_mass)
    iquat_mats = np.stack([_quat_to_mat_np(q) for q in np.asarray(model.body_iquat)])
    armature = np.asarray(model.dof_armature)
    gear = np.asarray(model.actuator_gear)
    ctrl_lo = np.asarray(model.actuator_ctrlrange)[:, 0]
    ctrl_hi = np.asarray(model.actuator_ctrlrange)[:, 1]
    gravity = np.asarray(model.gravity)
    anc = t["anc"]  # (nb, nv) numpy float
    free_body = t["free_body"]
    imp_min = float(np.asarray(model.imp_min))
    imp_max = float(np.asarray(model.imp_max))
    width = float(np.asarray(model.imp_width))
    k_ref = 1.0 / max(imp_max**2 * float(np.asarray(model.timeconst)) ** 2 * float(np.asarray(model.dampratio)) ** 2, 1e-12)
    b_ref = 2.0 / max(imp_max * float(np.asarray(model.timeconst)), 1e-12)

    # dof bookkeeping: list of (body, kind, axis_local, anchor_local)
    dof_info = []
    if free_body >= 0:
        for k in range(3):
            dof_info.append(("free_lin", free_body, k))
        for k in range(3):
            dof_info.append(("free_ang", free_body, k))
    for n, bi in enumerate(t["j_body"]):
        dof_info.append(("hinge" if t["j_is_hinge"][n] > 0.5 else "slide", int(bi), n))

    # children lists for CRBA reverse pass
    children = {i: [] for i in range(nb)}
    for i in range(1, nb):
        children[parent[i]].append(i)

    # contact-basis bookkeeping (static): each foot body contributes 6 basis
    # rows (SA_xyz, SL_xyz) masked to its ancestor dofs
    foot_body_list = []
    for gi in model.foot_geoms:
        bi = model.geom_body[gi]
        if bi not in foot_body_list:
            foot_body_list.append(bi)
    bkeys = [(b, k) for b in foot_body_list for k in range(6)]
    key_idx = {k: i for i, k in enumerate(bkeys)}
    nk = len(bkeys)

    # contact slots: (body, corner_local (3,), mu, kind) static. Flat models:
    # 4 "flat" slots per geom (corner vs z=0 plane). Terrain models: 4
    # "floor" slots (corner vs floor plane, static z frame) — or "hfield"
    # slots (corner vs bilinear heightfield surface, tilted frame) when a
    # heightfield is enabled — then (box models) 4 "box" slots (corner vs
    # terrain-box SDF, tilted frame) per geom — mirroring
    # engine.slots_per_geom / detect_contacts.
    if hfield_shape is not None:
        floor_kind = "hfield"
    elif model.nterrain > 0:
        floor_kind = "floor"
    else:
        floor_kind = "flat"
    slots = []
    for gi in model.foot_geoms:
        bi = model.geom_body[gi]
        gpos = np.asarray(model.geom_pos)[gi]
        grot = _quat_to_mat_np(np.asarray(model.geom_quat)[gi])
        size = np.asarray(model.geom_size)[gi]
        mu = float(np.asarray(model.geom_friction)[gi])
        corner_locals = [
            (gpos + grot @ (corner * size)).astype(np.float32) for corner in eng._BOTTOM_CORNERS
        ]
        for local in corner_locals:
            slots.append((bi, local, mu, floor_kind))
        if model.nterrain > 0:
            for local in corner_locals:
                slots.append((bi, local, mu, "box"))
    nc = len(slots)

    def fk(qpos):
        """FK + rotation matrices for every body (twin of batched.fk_b)."""
        xpos = [jnp.zeros((3, *tb))]
        xquat = [jnp.concatenate([jnp.ones((1, *tb)), jnp.zeros((3, *tb))])]
        for i in range(1, nb):
            p = parent[i]
            bp = body_pos[i]
            x_pre = xpos[p] + _qrot(xquat[p], jnp.concatenate([_const(bp[0], tb), _const(bp[1], tb), _const(bp[2], tb)]))
            if np.allclose(body_quat[i], [1, 0, 0, 0]):
                q_pre = xquat[p]
            else:
                bq = body_quat[i]
                q_pre = _qmul(xquat[p], jnp.concatenate([_const(bq[0], tb), _const(bq[1], tb), _const(bq[2], tb), _const(bq[3], tb)]))
            jt = model.jnt_type[i]
            adr = model.body_qpos_adr[i]
            if jt == FREE:
                x = qpos[adr : adr + 3]
                q = _qnormalize(qpos[adr + 3 : adr + 7])
            elif jt == HINGE:
                half = 0.5 * qpos[adr : adr + 1]
                ax = jnt_axis[i]
                s = jnp.sin(half)
                qj = jnp.concatenate([jnp.cos(half), ax[0] * s, ax[1] * s, ax[2] * s])
                q = _qmul(q_pre, qj)
                if np.any(np.abs(jnt_pos[i]) > 1e-12):
                    a = jnt_pos[i]
                    al = jnp.concatenate([_const(a[0], tb), _const(a[1], tb), _const(a[2], tb)])
                    x = x_pre + _qrot(q_pre, al) - _qrot(q, al)
                else:
                    x = x_pre
            elif jt == SLIDE:
                q = q_pre
                ax = jnt_axis[i]
                x = x_pre + qpos[adr : adr + 1] * jnp.concatenate([_const(ax[0], tb), _const(ax[1], tb), _const(ax[2], tb)])
            else:
                q, x = q_pre, x_pre
            xpos.append(x)
            xquat.append(q)
        rmats = [None] + [_qmat(xquat[i]) for i in range(1, nb)]
        return xpos, xquat, rmats

    def motion_subspace(xpos, rmats):
        """Per-dof motion subspace S (6,TB) (twin of batched.motion_subspace_b)."""
        S = []
        for kind, bi, k in dof_info:
            if kind == "free_lin":
                rows = [jnp.zeros((1, *tb))] * 6
                rows[3 + k] = jnp.ones((1, *tb))
                S.append(jnp.concatenate(rows))
            elif kind == "free_ang":
                rot = rmats[bi]
                u = jnp.concatenate([rot[0][k : k + 1], rot[1][k : k + 1], rot[2][k : k + 1]])
                S.append(jnp.concatenate([u, _cross(xpos[bi], u)]))
            else:
                rot = rmats[bi]
                ax = jnt_axis[bi]
                u = jnp.concatenate(
                    [
                        ax[0] * rot[0][0:1] + ax[1] * rot[0][1:2] + ax[2] * rot[0][2:3],
                        ax[0] * rot[1][0:1] + ax[1] * rot[1][1:2] + ax[2] * rot[1][2:3],
                        ax[0] * rot[2][0:1] + ax[1] * rot[2][1:2] + ax[2] * rot[2][2:3],
                    ]
                )
                if kind == "hinge":
                    jp = jnt_pos[bi]
                    if np.any(np.abs(jp) > 1e-12):
                        anchor = xpos[bi] + jnp.concatenate(
                            [
                                jp[0] * rot[0][0:1] + jp[1] * rot[0][1:2] + jp[2] * rot[0][2:3],
                                jp[0] * rot[1][0:1] + jp[1] * rot[1][1:2] + jp[2] * rot[1][2:3],
                                jp[0] * rot[2][0:1] + jp[1] * rot[2][1:2] + jp[2] * rot[2][2:3],
                            ]
                        )
                    else:
                        anchor = xpos[bi]
                    S.append(jnp.concatenate([u, _cross(anchor, u)]))
                else:
                    S.append(jnp.concatenate([jnp.zeros((3, *tb)), u]))
        return S

    def body_velocities(S, qvel):
        """Per-body spatial velocity (world frame, about origin)."""
        cvel = [jnp.zeros((6, *tb))]
        for i in range(1, nb):
            v = cvel[parent[i]]
            adr, num = model.body_dof_adr[i], model.body_dof_num[i]
            for d in range(adr, adr + num):
                v = v + S[d] * qvel[d : d + 1]
            cvel.append(v)
        return cvel

    def fk_outputs(qpos, qvel):
        """Final-state FK caches the env boundary consumes: xpos (3nb,TB),
        xquat (4nb,TB), cvel (6nb,TB) — computed IN-kernel so the boundary
        does not pay an XLA-side FK rebuild (fusion-boundary HBM round trips
        on the sampling hot path)."""
        xpos, xquat, rmats = fk(qpos)
        S = motion_subspace(xpos, rmats)
        cvel = body_velocities(S, qvel)
        return (
            jnp.concatenate(xpos),
            jnp.concatenate(xquat),
            jnp.concatenate(cvel),
        )

    def substep(qpos, qvel, ctrl, ctx, cache=None):
        """One substep. cache=None recomputes the mass-matrix factorization
        + contact basis (refresh) and returns it; cache=(l_rows, basis,
        gram, lg_cols) reuses the LAGGED factorization while FK, S, cvel,
        bias forces and contact offsets/frames/impedance stay current — the
        reuse-interval scheme (twin of physics.batched.step_b's cache
        contract). Returns (qpos, qvel, extras, cache)."""
        # ---------------- FK ----------------
        xpos, xquat, rmats = fk(qpos)

        # ---------------- motion subspace S (per dof: (6,TB)) ----------------
        S = motion_subspace(xpos, rmats)

        # ---------------- body velocities ----------------
        cvel = body_velocities(S, qvel)

        # ---------------- spatial inertias (world, about origin) ----------------
        # I_b = [[Ibar, m cx],[m cx^T, m E]];  rows stored as list of 6 (6,TB)
        inertias = [None]  # world
        coms = [None]
        for i in range(1, nb):
            rot = rmats[i]
            # R_iq = R_i @ iquat_mat (constant): rows of combined rotation
            iq = iquat_mats[i]
            riq = [
                jnp.concatenate(
                    [
                        rot[r][0:1] * iq[0, c] + rot[r][1:2] * iq[1, c] + rot[r][2:3] * iq[2, c]
                        for c in range(3)
                    ]
                )
                for r in range(3)
            ]
            mass_scale = ctx["body_mass"][i : i + 1] / max(body_mass_np[i], 1e-9)
            diag = body_inertia[i]
            # I_com = riq diag riq^T  (3x3, symmetric)
            icom = [[None] * 3 for _ in range(3)]
            for r in range(3):
                for c in range(r, 3):
                    val = (
                        riq[r][0:1] * diag[0] * riq[c][0:1]
                        + riq[r][1:2] * diag[1] * riq[c][1:2]
                        + riq[r][2:3] * diag[2] * riq[c][2:3]
                    ) * mass_scale
                    icom[r][c] = val
                    icom[c][r] = val
            m_b = ctx["body_mass"][i : i + 1]
            com = xpos[i] + _matvec3(rot, ctx["body_ipos"][3 * i : 3 * i + 3])
            coms.append(com)
            cx, cy, cz = com[0:1], com[1:2], com[2:3]
            # Ibar = I_com - m cx cx  (cx = skew(c)); skew^2 = ccT - |c|^2 I
            c2 = cx * cx + cy * cy + cz * cz
            ib = [[None] * 3 for _ in range(3)]
            cvec = [cx, cy, cz]
            for r in range(3):
                for c in range(3):
                    ib[r][c] = icom[r][c] - m_b * (cvec[r] * cvec[c] - (c2 if r == c else 0.0))
            # assemble 6 rows: [Ibar | m*skew(c)] ; [m*skew(c)^T | m I]
            skew = [
                [0.0, -cz, cy],
                [cz, 0.0, -cx],
                [-cy, cx, 0.0],
            ]
            rows = []
            for r in range(3):
                row = [ib[r][0], ib[r][1], ib[r][2]]
                for c in range(3):
                    s = skew[r][c]
                    row.append(m_b * s if not isinstance(s, float) else jnp.zeros((1, *tb)))
                rows.append(jnp.concatenate(row))
            for r in range(3):
                row = []
                for c in range(3):
                    s = skew[c][r]  # transpose
                    row.append(m_b * s if not isinstance(s, float) else jnp.zeros((1, *tb)))
                for c in range(3):
                    row.append(m_b if r == c else jnp.zeros((1, *tb)))
                rows.append(jnp.concatenate(row))
            inertias.append(rows)  # list of 6 (6,TB) rows

        # ---------------- bias forces ----------------
        # a_i = a_parent + v_i x (S_d qd);  a_0 = -g
        g_block = jnp.concatenate(
            [jnp.zeros((3, *tb)), _const(-gravity[0], tb), _const(-gravity[1], tb), _const(-gravity[2], tb)]
        )
        acc = [g_block]
        for i in range(1, nb):
            p = parent[i]
            adr, num = model.body_dof_adr[i], model.body_dof_num[i]
            vj = jnp.zeros((6, *tb))
            for d in range(adr, adr + num):
                vj = vj + S[d] * qvel[d : d + 1]
            v = cvel[i]
            w, v0 = v[:3], v[3:]
            mw, mv = vj[:3], vj[3:]
            mc = jnp.concatenate([_cross(w, mw), _cross(w, mv) + _cross(v0, mw)])
            acc.append(acc[p] + mc)
        # f_i = I_i acc_i + v x* (I_i v); accumulate up the tree
        f_acc = [None] * nb
        for i in range(nb - 1, 0, -1):
            rows = inertias[i]
            ia = jnp.concatenate([_dot(rows[r], acc[i]) for r in range(6)])
            iv = jnp.concatenate([_dot(rows[r], cvel[i]) for r in range(6)])
            v = cvel[i]
            w, v0 = v[:3], v[3:]
            n_, fl = iv[:3], iv[3:]
            fc = jnp.concatenate([_cross(w, n_) + _cross(v0, fl), _cross(w, fl)])
            f = ia + fc
            for ch in children[i]:
                if ch != 0:
                    f = f + f_acc[ch]
            f_acc[i] = f
        qfrc_bias = [
            _dot(S[d], f_acc[model.dof_body[d]]) for d in range(nv)
        ]  # (1,TB) each

        # ---------------- smooth forces ----------------
        qfrc = []
        act_rows = []
        for a in range(nu):
            ca = ctrl[a : a + 1]
            if np.isfinite(ctrl_lo[a]):
                ca = jnp.maximum(ca, float(ctrl_lo[a]))
            if np.isfinite(ctrl_hi[a]):
                ca = jnp.minimum(ca, float(ctrl_hi[a]))
            act_rows.append(float(gear[a]) * ca)
        act_force = jnp.concatenate(act_rows)  # (nu,TB)
        act_of_dof = {int(model.actuator_dof[a]): a for a in range(nu)}
        # xfrc contribution per dof: sum over bodies in subtree... use J^T:
        # qfrc_xfrc[d] = S_d . (sum of spatial wrenches of bodies in subtree(d))
        wrench_acc = [None] * nb
        for i in range(nb - 1, 0, -1):
            xf = ctx["xfrc"][6 * i : 6 * i + 6]  # (force(3), torque(3))
            frc, trq = xf[:3], xf[3:]
            w6 = jnp.concatenate([_cross(xpos[i], frc) + trq, frc])
            for ch in children[i]:
                if ch != 0:
                    w6 = w6 + wrench_acc[ch]
            wrench_acc[i] = w6
        for d in range(nv):
            f = -qfrc_bias[d]
            f = f + _dot(S[d], wrench_acc[model.dof_body[d]])
            f = f - ctx["frictionloss"][d : d + 1] * jnp.tanh(qvel[d : d + 1] / 0.02)
            f = f - ctx["damping"][d : d + 1] * qvel[d : d + 1]
            if d in act_of_dof:
                f = f + act_force[act_of_dof[d] : act_of_dof[d] + 1]
            qfrc.append(f)
        qfrc = jnp.concatenate(qfrc)  # (nv,TB)

        # ---------------- refresh: M + Cholesky + contact basis ----------------
        # M(q), its Cholesky, the contact basis B, Y = L^-1 B and its Gram
        # all vary on the configuration timescale; when a cache is supplied
        # (reuse-interval substeps) they are REUSED from the last refresh.
        if cache is None:
            # CRBA: composite inertias + mass matrix
            comp = [None] * nb
            for i in range(nb - 1, 0, -1):
                rows = inertias[i]
                for ch in children[i]:
                    if ch == 0:
                        continue
                    rows = [rows[r] + comp[ch][r] for r in range(6)]
                comp[i] = rows
            # F_d = Ic_{body(d)} S_d ; M[d,e] = S_e . F_d for e ancestor-of-or-eq d
            m_rows = [[None] * nv for _ in range(nv)]
            for d in range(nv):
                bd = model.dof_body[d]
                rows = comp[bd]
                f_d = jnp.concatenate([_dot(rows[r], S[d]) for r in range(6)])  # (6,TB)
                for e in range(nv):
                    if anc[bd, e] > 0.5:  # e on the path to root
                        val = _dot(S[e], f_d)
                        m_rows[d][e] = val
                        m_rows[e][d] = val
            # Mh rows as (nv,TB) blocks (armature + implicit damping on diag)
            mh_rows = []
            for d in range(nv):
                row = []
                for e in range(nv):
                    v = m_rows[d][e]
                    if v is None:
                        v = jnp.zeros((1, *tb))
                    if d == e:
                        v = v + armature[d] + dt * ctx["damping"][d : d + 1]
                    row.append(v)
                mh_rows.append(jnp.concatenate(row))  # (nv, TB)
            l_rows = _chol_rows(mh_rows, nv, tb)

            # contact basis: the corner jacobian for dof d is
            # jp = S_lin - p x S_ang, so every contact row is a linear combo
            # (coefficients = corner coordinates, fresh every substep) of the
            # 6 body-level basis vectors masked to the foot's ancestor dofs
            basis = {}  # (body, k) -> (nv,TB); k indexes S rows: 0..2 ang, 3..5 lin
            for b in foot_body_list:
                for k in range(6):
                    rows = [
                        S[d][k : k + 1] if anc[b, d] > 0.5 else jnp.zeros((1, *tb))
                        for d in range(nv)
                    ]
                    basis[(b, k)] = jnp.concatenate(rows)

            # Y = L^-1 B (forward substitutions only) and Gram G = Y^T Y
            yb = {bk: _forward_rows(l_rows, blk, nv) for bk, blk in basis.items()}
            gram = {}
            for a_i, k1 in enumerate(bkeys):
                for k2 in bkeys[a_i:]:
                    g = _dot(yb[k1], yb[k2])
                    gram[(k1, k2)] = g
                    gram[(k2, k1)] = g
            g_rows = []
            for r_ in range(nk):
                row = []
                for c_ in range(nk):
                    v = gram[(bkeys[r_], bkeys[c_])]
                    if r_ == c_:
                        v = v + 1e-8  # G is SPD (independent basis rows through M^-1)
                    row.append(v)
                g_rows.append(jnp.concatenate(row))
            lg_cols = _chol_rows(g_rows, nk, tb)  # lower-tri columns, (nk,TB) each
            cache = (l_rows, basis, gram, lg_cols)
        l_rows, basis, gram, lg_cols = cache

        qacc_smooth = _cho_solve_rows(l_rows, qfrc, nv, tb)

        # ---------------- contacts ----------------
        nt = model.nterrain

        def frame_rows(n0, n1, n2):
            """(n, t1, t2) rows from a unit normal (engine.frame_from_normal):
            t1 horizontal."""
            h2 = n0 * n0 + n1 * n1
            h = jnp.sqrt(jnp.maximum(h2, 1e-12))
            horiz = h2 > 0.25
            t10 = jnp.where(horiz, -n1 / h, 1.0)
            t11 = jnp.where(horiz, n0 / h, 0.0)
            t12 = jnp.zeros((1, *tb))
            t20 = n1 * t12 - n2 * t11
            t21 = n2 * t10 - n0 * t12
            t22 = n0 * t11 - n1 * t10
            return ((n0, n1, n2), (t10, t11, t12), (t20, t21, t22))

        def hfield_sample(hf, u, v, hh, ww):
            """Bilinear tent-weight contraction (engine.hfield_query twin):
            row accumulators over W, then contract over H. Returns the five
            samples the central-difference normal needs, sharing the three
            row-accumulator sets (3*H*W + 5*H multiply-adds total)."""
            e = 0.25
            up = jnp.clip(u + e, 0.0, ww - 1.0)
            um = jnp.clip(u - e, 0.0, ww - 1.0)
            vp = jnp.clip(v + e, 0.0, hh - 1.0)
            vm = jnp.clip(v - e, 0.0, hh - 1.0)

            def wt(k, uu):
                return jnp.maximum(0.0, 1.0 - jnp.abs(float(k) - uu))

            racc_u, racc_up, racc_um = [], [], []
            for i in range(hh):
                a = a_p = a_m = None
                for j in range(ww):
                    g = hf[i * ww + j : i * ww + j + 1]
                    t0, t1_, t2_ = wt(j, u) * g, wt(j, up) * g, wt(j, um) * g
                    a = t0 if a is None else a + t0
                    a_p = t1_ if a_p is None else a_p + t1_
                    a_m = t2_ if a_m is None else a_m + t2_
                racc_u.append(a)
                racc_up.append(a_p)
                racc_um.append(a_m)
            h = hxp = hxm = hyp = hym = None
            for i in range(hh):
                wv, wvp, wvm = wt(i, v), wt(i, vp), wt(i, vm)
                h = wv * racc_u[i] if h is None else h + wv * racc_u[i]
                hxp = wv * racc_up[i] if hxp is None else hxp + wv * racc_up[i]
                hxm = wv * racc_um[i] if hxm is None else hxm + wv * racc_um[i]
                hyp = wvp * racc_u[i] if hyp is None else hyp + wvp * racc_u[i]
                hym = wvm * racc_u[i] if hym is None else hym + wvm * racc_u[i]
            return h, hxp, hxm, hyp, hym, (up - um), (vp - vm)

        cpos, cdist, cframes = [], [], []
        for bi, local, mu, kind in slots:
            p = xpos[bi] + _matvec_np_local(rmats[bi], local)
            cpos.append(p)
            if kind == "flat":
                cdist.append(p[2:3])  # flat floor at z=0
                cframes.append(None)  # static (z, x, y) frame
            elif kind == "floor":
                cdist.append(p[2:3] - ctx["floor_z"])
                cframes.append(None)  # static (z, x, y) frame
            elif kind == "hfield":
                # bilinear heightfield replaces the flat floor: vertical gap
                # to the surface scaled onto the local normal (engine
                # _foot_floor_contacts hfield path)
                hh, ww = hfield_shape
                hf = ctx["hfield"]  # (H*W, TB)
                x0 = ctx["hf_x0y0"][0:1]
                y0 = ctx["hf_x0y0"][1:2]
                cx = ctx["hf_cell"][0:1]
                cy = ctx["hf_cell"][1:2]
                u = jnp.clip((p[0:1] - x0) / cx, 0.0, ww - 1.0)
                v = jnp.clip((p[1:2] - y0) / cy, 0.0, hh - 1.0)
                h, hxp, hxm, hyp, hym, du, dv = hfield_sample(hf, u, v, hh, ww)
                # actual clip-shrunk span in the denominator, matching
                # engine.hfield_query (unbiased gradients at the grid edge)
                dh_dx = (hxp - hxm) / (du * cx)
                dh_dy = (hyp - hym) / (dv * cy)
                inv = 1.0 / jnp.sqrt(dh_dx * dh_dx + dh_dy * dh_dy + 1.0)
                n0, n1, n2 = -dh_dx * inv, -dh_dy * inv, inv
                gap = p[2:3] - (ctx["floor_z"] + h)
                cdist.append(gap * n2)
                cframes.append(frame_rows(n0, n1, n2))
            else:  # "box": terrain-box SDF (mirrors engine.terrain_contact)
                # among all penetrated boxes the shallowest penetration wins
                # and supplies the contact normal — side faces (risers)
                # collide; boxes resting on/below the floor are columns
                # (no bottom face).
                tpos = ctx["terrain_pos"]  # (3nt, TB)
                tsize = ctx["terrain_size"]  # (3nt, TB)
                tyaw_c = ctx["terrain_cos"]  # (nt, TB)
                tyaw_s = ctx["terrain_sin"]  # (nt, TB)
                px, py, pz = p[0:1], p[1:2], p[2:3]
                best = jnp.full((1, *tb), -1e9)
                bnx = jnp.zeros((1, *tb))
                bny = jnp.zeros((1, *tb))
                bnz = jnp.ones((1, *tb))
                for t_i in range(nt):
                    dx = px - tpos[3 * t_i : 3 * t_i + 1]
                    dy = py - tpos[3 * t_i + 1 : 3 * t_i + 2]
                    lz = pz - tpos[3 * t_i + 2 : 3 * t_i + 3]
                    c_ = tyaw_c[t_i : t_i + 1]
                    s_ = tyaw_s[t_i : t_i + 1]
                    lx = c_ * dx + s_ * dy
                    ly = -s_ * dx + c_ * dy
                    sx_half = tsize[3 * t_i : 3 * t_i + 1]
                    sy_half = tsize[3 * t_i + 1 : 3 * t_i + 2]
                    sz_half = tsize[3 * t_i + 2 : 3 * t_i + 3]
                    ex = jnp.abs(lx) - sx_half
                    ey = jnp.abs(ly) - sy_half
                    resting = (tpos[3 * t_i + 2 : 3 * t_i + 3] - sz_half) <= ctx["floor_z"] + 1e-4
                    ez = jnp.where(resting, lz - sz_half, jnp.abs(lz) - sz_half)
                    sgz = jnp.where(resting, 1.0, jnp.sign(lz))
                    inside = jnp.logical_and(jnp.logical_and(ex < 0.0, ey < 0.0), ez < 0.0)
                    # outward normal along the least-penetrated axis
                    pen = jnp.maximum(jnp.maximum(ex, ey), ez)
                    is_z = jnp.logical_and(ez >= ex, ez >= ey)
                    is_x = ex >= ey
                    sgx, sgy = jnp.sign(lx), jnp.sign(ly)
                    nx_i = jnp.where(is_z, 0.0, jnp.where(is_x, sgx * c_, -sgy * s_))
                    ny_i = jnp.where(is_z, 0.0, jnp.where(is_x, sgx * s_, sgy * c_))
                    nz_i = jnp.where(is_z, sgz, 0.0)
                    score = jnp.where(inside, pen, -1e9)
                    take = score > best
                    bnx = jnp.where(take, nx_i, bnx)
                    bny = jnp.where(take, ny_i, bny)
                    bnz = jnp.where(take, nz_i, bnz)
                    best = jnp.maximum(score, best)
                any_pen = best > -1e8
                cdist.append(jnp.where(any_pen, best, 1e3))
                n0 = jnp.where(any_pen, bnx, 0.0)
                n1 = jnp.where(any_pen, bny, 0.0)
                n2 = jnp.where(any_pen, bnz, 1.0)
                # tangent frame (engine.frame_from_normal): t1 horizontal
                h2 = n0 * n0 + n1 * n1
                h = jnp.sqrt(jnp.maximum(h2, 1e-12))
                horiz = h2 > 0.25
                t10 = jnp.where(horiz, -n1 / h, 1.0)
                t11 = jnp.where(horiz, n0 / h, 0.0)
                t12 = jnp.zeros((1, *tb))
                # t2 = n x t1
                t20 = n1 * t12 - n2 * t11
                t21 = n2 * t10 - n0 * t12
                t22 = n0 * t11 - n1 * t10
                cframes.append(((n0, n1, n2), (t10, t11, t12), (t20, t21, t22)))
        cmask = [jnp.where(d < eng.CONTACT_MARGIN, 1.0, 0.0) for d in cdist]

        # Contact jacobians via the per-foot-body BASIS (cached above): A =
        # Jc M^-1 Jc^T = (C B) M^-1 (C B)^T = C (Y^T Y) C^T with Y = L^-1 B,
        # needing only 6 FORWARD substitutions per foot (12 total, at
        # refresh) plus the 12x12 Gram, instead of 3*nc=24 full (fwd+bwd)
        # M-solves — the dominant cost of the kernel in round 1
        # (PERFORMANCE.md ladder). The coefficient rows C (corner
        # coordinates + contact frames) are rebuilt fresh every substep.
        def slot_coeffs_static(bi, p):
            """Flat-floor fast path: 3-term basis expansion of the contact
            rows for the static (z, x, y) frame.
            cross(p, sa) = (py*saz - pz*say, pz*sax - px*saz, px*say - py*sax)."""
            px, py, pz = p[0:1], p[1:2], p[2:3]
            return (
                (((bi, 5), 1.0), ((bi, 1), -px), ((bi, 0), py)),   # z row
                (((bi, 3), 1.0), ((bi, 2), -py), ((bi, 1), pz)),   # x row
                (((bi, 4), 1.0), ((bi, 0), -pz), ((bi, 2), px)),   # y row
            )

        def slot_coeffs_frame(bi, p, e):
            """General frame direction e: row = e . S_lin - (e x p) . S_ang,
            a 6-term basis expansion (keys 0..2 = SA_xyz, 3..5 = SL_xyz)."""
            px, py, pz = p[0:1], p[1:2], p[2:3]
            e0, e1, e2 = e
            exp0 = e1 * pz - e2 * py
            exp1 = e2 * px - e0 * pz
            exp2 = e0 * py - e1 * px
            return (
                ((bi, 3), e0), ((bi, 4), e1), ((bi, 5), e2),
                ((bi, 0), -exp0), ((bi, 1), -exp1), ((bi, 2), -exp2),
            )

        coeffs = []  # flat list over 3*nc contact rows
        for (bi, local, mu, kind), p, frame in zip(slots, cpos, cframes):
            if frame is None:
                coeffs.extend(slot_coeffs_static(bi, p))
            else:
                for e in frame:
                    coeffs.append(slot_coeffs_frame(bi, p, e))

        def combo_diag(ci):
            out = None
            for key_i, w_i in ci:
                for key_j, w_j in ci:
                    term = w_i * w_j * gram[(key_i, key_j)]
                    out = term if out is None else out + term
            return out

        # contact-row dots with qvel / qacc_smooth through the basis
        u_vel = {bk: _dot(blk, qvel) for bk, blk in basis.items()}
        u_acc = {bk: _dot(blk, qacc_smooth) for bk, blk in basis.items()}

        def row_dot(ci, u):
            out = None
            for key_i, w_i in ci:
                term = w_i * u[key_i]
                out = term if out is None else out + term
            return out

        # aref + regularization; D = mask * r_diag + (1 - mask)
        n3 = 3 * nc
        b_list, d_list, mask3 = [], [], []
        for c in range(nc):
            pen = jnp.minimum(cdist[c], 0.0)
            imp = imp_min + (imp_max - imp_min) * jnp.clip(-pen / width, 0.0, 1.0)
            for f in range(3):
                vel = row_dot(coeffs[3 * c + f], u_vel)
                aref = -b_ref * vel
                if f == 0:
                    aref = aref - k_ref * imp * pen
                a0 = row_dot(coeffs[3 * c + f], u_acc)
                a_diag = combo_diag(coeffs[3 * c + f])
                r_diag = (1.0 - imp) / jnp.maximum(imp, 1e-6) * jnp.maximum(a_diag, 1e-8)
                b_list.append((aref - a0) * cmask[c])
                d_list.append(cmask[c] * r_diag + (1.0 - cmask[c]))
                mask3.append(cmask[c])

        # --- Woodbury contact solve ---------------------------------------
        # The masked system is A = Cm G Cm^T + D, with Cm the mask-scaled
        # (n3 x 12) basis-coefficient matrix (block-diagonal per foot) and
        # G the 12x12 basis Gram — rank(A - D) <= 12 regardless of the
        # number of contact slots. With LG = chol(G) and Chat = Cm LG:
        #   A^-1 r = D^-1 r - D^-1 Chat (I + Chat^T D^-1 Chat)^-1 Chat^T D^-1 r
        # so the exact solve runs through a 12x12 inner Cholesky instead of
        # forming/factoring the dense (3nc)^2 matrix. At 16 terrain contact
        # slots the dense A + its factor alone (~18 MB of (1,8,128) blocks)
        # blow the 16 MB VMEM scope; this keeps the full (8,128) tile AND
        # cuts the contact-solve op count ~3x.
        # Chat[i][k] = mask_i * sum_m w_m LG[idx(m), k]; LG[r,k] = lg_cols[k][r].
        # Rows only touch their own foot's 6 basis keys -> block sparsity.
        chat = []
        for i in range(n3):
            row = []
            for k in range(nk):
                acc = None
                for key_m, w_m in coeffs[i]:
                    r_ = key_idx[key_m]
                    if r_ < k:
                        continue  # LG structurally zero above the diagonal
                    term = w_m * lg_cols[k][r_ : r_ + 1]
                    acc = term if acc is None else acc + term
                row.append(None if acc is None else acc * mask3[i])
            chat.append(row)

        dinv = [1.0 / d for d in d_list]

        # K = I + Chat^T D^-1 Chat
        k_rows_m = [[None] * nk for _ in range(nk)]
        for a_ in range(nk):
            for b_ in range(a_, nk):
                acc = None
                for i in range(n3):
                    ca, cb = chat[i][a_], chat[i][b_]
                    if ca is None or cb is None:
                        continue
                    term = ca * cb * dinv[i]
                    acc = term if acc is None else acc + term
                if acc is None:
                    acc = jnp.zeros((1, *tb))
                if a_ == b_:
                    acc = acc + 1.0
                k_rows_m[a_][b_] = acc
                k_rows_m[b_][a_] = acc
        lk_cols = _chol_rows([jnp.concatenate(k_rows_m[a_]) for a_ in range(nk)], nk, tb)

        def apply_ainv(rv):
            """(n3,TB) -> (n3,TB): exact A^-1 via the Woodbury identity."""
            u = [rv[i : i + 1] * dinv[i] for i in range(n3)]
            v = []
            for k in range(nk):
                acc = None
                for i in range(n3):
                    if chat[i][k] is None:
                        continue
                    term = chat[i][k] * u[i]
                    acc = term if acc is None else acc + term
                v.append(acc if acc is not None else jnp.zeros((1, *tb)))
            w = _cho_solve_rows(lk_cols, jnp.concatenate(v), nk, tb)
            outs = []
            for i in range(n3):
                acc = None
                for k in range(nk):
                    if chat[i][k] is None:
                        continue
                    term = chat[i][k] * w[k : k + 1]
                    acc = term if acc is None else acc + term
                outs.append(u[i] if acc is None else u[i] - dinv[i] * acc)
            return jnp.concatenate(outs)

        def apply_a(fv):
            """(n3,TB) -> (n3,TB): A f = Chat (Chat^T f) + D f."""
            t_ = []
            for k in range(nk):
                acc = None
                for i in range(n3):
                    if chat[i][k] is None:
                        continue
                    term = chat[i][k] * fv[i : i + 1]
                    acc = term if acc is None else acc + term
                t_.append(acc)
            outs = []
            for i in range(n3):
                acc = d_list[i] * fv[i : i + 1]
                for k in range(nk):
                    if chat[i][k] is None or t_[k] is None:
                        continue
                    acc = acc + chat[i][k] * t_[k]
                outs.append(acc)
            return jnp.concatenate(outs)

        b_vec = jnp.concatenate(b_list)  # (n3,TB)

        mus = np.asarray([s[2] for s in slots], dtype=np.float32)

        def project(fv):
            outs = []
            for c in range(nc):
                fn = jnp.maximum(fv[3 * c : 3 * c + 1], 0.0)
                ft1 = fv[3 * c + 1 : 3 * c + 2]
                ft2 = fv[3 * c + 2 : 3 * c + 3]
                ftn = jnp.sqrt(ft1 * ft1 + ft2 * ft2) + 1e-9
                scale = jnp.minimum(1.0, mus[c] * fn / ftn)
                outs.extend([fn * cmask[c], ft1 * scale * cmask[c], ft2 * scale * cmask[c]])
            return jnp.concatenate(outs)

        fvec = project(apply_ainv(b_vec))
        for _ in range(PROJ_REFINE_ITERS - 1):
            r = b_vec - apply_a(fvec)
            fvec = project(fvec + apply_ainv(r))

        # qfrc_con = Jc^T f = B^T w with w_k = sum_i coeff_ik f_i (12 basis
        # accumulators instead of 24 (nv,TB) jacobian rows)
        w_basis = {bk: None for bk in bkeys}
        for i in range(3 * nc):
            fi = fvec[i : i + 1]
            for key_i, w_i in coeffs[i]:
                term = w_i * fi
                w_basis[key_i] = term if w_basis[key_i] is None else w_basis[key_i] + term
        qfrc_con = jnp.zeros((nv, *tb))
        for bk in bkeys:
            if w_basis[bk] is not None:
                qfrc_con = qfrc_con + basis[bk] * w_basis[bk]
        qacc = qacc_smooth + _cho_solve_rows(l_rows, qfrc_con, nv, tb)

        # ---------------- integrate ----------------
        # runaway guard (see engine.step): clamp far above physical speeds
        qvel_new = jnp.clip(qvel + dt * qacc, -1e4, 1e4)
        parts = []
        pos_done = 0
        if free_body >= 0:
            qadr, dadr = model.body_qpos_adr[free_body], model.body_dof_adr[free_body]
            pos = qpos[qadr : qadr + 3] + dt * qvel_new[dadr : dadr + 3]
            omega = qvel_new[dadr + 3 : dadr + 6]
            angle = jnp.sqrt(jnp.sum(omega * omega, axis=0, keepdims=True)) * dt
            half = 0.5 * angle
            s = 0.5 * dt * jnp.sinc(half / jnp.pi)
            dq = jnp.concatenate([jnp.cos(half), s * omega])
            quat = _qnormalize(_qmul(qpos[qadr + 3 : qadr + 7], dq))
            parts.append(pos)
            parts.append(quat)
            pos_done = qadr + 7
        # 1-dof joints (contiguous after free block)
        if t["j_qpos"].size:
            jq0 = int(t["j_qpos"][0])
            jd0 = int(t["j_dof"][0])
            njq = len(t["j_qpos"])
            parts.append(qpos[jq0 : jq0 + njq] + dt * qvel_new[jd0 : jd0 + njq])
        qpos_new = jnp.concatenate(parts)

        z_normal = [jnp.zeros((1, *tb)), jnp.zeros((1, *tb)), jnp.ones((1, *tb))]
        cnormal = jnp.concatenate(
            [
                jnp.concatenate(z_normal if fr is None else list(fr[0]))
                for fr in cframes
            ]
        )
        extras = dict(
            qacc=qacc,
            act_torque=act_force,
            cdist=jnp.concatenate(cdist),
            cmask=jnp.concatenate(cmask),
            cforce=fvec,
            cpos_z=jnp.concatenate([p[2:3] for p in cpos]),
            cpos=jnp.concatenate(cpos),
            cnormal=cnormal,
        )
        return qpos_new, qvel_new, extras, cache

    return substep, nc, fk_outputs


def _matvec_np_local(rot_rows, local: np.ndarray):
    """R @ constant local vector."""
    return jnp.concatenate(
        [
            rot_rows[0][0:1] * local[0] + rot_rows[0][1:2] * local[1] + rot_rows[0][2:3] * local[2],
            rot_rows[1][0:1] * local[0] + rot_rows[1][1:2] * local[1] + rot_rows[1][2:3] * local[2],
            rot_rows[2][0:1] * local[0] + rot_rows[2][1:2] * local[1] + rot_rows[2][2:3] * local[2],
        ]
    )


def _chol_rows(m_rows, n, tb):
    """Cholesky factor on the row-block representation.

    m_rows: list of n (n,TB) rows. Returns l_cols — list of n (n,TB) column
    blocks of L.

    Outer-product form: per column j, col = R[:, j] (masked to rows >= j) / d,
    then rank-1 downdate of the remaining rows. In this storage a "column"
    and a "row" of the same vector are the identical (n,TB) array, so the
    rank-1 update of row i is `r[i] -= col[i] * col`.
    """
    r = list(m_rows)
    l_cols = []
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(r[j][j : j + 1], 1e-12))
        parts = ([jnp.zeros((j, *tb))] if j else []) + [r[i][j : j + 1] for i in range(j, n)]
        col = jnp.concatenate(parts) / d
        for i in range(j + 1, n):
            r[i] = r[i] - col[i : i + 1] * col
        l_cols.append(col)
    return l_cols


def _chol_solve_rows(m_rows, b, n, tb):
    """Cholesky + solve on the row-block representation (see _chol_rows)."""
    l_cols = _chol_rows(m_rows, n, tb)
    return l_cols, _cho_solve_rows(l_cols, b, n, tb)


def _forward_rows(l_cols, b, n):
    """Forward substitution only: solve L y = b given column list l_cols."""
    r = b
    ys = []
    for j in range(n):
        yj = r[j : j + 1] / l_cols[j][j : j + 1]
        ys.append(yj)
        r = r - l_cols[j] * yj
    return jnp.concatenate(ys)


def _cho_solve_rows(l_cols, b, n, tb):
    """Solve L L^T x = b given column list l_cols (each (n,TB))."""
    # forward: L y = b
    r = b
    ys = []
    for j in range(n):
        yj = r[j : j + 1] / l_cols[j][j : j + 1]
        ys.append(yj)
        r = r - l_cols[j] * yj
    y = jnp.concatenate(ys)
    # backward: L^T x = y ; (L^T)[i,:] has entries l_cols[:][i]... row i of L^T = column i of L
    xs = [None] * n
    r = y
    for j in range(n - 1, -1, -1):
        # row j of L^T is l_cols[j] transposed? (L^T)[j, i] = L[i, j] = l_cols[j][i]
        xj = r[j : j + 1] / l_cols[j][j : j + 1]
        xs[j] = xj
        # subtract column j of L^T = row j of L = [l_cols[k][j] for k]
        lrow = jnp.concatenate([l_cols[k][j : j + 1] for k in range(n)])
        r = r - lrow * xj
    return jnp.concatenate(xs)


# ---------------------------------------------------------------------------
# learned motor-dynamics hook (robots/motor.py inside the kernel)
# ---------------------------------------------------------------------------


def _motor_param_blocks(params: dict) -> list[np.ndarray]:
    """Flatten the stacked per-joint MLP params (robots/motor.py) into the
    2D blocks the kernel takes as (non-batched) inputs, in ref order:
    w0 (nu*d0, h0), b0 (nu, h0), w1 (nu*h0, h1), b1 (nu, h1), ...,
    skip (nu, 1). The weights are frozen at env construction (the reference
    loads pretrained TorchScript nets; ours come from init/npz) but pallas
    does not allow captured array constants, so they ride as inputs with a
    grid-constant index map — a few hundred KB of VMEM."""
    n_layers = int(params["n_layers"])
    blocks = []
    for li in range(n_layers):
        w = np.asarray(params[f"w{li}"], np.float32)  # (nu, di, do)
        blocks.append(w.reshape(-1, w.shape[2]))
        blocks.append(np.asarray(params[f"b{li}"], np.float32))  # (nu, do)
    blocks.append(np.asarray(params["skip"], np.float32).reshape(-1, 1))  # (nu, 1)
    return blocks


def _build_motor_apply(params: dict, nu: int, hist_len: int):
    """In-kernel twin of robots.motor.motor_substep_torque_b
    (robot_interface.py:25-58 warmup/2-substep cadence, :510-533 hook).

    Returns apply(prefs, qd_h, ct_h, cnt, v, tau) where prefs are the
    param refs in _motor_param_blocks order. Each per-joint layer matmul is
    do broadcast-multiply row reductions over the joint's contiguous
    (di, sub, lanes) activation block — ~nu*(h1+h2+1) vector ops per
    substep instead of a full scalar unroll.

    History layout: JOINT-MAJOR rows — qd_hist/ct_hist are (nu*H, sub,
    lanes) blocks with row n*H+h = joint n, history slot h (oldest first,
    newest last), so each joint's MLP input is a contiguous row slice (the
    leading block dim is untiled in Mosaic — free slicing). The substep
    counter rides as an f32 (1, sub, lanes) block (exact for any episode
    length this framework runs).
    """
    H = hist_len
    n_layers = int(params["n_layers"])
    dims = [np.asarray(params[f"w{li}"], np.float32).shape for li in range(n_layers)]
    assert dims[0][1] == 2 * H and dims[0][0] == nu, dims

    def apply(prefs, qd_h, ct_h, cnt, v, tau):
        warm = cnt < float(H)  # (1, sub, lanes)
        even = (cnt - 2.0 * jnp.floor(cnt * 0.5)) < 0.5
        update = jnp.logical_or(warm, even)

        def push(hist, new):
            parts = []
            for n in range(nu):
                parts.append(hist[n * H + 1 : (n + 1) * H])
                parts.append(new[n : n + 1])
            return jnp.where(update, jnp.concatenate(parts), hist)

        qd_h = push(qd_h, v)
        ct_h = push(ct_h, tau)

        Ws = [prefs[2 * li][:] for li in range(n_layers)]  # (nu*di, do)
        Bs = [prefs[2 * li + 1][:] for li in range(n_layers)]  # (nu, do)
        skip = prefs[2 * n_layers][:]  # (nu, 1)

        outs = []
        for n in range(nu):
            x = jnp.concatenate([qd_h[n * H : (n + 1) * H], ct_h[n * H : (n + 1) * H]])
            for li in range(n_layers):
                di, do = dims[li][1], dims[li][2]
                wn = Ws[li][n * di : (n + 1) * di]  # (di, do)
                bn = Bs[li][n : n + 1]  # (1, do)
                # NB: slice and expand_dims stay separate ops — a basic index
                # mixing `o:o+1` with None lowers through lax.gather, which
                # Mosaic rejects inside the kernel
                cols = [
                    jnp.sum(x * jnp.expand_dims(wn[:, o : o + 1], -1), axis=0, keepdims=True)
                    + jnp.expand_dims(bn[:, o : o + 1], -1)
                    for o in range(do)
                ]
                x = jnp.concatenate(cols) if len(cols) > 1 else cols[0]
                if li < n_layers - 1:
                    x = jnp.tanh(x)
            outs.append(
                jnp.expand_dims(skip[n : n + 1], -1) * ct_h[(n + 1) * H - 1 : (n + 1) * H] + x[0:1]
            )
        act = jnp.where(warm, tau, jnp.concatenate(outs))
        return act, qd_h, ct_h, cnt + 1.0

    return apply


# ---------------------------------------------------------------------------
# pallas_call wrapper + env boundary
# ---------------------------------------------------------------------------


def make_control_step(model: Model, frame_skip: int, dt: float, tb=(8, 256), interpret: bool = False, hfield_shape=None, reuse: int = 1, motor: dict | None = None):
    """Build fn(qpos (nq,B), qvel (nv,B), target (nu,B), ctx blocks...) ->
    (qpos, qvel, qacc, act_torque, cforce (3nc,B), cdist (nc,B), cmask (nc,B),
    cpos (3nc,B)) running `frame_skip` substeps in one pallas kernel.

    `tb` = (sublanes, lanes): each block covers sublanes*lanes envs, so the
    per-env "scalar" (1, sub, lanes) ops use ALL 8 VPU sublanes instead of
    1/8 of a (1, lanes) vector register — the round-1 layout left 7/8 of the
    VPU idle on every scalar op.

    `reuse` = factorization-reuse interval R (must divide frame_skip): the
    mass-matrix Cholesky + contact basis/Gram are recomputed every R substeps
    and reused in between (M(q) varies on the 40 Hz configuration timescale,
    not the 1 kHz substep timescale). R=1 is exact.

    `motor` = optional motor-dynamics param dict (robots/motor.py): adds
    (qd_hist (nu*H,B), ct_hist (nu*H,B), count (1,B)) inputs + the updated
    triple as outputs, and routes every substep's PD torque through the
    learned per-joint nets (frozen weights ride as grid-constant VMEM
    inputs — pallas forbids captured array constants)."""
    sub, lanes = tb
    if reuse < 1 or frame_skip % reuse != 0:
        raise ValueError(f"reuse={reuse} must divide frame_skip={frame_skip}")
    substep, nc, fk_outputs = _build_substep(model, dt, tb, hfield_shape=hfield_shape)
    nq, nv, nu, nb = model.nq, model.nv, model.nu, model.nbody
    t = _tables(model)
    aq0 = int(np.asarray(model.actuator_qpos)[0]) if nu else 0
    ad0 = int(np.asarray(model.actuator_dof)[0]) if nu else 0
    gear = np.asarray(model.actuator_gear)

    nt = model.nterrain
    has_hf = hfield_shape is not None
    hist_len = int(np.asarray(motor["w0"]).shape[1]) // 2 if motor is not None else 0
    motor_apply = _build_motor_apply(motor, nu, hist_len) if motor is not None else None

    def kernel(*refs):
        (qpos_ref, qvel_ref, target_ref, kp_ref, kd_ref, bemf_ref,
         damping_ref, frictionloss_ref, body_mass_ref, body_ipos_ref, xfrc_ref) = refs[:11]
        ctx = dict(
            damping=damping_ref[:],
            frictionloss=frictionloss_ref[:],
            body_mass=body_mass_ref[:],
            body_ipos=body_ipos_ref[:],
            xfrc=xfrc_ref[:],
        )
        idx = 11
        if has_hf:
            ctx.update(
                hfield=refs[idx][:],
                hf_x0y0=refs[idx + 1][:],
                hf_cell=refs[idx + 2][:],
            )
            idx += 3
        if nt > 0:
            ctx.update(
                terrain_pos=refs[idx][:],
                terrain_size=refs[idx + 1][:],
                terrain_cos=refs[idx + 2][:],
                terrain_sin=refs[idx + 3][:],
            )
            idx += 4
        if has_hf or nt > 0:
            ctx["floor_z"] = refs[idx][:]
            idx += 1
        if motor_apply is not None:
            qd_ref, ct_ref, cnt_ref = refs[idx : idx + 3]
            idx += 3
            n_prefs = 2 * int(np.asarray(motor["n_layers"])) + 1
            motor_prefs = refs[idx : idx + n_prefs]
            idx += n_prefs
        outs = refs[idx:]
        (qpos_out, qvel_out, qacc_out, act_out, cforce_out, cdist_out, cmask_out, cpos_out, cnormal_out,
         xpos_out, xquat_out, cvel_out) = outs[:12]
        target = target_ref[:]
        kp, kd, bemf = kp_ref[:], kd_ref[:], bemf_ref[:]

        def one(carry, cache):
            if motor_apply is None:
                qpos, qvel = carry
            else:
                qpos, qvel, qd_h, ct_h, cnt = carry
            q = qpos[aq0 : aq0 + nu]
            v = qvel[ad0 : ad0 + nu]
            tau = kp * (target - q) - kd * v - bemf * v
            if motor_apply is not None:
                tau, qd_h, ct_h, cnt = motor_apply(motor_prefs, qd_h, ct_h, cnt, v, tau)
            ctrl = jnp.concatenate([tau[a : a + 1] / float(gear[a]) for a in range(nu)])
            qpos, qvel, extras, cache = substep(qpos, qvel, ctrl, ctx, cache)
            st = (qpos, qvel) if motor_apply is None else (qpos, qvel, qd_h, ct_h, cnt)
            return st, extras, cache

        # Nested fori_loops keep kernel code size at TWO substep
        # instantiations (refresh + cached); extras from the last iteration
        # are what observations/rewards consume. Substep 0 of each group
        # refreshes the factorization; the next reuse-1 substeps run against
        # the lagged cache (closure of the inner loop — loop-invariant).
        def group(o, carry):
            st, _ = carry
            st, extras, cache = one(st, None)
            if reuse > 1:
                def inner(j, c2):
                    st2, _ = c2
                    st2, ex, _ = one(st2, cache)
                    return (st2, ex)

                st, extras = jax.lax.fori_loop(0, reuse - 1, inner, (st, extras))
            return (st, extras)

        init_extras = dict(
            qacc=jnp.zeros((nv, *tb)),
            act_torque=jnp.zeros((nu, *tb)),
            cdist=jnp.full((nc, *tb), 1e3),
            cmask=jnp.zeros((nc, *tb)),
            cforce=jnp.zeros((3 * nc, *tb)),
            cpos_z=jnp.zeros((nc, *tb)),
            cpos=jnp.zeros((3 * nc, *tb)),
            cnormal=jnp.zeros((3 * nc, *tb)),
        )
        st0 = (qpos_ref[:], qvel_ref[:])
        if motor_apply is not None:
            st0 = st0 + (qd_ref[:], ct_ref[:], cnt_ref[:])
        st, extras = jax.lax.fori_loop(0, frame_skip // reuse, group, (st0, init_extras))
        qpos, qvel = st[0], st[1]
        if motor_apply is not None:
            outs[12][:] = st[2]
            outs[13][:] = st[3]
            outs[14][:] = st[4]
        qpos_out[:] = qpos
        qvel_out[:] = qvel
        xp, xq, cv = fk_outputs(qpos, qvel)
        xpos_out[:] = xp
        xquat_out[:] = xq
        cvel_out[:] = cv
        qacc_out[:] = extras["qacc"]
        act_out[:] = extras["act_torque"]
        cforce_out[:] = extras["cforce"]
        cdist_out[:] = extras["cdist"]
        cmask_out[:] = extras["cmask"]
        cpos_out[:] = extras["cpos"]
        cnormal_out[:] = extras["cnormal"]

    def run(qpos, qvel, target, kp, kd, bemf, damping, frictionloss, body_mass, body_ipos, xfrc, terrain=None, hfield=None, floor_z=None, motor_hist=None):
        batch = qpos.shape[1]
        ns = batch // lanes  # sublane-batch rows; env e = ns_row * lanes + lane
        grid = (ns // sub,)

        def fold(x):
            return x.reshape(x.shape[0], ns, lanes)

        def spec(rows):
            return pl.BlockSpec((rows, sub, lanes), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

        in_specs = [
            spec(nq), spec(nv), spec(nu), spec(nu), spec(nu), spec(nu),
            spec(nv), spec(nv), spec(nb), spec(3 * nb), spec(6 * nb),
        ]
        args = [qpos, qvel, target, kp, kd, bemf, damping, frictionloss, body_mass, body_ipos, xfrc]
        if has_hf:
            # hfield: (grid (H*W,B), x0y0 (2,B), cell (2,B))
            hh, ww = hfield_shape
            in_specs += [spec(hh * ww), spec(2), spec(2)]
            args += list(hfield)
        if nt > 0:
            # terrain boxes: (tpos (3nt,B), tsize (3nt,B), cos(yaw) (nt,B),
            # sin(yaw) (nt,B))
            in_specs += [spec(3 * nt), spec(3 * nt), spec(nt), spec(nt)]
            args += list(terrain)
        if has_hf or nt > 0:
            in_specs += [spec(1)]
            args += [floor_z]
        if motor_apply is not None:
            # (qd_hist (nu*H,B), ct_hist (nu*H,B), count (1,B)) — joint-major
            in_specs += [spec(nu * hist_len), spec(nu * hist_len), spec(1)]
            args += list(motor_hist)
        args = [fold(a) for a in args]
        if motor_apply is not None:
            # frozen MLP params: 2D grid-constant blocks, not folded
            for blk in _motor_param_blocks(motor):
                in_specs.append(
                    pl.BlockSpec(blk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                )
                args.append(jnp.asarray(blk))

        out_rows = [nq, nv, nv, nu, 3 * nc, nc, nc, 3 * nc, 3 * nc, 3 * nb, 4 * nb, 6 * nb]
        if motor_apply is not None:
            out_rows += [nu * hist_len, nu * hist_len, 1]
        out_shapes = [jax.ShapeDtypeStruct((r, ns, lanes), jnp.float32) for r in out_rows]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[spec(r) for r in out_rows],
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)
        return tuple(o.reshape(o.shape[0], batch) for o in outs)

    return run, nc


# ---------------------------------------------------------------------------
# PhysicsState boundary (drop-in for physics.batched.pd_substeps_batched)
# ---------------------------------------------------------------------------

_KERNEL_CACHE: dict = {}


def kernel_tile(batch: int, prefer: int = 128) -> tuple[int, int] | None:
    """Largest viable (sublanes, lanes) tile for this batch (None if
    incompatible). Full 8-sublane tiles whenever the batch allows; lanes stay
    at 128 because the (8, 256) working set (~20 MB) exceeds the 16 MB scoped
    VMEM limit. (The Woodbury contact solve keeps even the 16-slot terrain
    models inside the (8, 128) VMEM budget.)"""
    for sub in (8, 4, 2, 1):
        for lanes in (prefer, 256):
            if batch % (sub * lanes) == 0:
                return (sub, lanes)
    if batch <= 128:  # tiny batches (tests, probes): single-tile grid
        return (1, batch)
    return None


def pd_substeps_kernel(model, params, physics, target, frame_skip, sim_dt, terrain=None, settle=False, reuse_interval=1, motor=None):
    """Same contract as physics.batched.pd_substeps_batched, physics fused
    into one pallas launch per control step. `terrain` is a leading-batch
    engine.Terrain (required when model.nterrain > 0).

    settle=True runs zero-torque substeps (reset settling) by zeroing the PD
    gains — same kernel, no extra compilation.

    reuse_interval R: recompute the mass-matrix factorization + contact
    basis only every R substeps (must divide frame_skip; anything else falls
    back to 1 = exact semantics). Twin of pd_substeps_batched's knob.

    motor: optional (motor_params, MotorState-leading-batch) pair — the
    learned motor-dynamics hook runs INSIDE the fused kernel (weights baked
    as constants, history carried through the substep loop) and the return
    value becomes (PhysicsState, MotorState), exactly like
    pd_substeps_batched(motor=...). Motor kernels pin R=1 (the carried
    history blocks already add ~2.4 MB to the VMEM working set).
    """
    from learninghumanoidwalking_tpu.physics import batched
    from learninghumanoidwalking_tpu.physics.model import Contact, PhysicsState

    batch = physics.qpos.shape[0]
    tb = kernel_tile(batch)
    has_hf = terrain is not None and terrain.hfield is not None
    hf_shape = tuple(int(d) for d in terrain.hfield.shape[1:]) if has_hf else None
    reuse = int(reuse_interval or 1)
    if reuse < 1 or frame_skip % reuse != 0:
        reuse = 1
    if model.nterrain > 0 or has_hf:
        # terrain/hfield kernels already run near the 16 MB VMEM scope
        # (Woodbury note in _build_substep); carrying the reuse cache through
        # the inner loop overflows it (measured 18.5 MB at R=5 on jvrc_step)
        reuse = 1
    motor_params = mstate = None
    if motor is not None:
        motor_params, mstate = motor
        reuse = 1
    key = (id(model), frame_skip, float(sim_dt), tb, hf_shape, reuse,
           id(motor_params) if motor_params is not None else None)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make_control_step(
            model, frame_skip, sim_dt, tb=tb, hfield_shape=hf_shape, reuse=reuse,
            motor={k: np.asarray(v) for k, v in motor_params.items()} if motor_params is not None else None,
        )
    run, nc = _KERNEL_CACHE[key]

    params_t = batched._params_to_trailing(params)
    zeros_u = jnp.zeros((model.nu, batch))
    kp = zeros_u if settle else params_t.kp
    kd = zeros_u if settle else params_t.kd
    bemf = zeros_u if settle else params_t.bemf_gain

    terrain_blocks, hfield_blocks, floor_z = None, None, None
    if model.nterrain > 0:
        # leading-batch Terrain -> (3nt,B), (3nt,B), cos/sin (nt,B)
        tpos = jnp.transpose(terrain.pos, (1, 2, 0)).reshape(-1, batch)
        tsize = jnp.transpose(terrain.size, (1, 2, 0)).reshape(-1, batch)
        yaw = jnp.swapaxes(terrain.yaw, 0, 1)
        terrain_blocks = (tpos, tsize, jnp.cos(yaw), jnp.sin(yaw))
    if has_hf:
        # (B, H, W) -> (H*W, B); x0y0/cell (B, 2) -> (2, B)
        hf = jnp.reshape(terrain.hfield, (batch, -1)).T
        hfield_blocks = (hf, jnp.swapaxes(terrain.hfield_x0y0, 0, 1), jnp.swapaxes(terrain.hfield_cell, 0, 1))
    if model.nterrain > 0 or has_hf:
        floor_z = jnp.broadcast_to(jnp.reshape(terrain.floor_z, (1, -1)), (1, batch))

    motor_hist = None
    if motor_params is not None:
        # leading-batch MotorState (B,H,nu) -> joint-major (nu*H, B) blocks
        H = mstate.qdot_hist.shape[1]
        motor_hist = (
            jnp.transpose(mstate.qdot_hist, (2, 1, 0)).reshape(-1, batch),
            jnp.transpose(mstate.ctau_hist, (2, 1, 0)).reshape(-1, batch),
            mstate.count.astype(jnp.float32)[None, :],
        )

    out = run(
        jnp.swapaxes(physics.qpos, 0, 1),
        jnp.swapaxes(physics.qvel, 0, 1),
        jnp.swapaxes(target, 0, 1),
        kp,
        kd,
        bemf,
        params_t.dof_damping,
        params_t.dof_frictionloss,
        params_t.body_mass,
        params_t.body_ipos.reshape(-1, batch),
        jnp.concatenate([params_t.xfrc[i] for i in range(model.nbody)]),
        terrain=terrain_blocks,
        hfield=hfield_blocks,
        floor_z=floor_z,
        motor_hist=motor_hist,
    )
    qpos, qvel, qacc, act_torque, cforce, cdist, cmask, cpos, cnormal, xpos_f, xquat_f, cvel_f = out[:12]

    # FK caches for observations/rewards come straight from the kernel
    # (computed in-VMEM on the final state — no XLA-side FK rebuild)
    nb = model.nbody
    xpos = xpos_f.reshape(nb, 3, batch)
    xquat = xquat_f.reshape(nb, 4, batch)
    cvel = cvel_f.reshape(nb, 6, batch)

    if model.nterrain > 0 or has_hf:
        # rebuild (n, t1, t2) frames from the kernel's contact normals
        normals = cnormal.reshape(nc, 3, batch)  # (nc, 3, B)
        frames = jnp.stack([batched._frame_from_normal_b(normals[c]) for c in range(nc)])
        frame = jnp.transpose(frames, (3, 0, 1, 2))  # (B, nc, 3, 3)
    else:
        frame = jnp.broadcast_to(jnp.eye(3)[jnp.array([2, 0, 1])][None, None], (batch, nc, 3, 3))
    contact = Contact(
        pos=jnp.transpose(cpos.reshape(nc, 3, batch), (2, 0, 1)),
        frame=frame,
        dist=jnp.swapaxes(cdist, 0, 1),
        geom=jnp.broadcast_to(
            jnp.asarray(
                np.repeat(list(model.foot_geoms), eng.slots_per_geom(model)), dtype=jnp.int32
            )[None],
            (batch, nc),
        ),
        force=jnp.transpose(cforce.reshape(nc, 3, batch), (2, 0, 1)),
        mask=jnp.swapaxes(cmask, 0, 1),
    )
    state_out = PhysicsState(
        qpos=jnp.swapaxes(qpos, 0, 1),
        qvel=jnp.swapaxes(qvel, 0, 1),
        qacc=jnp.swapaxes(qacc, 0, 1),
        act_torque=jnp.swapaxes(act_torque, 0, 1),
        xpos=jnp.transpose(xpos, (2, 0, 1)),
        xquat=jnp.transpose(xquat, (2, 0, 1)),
        cvel=jnp.transpose(cvel, (2, 0, 1)),
        contact=contact,
        time=physics.time + frame_skip * sim_dt,
    )
    if motor_params is not None:
        from learninghumanoidwalking_tpu.robots.motor import MotorState

        qd_o, ct_o, cnt_o = out[12:15]
        nu = model.nu
        mstate_out = MotorState(
            qdot_hist=jnp.transpose(qd_o.reshape(nu, H, batch), (2, 1, 0)),
            ctau_hist=jnp.transpose(ct_o.reshape(nu, H, batch), (2, 1, 0)),
            count=jnp.round(cnt_o[0]).astype(jnp.int32),
        )
        return state_out, mstate_out
    return state_out
