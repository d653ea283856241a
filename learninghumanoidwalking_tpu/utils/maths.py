"""Quaternion / rotation math for the TPU physics engine.

Pure jnp functions, trace-safe and vmap-safe. Quaternions use MuJoCo's
wxyz convention so observation semantics match the reference (which extracts
roll/pitch via transforms3d from MuJoCo qpos quaternions,
/root/reference/tasks/observations.py:12-26).

All functions operate on single (unbatched) inputs; batch with jax.vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 (wxyz)."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q), eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body -> world if q is body orientation)."""
    qv = q[1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[0] * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by the inverse of q (world -> body)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix from quaternion (wxyz)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (wxyz) from rotation matrix. Branch-free Shepperd variant."""
    # Four candidate constructions; pick the numerically best via where.
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m[0, 0] - m[1, 1] - m[2, 2], 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m[0, 0] + m[1, 1] - m[2, 2], 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m[0, 0] - m[1, 1] + m[2, 2], 1e-12)) / 2.0
    # Fix signs relative to the largest component.
    case = jnp.argmax(jnp.stack([qw, qx, qy, qz]))
    qs = jnp.stack(
        [
            jnp.stack([qw, (m[2, 1] - m[1, 2]) / (4 * qw), (m[0, 2] - m[2, 0]) / (4 * qw), (m[1, 0] - m[0, 1]) / (4 * qw)]),
            jnp.stack([(m[2, 1] - m[1, 2]) / (4 * qx), qx, (m[0, 1] + m[1, 0]) / (4 * qx), (m[0, 2] + m[2, 0]) / (4 * qx)]),
            jnp.stack([(m[0, 2] - m[2, 0]) / (4 * qy), (m[0, 1] + m[1, 0]) / (4 * qy), qy, (m[1, 2] + m[2, 1]) / (4 * qy)]),
            jnp.stack([(m[1, 0] - m[0, 1]) / (4 * qz), (m[0, 2] + m[2, 0]) / (4 * qz), (m[1, 2] + m[2, 1]) / (4 * qz), qz]),
        ]
    )
    return quat_normalize(qs[case])


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Integrate orientation by a body-frame angular velocity over dt.

    Matches MuJoCo free/ball-joint integration semantics (qvel angular part is
    expressed in the child body frame): q' = q * exp(0.5 * dt * omega_local).
    """
    angle = jnp.linalg.norm(omega_local) * dt
    # Safe axis: when angle ~ 0, sin(angle/2)/|w| -> dt/2, handled via sinc.
    half = 0.5 * angle
    # sinc formulation: sin(half)/|w| = 0.5*dt*sinc(half/pi)
    s = 0.5 * dt * jnp.sinc(half / jnp.pi)
    dq = jnp.concatenate([jnp.cos(half)[None], s * omega_local])
    return quat_normalize(quat_mul(q, dq))


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic x-y-z (roll, pitch, yaw) Euler angles from quaternion.

    Matches transforms3d's quat2euler with the default 'sxyz' convention used
    by the reference for root orientation observations
    (/root/reference/tasks/observations.py:24).
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - x * z), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from extrinsic x-y-z (roll, pitch, yaw) Euler angles."""
    hr, hp, hy = rpy[0] / 2.0, rpy[1] / 2.0, rpy[2] / 2.0
    cr, sr = jnp.cos(hr), jnp.sin(hr)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    return jnp.stack(
        [
            cr * cp * cy - sr * sp * sy,
            sr * cp * cy + cr * sp * sy,
            cr * sp * cy - sr * cp * sy,
            cr * cp * sy + sr * sp * cy,
        ]
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix: skew(v) @ u == v x u."""
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


# --- 6D spatial algebra (Featherstone), world-frame, motion = (omega, v_origin),
# --- force = (moment_about_origin, linear_force).


def motion_cross(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v x m for motion vectors (w, v0)."""
    w, v0 = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return jnp.concatenate([jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(v0, mw)])


def force_cross(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v x* f for force vectors (n, f_lin)."""
    w, v0 = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v0, fl), jnp.cross(w, fl)])


def spatial_inertia(mass: jnp.ndarray, inertia_com: jnp.ndarray, com: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia about the world origin.

    Args:
        mass: scalar body mass.
        inertia_com: 3x3 rotational inertia about the CoM in world axes.
        com: world position of the CoM.

    Layout for motion (w, v0): I = [[Ibar, m*cx], [m*cx^T, m*E]] with
    Ibar = I_com - m*cx*cx (cx = skew(com)).
    """
    cx = skew(com)
    eye = jnp.eye(3)
    ibar = inertia_com - mass * cx @ cx
    return jnp.block([[ibar, mass * cx], [mass * cx.T, mass * eye]])
