"""Quaternion, SO(3) and Featherstone spatial-vector algebra for the TPU engine.

All functions are written for *unbatched* inputs (3-vectors, (3,3) matrices,
6-vectors as (omega, v) pairs) and are `jax.vmap`-ed over the environment axis
by the engine.  Everything is pure jnp and jit/grad friendly.

Conventions
-----------
* Quaternions are (w, x, y, z), Hamilton convention, and represent the
  rotation *world <- body*: ``rotate(q, v_body) = v_world``.
  (The reference stack uses Isaac Gym's (x, y, z, w) ordering,
  legged_gym/envs/base/legged_robot.py:115; we convert at API boundaries.)
* Spatial (Plücker) vectors follow Featherstone's RBDA: angular part first,
  ``m = [omega; v]`` for motion, ``f = [n; f]`` for force.  A spatial motion
  vector expressed in body coordinates has ``v`` equal to the velocity of the
  body-fixed point currently at the frame origin.
* A coordinate transform ``X = (E, p)`` maps A-coordinates to B-coordinates
  where ``p`` is the origin of B expressed in A and ``E = R_{B<-A}`` rotates
  A-vectors into B:  ``omega_B = E omega_A``, ``v_B = E (v_A - p x omega_A)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# --------------------------------------------------------------------------


def quat_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q (body -> world when q is world<-body)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^{-1} (world -> body).

    Semantics of isaacgym.torch_utils.quat_rotate_inverse used throughout the
    reference (legged_robot.py:116-118) with our wxyz ordering.
    """
    return quat_rotate(quat_conj(q), v)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R with R @ v_body = v_world."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        axis=-2,
    )


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_integrate(q: jnp.ndarray, omega_body: jnp.ndarray, dt) -> jnp.ndarray:
    """First-order exponential-map quaternion integration with body-frame omega."""
    angle = jnp.linalg.norm(omega_body, axis=-1, keepdims=True).clip(1e-9)
    axis = omega_body / angle
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(q, dq))


def quat_from_rpy(roll, pitch, yaw) -> jnp.ndarray:
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_rpy(q: jnp.ndarray):
    """Roll/pitch/yaw, formulas matching the reference (go2.py:11-31)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return roll, pitch, yaw


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (reference utils/math.py:38-42)."""
    _, _, yaw = quat_to_rpy(q)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    out = jnp.stack(jnp.broadcast_arrays(c * x - s * y, s * x + c * y, z), axis=-1)
    return out


def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap to [-pi, pi) (reference utils/math.py:45-49)."""
    return jnp.mod(angles + jnp.pi, 2 * jnp.pi) - jnp.pi


# --------------------------------------------------------------------------
# SO(3) helpers
# --------------------------------------------------------------------------


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def rpy_to_matrix(roll, pitch, yaw) -> jnp.ndarray:
    """URDF rpy (extrinsic x-y-z) to rotation matrix (body->parent)."""
    return quat_to_matrix(quat_from_rpy(roll, pitch, yaw))


# --------------------------------------------------------------------------
# Spatial vectors: motion m = (omega, v), force f = (n, f) as (..., 6) arrays
# --------------------------------------------------------------------------


def sv(ang: jnp.ndarray, lin: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([ang, lin], axis=-1)


def ang(m: jnp.ndarray) -> jnp.ndarray:
    return m[..., 0:3]


def lin(m: jnp.ndarray) -> jnp.ndarray:
    return m[..., 3:6]


def xform_motion(E: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """A-coords -> B-coords for a motion vector, X = (E, p)."""
    w = ang(m)
    v = lin(m)
    return sv(E @ w, E @ (v - jnp.cross(p, w)))


def inv_xform_motion(E: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """B-coords -> A-coords for a motion vector."""
    w = E.T @ ang(m)
    v = E.T @ lin(m)
    return sv(w, v + jnp.cross(p, w))


def xform_force(E: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """A-coords -> B-coords for a force vector (covariant transform)."""
    n = ang(f)
    ff = lin(f)
    return sv(E @ (n - jnp.cross(p, ff)), E @ ff)


def inv_xform_force(E: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """B-coords -> A-coords for a force vector."""
    ff = E.T @ lin(f)
    n = E.T @ ang(f)
    return sv(n + jnp.cross(p, ff), ff)


def crm(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product v x m."""
    w, vl = ang(v), lin(v)
    mw, ml = ang(m), lin(m)
    return sv(jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw))


def crf(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product v x* f."""
    w, vl = ang(v), lin(v)
    n, ff = ang(f), lin(f)
    return sv(jnp.cross(w, n) + jnp.cross(vl, ff), jnp.cross(w, ff))


# --------------------------------------------------------------------------
# Spatial rigid-body inertia, parameterized as (m, h, I) with h = m * com and
# I the 3x3 rotational inertia about the *body frame origin*.
# --------------------------------------------------------------------------


def inertia_mul(m: jnp.ndarray, h: jnp.ndarray, I: jnp.ndarray, v: jnp.ndarray):
    """f = I_spatial @ v for v = [omega; vel]."""
    w, vl = ang(v), lin(v)
    return sv(I @ w + jnp.cross(h, vl), m * vl - jnp.cross(h, w))


def inertia_to_mat66(m, h, I) -> jnp.ndarray:
    hx = hat(h)
    top = jnp.concatenate([I, hx], axis=-1)
    bot = jnp.concatenate([-hx, m * jnp.eye(3)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xform_to_mat66(E: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 motion transform matrix X for X = (E, p)."""
    zero = jnp.zeros((3, 3))
    top = jnp.concatenate([E, zero], axis=-1)
    bot = jnp.concatenate([-E @ hat(p), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spatial_inertia_about_origin(mass, com, inertia_com):
    """(m, h, I_origin) from mass, com offset and rotational inertia about com."""
    h = mass * com
    cx = hat(com)
    I_o = inertia_com + mass * (cx @ cx.T)
    return mass, h, I_o
