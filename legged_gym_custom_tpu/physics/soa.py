"""Component-major ("structure-of-arrays") primitives for the dynamics core.

TPU performance note (the reason this module exists): XLA lays arrays out with
the *last* dimension on the 128-wide vector lanes.  Batched spatial algebra
with batch-leading shapes like (B, 6, 6) puts the tiny 6-wide axes on the
lanes — measured ~14 GFLOP/s on v5e for the ABA's 6x6 transforms.  With
components leading and the env batch trailing, (6, 6, B), the same einsum
runs ~90x faster because every multiply-add vectorizes over the full batch.

Convention: vectors are (3,)+bs / (6,)+bs, matrices (3,3)+bs / (6,6)+bs,
quaternions (4,)+bs where bs is an arbitrary (usually empty or (B,)) batch
shape.  With bs == () these coincide with plain unbatched arrays, so the same
algorithm code serves single-robot tests and the batched engine.
"""
from __future__ import annotations

import jax.numpy as jnp


def mv(M, v):
    """Matrix @ vector over leading axes: (i,j)+bs, (j,)+bs -> (i,)+bs."""
    return jnp.einsum("ij...,j...->i...", M, v)


def mtv(M, v):
    """Matrix.T @ vector."""
    return jnp.einsum("ji...,j...->i...", M, v)


def mm(M, N):
    return jnp.einsum("ij...,jk...->ik...", M, N)


def mtm(M, N):
    """M.T @ N."""
    return jnp.einsum("ji...,jk...->ik...", M, N)


def mmt(M, N):
    """M @ N.T."""
    return jnp.einsum("ij...,kj...->ik...", M, N)


def outer(a, b):
    return jnp.einsum("i...,j...->ij...", a, b)


def dot(a, b):
    return jnp.sum(a * b, axis=0)


def cross(a, b):
    a0, a1, a2 = a[0], a[1], a[2]
    b0, b1, b2 = b[0], b[1], b[2]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0])


def hat(v):
    z = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([z, -v[2], v[1]]),
            jnp.stack([v[2], z, -v[0]]),
            jnp.stack([-v[1], v[0], z]),
        ]
    )


def eye3(like):
    """(3,3)+bs identity with the batch shape of `like` (a (…)+bs scalar)."""
    e = jnp.eye(3, dtype=like.dtype).reshape((3, 3) + (1,) * like.ndim)
    return jnp.broadcast_to(e, (3, 3) + like.shape)


def bcast(x, bs):
    """Append singleton axes so a per-component constant broadcasts over bs."""
    return x.reshape(x.shape + (1,) * len(bs))


# --------------------------------------------------------------------------
# Quaternions (4,)+bs, wxyz, world <- body
# --------------------------------------------------------------------------


def quat_to_matrix(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
            jnp.stack([2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)]),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)]),
        ]
    )


def quat_mul(a, b):
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_integrate(q, omega_body, dt):
    angle = jnp.sqrt(jnp.sum(omega_body**2, axis=0)).clip(1e-9)
    axis = omega_body / angle
    half = 0.5 * angle * dt
    dq = jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)[None]])
    out = quat_mul(q, dq)
    return out / jnp.sqrt(jnp.sum(out**2, axis=0)).clip(1e-9)


def rot_axis(axis, q):
    """R(axis, q) rotating by +q about a *static* (3,) axis; q is ()+bs."""
    c, s = jnp.cos(q), jnp.sin(q)
    ax = hat(bcast(jnp.asarray(axis, q.dtype), q.shape) * jnp.ones_like(q))
    aa = outer(
        bcast(jnp.asarray(axis, q.dtype), q.shape) * jnp.ones_like(q),
        bcast(jnp.asarray(axis, q.dtype), q.shape) * jnp.ones_like(q),
    )
    return c * eye3(q) + s * ax + (1 - c) * aa


# --------------------------------------------------------------------------
# Spatial vectors (6,)+bs = [angular; linear]; transforms X = (E, p)
# --------------------------------------------------------------------------


def sv(angv, linv):
    return jnp.concatenate([angv, linv], axis=0)


def s_ang(m):
    return m[0:3]


def s_lin(m):
    return m[3:6]


def xform_motion(E, p, m):
    w = s_ang(m)
    v = s_lin(m)
    return sv(mv(E, w), mv(E, v - cross(p, w)))


def inv_xform_motion(E, p, m):
    w = mtv(E, s_ang(m))
    v = mtv(E, s_lin(m))
    return sv(w, v + cross(p, w))


def xform_force(E, p, f):
    n = s_ang(f)
    ff = s_lin(f)
    return sv(mv(E, n - cross(p, ff)), mv(E, ff))


def inv_xform_force(E, p, f):
    ff = mtv(E, s_lin(f))
    n = mtv(E, s_ang(f))
    return sv(n + cross(p, ff), ff)


def crm(v, m):
    w, vl = s_ang(v), s_lin(v)
    mw, ml = s_ang(m), s_lin(m)
    return sv(cross(w, mw), cross(w, ml) + cross(vl, mw))


def crf(v, f):
    w, vl = s_ang(v), s_lin(v)
    n, ff = s_ang(f), s_lin(f)
    return sv(cross(w, n) + cross(vl, ff), cross(w, ff))


def inertia_mul(m, h, I, v):
    """Spatial inertia (m ()+bs, h (3,)+bs, I (3,3)+bs) applied to motion v."""
    w, vl = s_ang(v), s_lin(v)
    return sv(mv(I, w) + cross(h, vl), m * vl - cross(h, w))


def inertia_to_mat66(m, h, I):
    hx = hat(h)
    mI = m * eye3(m)
    top = jnp.concatenate([I, hx], axis=1)
    bot = jnp.concatenate([-hx, mI], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def xform_to_mat66(E, p):
    zero = jnp.zeros_like(E)
    top = jnp.concatenate([E, zero], axis=1)
    bot = jnp.concatenate([-mm(E, hat(p)), E], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def inv3(M):
    """Closed-form 3x3 inverse (adjugate / det), fully in-layout.

    Avoids jnp.linalg on batched tiny systems: relayouting (3,3)+bs to
    bs+(3,3) for LAPACK-style kernels costs a cross-lane shuffle that
    dominated the ABA on TPU (measured ~9 ms/substep at B=4096).
    """
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([A, B, C]),
            jnp.stack([D, E, F]),
            jnp.stack([G, H, I]),
        ]
    ) * inv_det


def solve66(A, b):
    """Solve the SPD system A x = b for (6,6)+bs / (6,)+bs via 3x3 Schur
    blocks — closed-form, no relayout (see inv3 docstring)."""
    A11 = A[0:3, 0:3]
    A12 = A[0:3, 3:6]
    A21 = A[3:6, 0:3]
    A22 = A[3:6, 3:6]
    b1 = b[0:3]
    b2 = b[3:6]
    A11i = inv3(A11)
    S = A22 - mm(A21, mm(A11i, A12))
    Si = inv3(S)
    x2 = mv(Si, b2 - mv(A21, mv(A11i, b1)))
    x1 = mv(A11i, b1 - mv(A12, x2))
    return jnp.concatenate([x1, x2], axis=0)
