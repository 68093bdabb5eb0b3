"""Featherstone articulated rigid-body algorithms (RNEA / CRBA / ABA).

This is the compute core replacing Isaac Gym's PhysX solver
(reference legged_robot.py:81-85 `gym.simulate`).  Single-robot functions over
small static trees (13 bodies for Go2), written so the tree loops unroll at
trace time and everything vectorizes with `jax.vmap` over the env axis — the
TPU-native analog of PhysX's GPU env batching (SURVEY §2.4).

State conventions (see spatial.py):
  * base_quat (w,x,y,z): world <- base rotation.
  * v_base: spatial velocity of the base in *base* coordinates [omega; v].
  * f_ext: per-body spatial force in *world axes about each body's origin*.

Cross-validated against MuJoCo (mass matrix, bias forces, forward dynamics)
in tests/test_dynamics_vs_mujoco.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import spatial as sp
from .model import RobotModel


class ModelArrays(NamedTuple):
    """Device-resident static model data (closure constants under jit)."""

    parent: tuple          # python tuple of ints -> static tree structure
    joint_rot: jnp.ndarray  # (nb,3,3)
    joint_pos: jnp.ndarray  # (nb,3)
    joint_axis: jnp.ndarray  # (nb,3)
    mass: jnp.ndarray      # (nb,)
    com: jnp.ndarray       # (nb,3)
    inertia_com: jnp.ndarray  # (nb,3,3)
    geom_body: jnp.ndarray
    geom_pos: jnp.ndarray
    geom_radius: jnp.ndarray
    geom_link: jnp.ndarray
    link_body: jnp.ndarray
    link_pos: jnp.ndarray
    n_links: int

    @property
    def nb(self) -> int:
        return len(self.parent)


def model_arrays(model: RobotModel, dtype=jnp.float32) -> ModelArrays:
    return ModelArrays(
        parent=tuple(int(p) for p in model.parent),
        joint_rot=jnp.asarray(model.joint_rot, dtype),
        joint_pos=jnp.asarray(model.joint_pos, dtype),
        joint_axis=jnp.asarray(model.joint_axis, dtype),
        mass=jnp.asarray(model.mass, dtype),
        com=jnp.asarray(model.com, dtype),
        inertia_com=jnp.asarray(model.inertia_com, dtype),
        geom_body=jnp.asarray(model.geom_body, jnp.int32),
        geom_pos=jnp.asarray(model.geom_pos, dtype),
        geom_radius=jnp.asarray(model.geom_radius, dtype),
        geom_link=jnp.asarray(model.geom_link, jnp.int32),
        link_body=jnp.asarray(model.link_body, jnp.int32),
        link_pos=jnp.asarray(model.link_pos, dtype),
        n_links=model.n_links,
    )


def body_inertias(m: ModelArrays, added_mass=None, com_offset=None):
    """Per-body (mass, h, I_origin) with optional base-body domain rand.

    The reference adds random payload mass / com shift to the base rigid body
    at env creation (legged_robot.py:361-380).  Here they are dynamics
    *parameters*, so privileged observations read them directly.
    """
    mass = m.mass
    com = m.com
    if added_mass is not None:
        mass = mass.at[0].add(added_mass)
    if com_offset is not None:
        com = com.at[0].add(com_offset)
    h = mass[:, None] * com
    # parallel-axis: I_origin = I_com + m * (cx cx^T)
    cx = sp.hat(com)
    I_o = m.inertia_com + mass[:, None, None] * (cx @ jnp.swapaxes(cx, -1, -2))
    return mass, h, I_o


def _rot_axis(axis: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R(axis, q) (rotates vectors by +q about axis)."""
    c, s = jnp.cos(q), jnp.sin(q)
    ax = sp.hat(axis)
    return c * jnp.eye(3) + s * ax + (1 - c) * jnp.outer(axis, axis)


def joint_transforms(m: ModelArrays, base_quat, dof_pos):
    """Per-body (E_up, p_up): parent-body coords -> body coords, and world pose.

    Returns:
      E_up: list of (3,3), p_up: list of (3,)    — parent->child transforms
      E0:   list of (3,3) = R_{body<-world},  p0: list of (3,) world positions
    """
    nb = m.nb
    R_wb = sp.quat_to_matrix(base_quat)
    E_up = [R_wb.T]
    p_up = [jnp.zeros(3, dtype=base_quat.dtype)]  # unused for base
    E0 = [R_wb.T]
    p0 = [jnp.zeros(3, dtype=base_quat.dtype)]  # base at origin; engine adds pos
    for i in range(1, nb):
        q_i = dof_pos[i - 1]
        E_j = _rot_axis(m.joint_axis[i], q_i).T
        E = E_j @ m.joint_rot[i]
        E_up.append(E)
        p_up.append(m.joint_pos[i])
        p = m.parent[i]
        E0.append(E @ E0[p])
        p0.append(p0[p] + E0[p].T @ m.joint_pos[i])
    return E_up, p_up, E0, p0


def forward_kinematics(m: ModelArrays, base_quat, base_pos, dof_pos, v_base, dof_vel):
    """World poses and spatial velocities (body coords) of all bodies."""
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    nb = m.nb
    v = [v_base]
    for i in range(1, nb):
        p = m.parent[i]
        vi = sp.xform_motion(E_up[i], p_up[i], v[p])
        vJ = jnp.concatenate([m.joint_axis[i] * dof_vel[i - 1], jnp.zeros(3, dtype=dof_pos.dtype)])
        v.append(vi + vJ)
    p0w = [base_pos + q for q in p0]
    return E_up, p_up, E0, p0w, v


def rnea(m, inertias, base_quat, dof_pos, v_base, dof_vel, qdd_base, qdd, f_ext=None,
         gravity=(-0.0, 0.0, -9.81)):
    """Inverse dynamics: generalized forces producing given accelerations.

    Gravity enters via the standard fictitious base acceleration trick
    (Featherstone RBDA §5.3).  Returns (f0 (6,), tau (ndof,)): the base wrench
    (base coords) and joint torques.  With qdd = 0 this yields the bias force
    (Coriolis + gravity), comparable to MuJoCo's qfrc_bias.
    """
    nb = m.nb
    mass, h, I_o = inertias
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    g = jnp.asarray(gravity, dtype=dof_pos.dtype)
    a_g = jnp.concatenate([jnp.zeros(3, dtype=dof_pos.dtype), g])

    v = [v_base]
    # a[0] includes -gravity (accelerating-frame trick), rotated to base coords
    a = [sp.sv(jnp.zeros(3, dtype=dof_pos.dtype), -(E0[0] @ g)) + qdd_base]
    f = []
    for i in range(1, nb):
        p = m.parent[i]
        S = jnp.concatenate([m.joint_axis[i], jnp.zeros(3, dtype=dof_pos.dtype)])
        vi = sp.xform_motion(E_up[i], p_up[i], v[p]) + S * dof_vel[i - 1]
        ai = (
            sp.xform_motion(E_up[i], p_up[i], a[p])
            + S * qdd[i - 1]
            + sp.crm(vi, S * dof_vel[i - 1])
        )
        v.append(vi)
        a.append(ai)
    for i in range(nb):
        Iv = sp.inertia_mul(mass[i], h[i], I_o[i], v[i])
        fi = sp.inertia_mul(mass[i], h[i], I_o[i], a[i]) + sp.crf(v[i], Iv)
        if f_ext is not None:
            # world-axes wrench about body origin -> body coords (rotation only)
            n_b = E0[i] @ f_ext[i][0:3]
            f_b = E0[i] @ f_ext[i][3:6]
            fi = fi - jnp.concatenate([n_b, f_b])
        f.append(fi)
    tau = [None] * (nb - 1)
    for i in range(nb - 1, 0, -1):
        S = jnp.concatenate([m.joint_axis[i], jnp.zeros(3, dtype=dof_pos.dtype)])
        tau[i - 1] = jnp.dot(S, f[i])
        p = m.parent[i]
        f[p] = f[p] + sp.inv_xform_force(E_up[i], p_up[i], f[i])
    return f[0], jnp.stack(tau) if tau else jnp.zeros(0)


def crba(m, inertias, base_quat, dof_pos):
    """Composite rigid-body algorithm: joint-space mass matrix (nv x nv).

    Row/col order: [base 6 dof (ang, lin in base coords); joints].
    """
    nb = m.nb
    mass, h, I_o = inertias
    E_up, p_up, _, _ = joint_transforms(m, base_quat, dof_pos)
    Ic = [sp.inertia_to_mat66(mass[i], h[i], I_o[i]) for i in range(nb)]
    X = [None] + [sp.xform_to_mat66(E_up[i], p_up[i]) for i in range(1, nb)]
    for i in range(nb - 1, 0, -1):
        p = m.parent[i]
        Ic[p] = Ic[p] + X[i].T @ Ic[i] @ X[i]
    nv = 6 + nb - 1
    H = jnp.zeros((nv, nv), dtype=dof_pos.dtype)
    H = H.at[0:6, 0:6].set(Ic[0])
    for i in range(1, nb):
        S = jnp.concatenate([m.joint_axis[i], jnp.zeros(3, dtype=dof_pos.dtype)])
        F = Ic[i] @ S
        H = H.at[6 + i - 1, 6 + i - 1].set(jnp.dot(S, F))
        j = i
        while m.parent[j] > 0:
            F = X[j].T @ F
            j = m.parent[j]
            Sj = jnp.concatenate([m.joint_axis[j], jnp.zeros(3, dtype=dof_pos.dtype)])
            val = jnp.dot(Sj, F)
            H = H.at[6 + i - 1, 6 + j - 1].set(val)
            H = H.at[6 + j - 1, 6 + i - 1].set(val)
        F = X[j].T @ F  # into base coords
        H = H.at[6 + i - 1, 0:6].set(F)
        H = H.at[0:6, 6 + i - 1].set(F)
    return H


def aba(m, inertias, base_quat, dof_pos, v_base, dof_vel, tau, f_ext=None,
        gravity=(0.0, 0.0, -9.81)):
    """Articulated-body forward dynamics.

    Args:
      tau: (ndof,) joint torques.
      f_ext: optional (nb, 6) per-body [n; f] in world axes about body origins.
    Returns:
      (a_base (6,) *true* spatial accel in base coords, qdd (ndof,)).
      Gravity is applied as an explicit per-body external wrench at the com,
      so returned accelerations are true coordinate accelerations.
    """
    nb = m.nb
    mass, h, I_o = inertias
    dtype = dof_pos.dtype
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    g = jnp.asarray(gravity, dtype=dtype)

    S = [None] + [
        jnp.concatenate([m.joint_axis[i], jnp.zeros(3, dtype=dtype)]) for i in range(1, nb)
    ]
    v = [v_base]
    c = [jnp.zeros(6, dtype=dtype)]
    for i in range(1, nb):
        p = m.parent[i]
        vJ = S[i] * dof_vel[i - 1]
        vi = sp.xform_motion(E_up[i], p_up[i], v[p]) + vJ
        v.append(vi)
        c.append(sp.crm(vi, vJ))

    IA = [sp.inertia_to_mat66(mass[i], h[i], I_o[i]) for i in range(nb)]
    pA = []
    for i in range(nb):
        Iv = sp.inertia_mul(mass[i], h[i], I_o[i], v[i])
        pa = sp.crf(v[i], Iv)
        # gravity at the com, expressed about the body origin in body axes
        g_b = E0[i] @ g
        pa = pa - jnp.concatenate([jnp.cross(h[i], g_b), mass[i] * g_b])
        if f_ext is not None:
            n_b = E0[i] @ f_ext[i][0:3]
            f_b = E0[i] @ f_ext[i][3:6]
            pa = pa - jnp.concatenate([n_b, f_b])
        pA.append(pa)

    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, 0, -1):
        p = m.parent[i]
        U[i] = IA[i] @ S[i]
        d[i] = jnp.dot(S[i], U[i])
        u[i] = tau[i - 1] - jnp.dot(S[i], pA[i])
        Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
        pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
        X = sp.xform_to_mat66(E_up[i], p_up[i])
        IA[p] = IA[p] + X.T @ Ia @ X
        pA[p] = pA[p] + sp.inv_xform_force(E_up[i], p_up[i], pa)

    # floating base equilibrium: IA[0] a0 + pA[0] = 0
    a0 = jnp.linalg.solve(IA[0], -pA[0])

    a = [a0]
    qdd = [None] * (nb - 1)
    for i in range(1, nb):
        p = m.parent[i]
        ai = sp.xform_motion(E_up[i], p_up[i], a[p]) + c[i]
        qdd[i - 1] = (u[i] - jnp.dot(U[i], ai)) / d[i]
        a.append(ai + S[i] * qdd[i - 1])
    return a0, jnp.stack(qdd) if qdd else jnp.zeros(0, dtype=dtype)
