"""Featherstone articulated rigid-body algorithms (RNEA / CRBA / ABA).

This is the compute core replacing Isaac Gym's PhysX solver
(reference legged_robot.py:81-85 `gym.simulate`).  The tree loops unroll at
trace time over small static trees (13 bodies for Go2).

Layout: everything is *component-major with a trailing batch* (physics/soa.py)
— quats (4,)+bs, vectors (3,)+bs / (6,)+bs, matrices (6,6)+bs — so the env
batch rides the TPU vector lanes.  With bs == () the functions are plain
single-robot dynamics; that unbatched path is cross-validated against MuJoCo
(mass matrix, bias forces, forward dynamics) in
tests/test_dynamics_vs_mujoco.py.

State conventions:
  * base_quat (w,x,y,z): world <- base rotation.
  * v_base: spatial velocity of the base in *base* coordinates [omega; v].
  * f_ext: per-body spatial force in *world axes about each body's origin*,
    shape (nb, 6)+bs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import soa
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
    """Per-body [(m ()+bs, h (3,)+bs, I (3,3)+bs)] with base-body domain rand.

    The reference adds random payload mass / com shift to the base rigid body
    at env creation (legged_robot.py:361-380); here they are per-env dynamics
    parameters (com_offset is (3,)+bs, added_mass ()+bs).
    """
    bs = () if added_mass is None else jnp.shape(added_mass)
    out = []
    for i in range(m.nb):
        mass_i = jnp.broadcast_to(m.mass[i], bs)
        com_i = jnp.broadcast_to(soa.bcast(m.com[i], bs), (3,) + bs)
        if i == 0 and added_mass is not None:
            mass_i = mass_i + added_mass
        if i == 0 and com_offset is not None:
            com_i = com_i + com_offset
        h = mass_i * com_i
        cx = soa.hat(com_i)
        I_o = soa.bcast(m.inertia_com[i], bs) + mass_i * soa.mmt(cx, cx)
        out.append((mass_i, h, I_o))
    return out


def _S(m: ModelArrays, i: int, bs) -> jnp.ndarray:
    """Joint motion subspace [axis; 0] as (6,)+(1,)*len(bs) for broadcasting."""
    s = jnp.concatenate([m.joint_axis[i], jnp.zeros(3, m.joint_axis.dtype)])
    return soa.bcast(s, bs)


def joint_transforms(m: ModelArrays, base_quat, dof_pos):
    """Per-body parent->child transforms and world poses (component-major).

    Returns E_up/p_up (parent->child coords) and E0 = R_{body<-world},
    p0 = body origin relative to the base origin, in world coords.
    """
    nb = m.nb
    bs = jnp.shape(base_quat)[1:]
    R_wb = soa.quat_to_matrix(base_quat)
    E_up = [jnp.swapaxes(R_wb, 0, 1)]
    p_up = [jnp.zeros((3,) + bs, base_quat.dtype)]
    E0 = [E_up[0]]
    p0 = [jnp.zeros((3,) + bs, base_quat.dtype)]
    for i in range(1, nb):
        q_i = dof_pos[i - 1]
        E_j = jnp.swapaxes(soa.rot_axis(m.joint_axis[i], q_i), 0, 1)
        E = soa.mm(E_j, soa.bcast(m.joint_rot[i], bs))
        E_up.append(E)
        p_tree = soa.bcast(m.joint_pos[i], bs)
        p_up.append(p_tree)
        p = m.parent[i]
        E0.append(soa.mm(E, E0[p]))
        p0.append(p0[p] + soa.mtv(E0[p], p_tree * jnp.ones_like(p0[p])))
    return E_up, p_up, E0, p0


def forward_kinematics(m: ModelArrays, base_quat, base_pos, dof_pos, v_base, dof_vel):
    """World poses and spatial velocities (body coords) of all bodies."""
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    bs = jnp.shape(base_quat)[1:]
    nb = m.nb
    v = [v_base]
    for i in range(1, nb):
        p = m.parent[i]
        vi = soa.xform_motion(E_up[i], p_up[i], v[p])
        v.append(vi + _S(m, i, bs) * dof_vel[i - 1])
    p0w = [base_pos + q for q in p0]
    return E_up, p_up, E0, p0w, v


def rnea(m, inertias, base_quat, dof_pos, v_base, dof_vel, qdd_base, qdd, f_ext=None,
         gravity=(0.0, 0.0, -9.81), armature=None):
    """Inverse dynamics: generalized forces producing given accelerations.

    Gravity enters via the fictitious base acceleration trick (Featherstone
    RBDA §5.3).  Returns (f0 (6,)+bs base wrench in base coords, tau).  With
    qdd = 0 this yields the bias force, comparable to MuJoCo's qfrc_bias.
    `armature` ((ndof,) or None) adds reflected rotor inertia in joint space
    (MuJoCo `armature` semantics): tau_i += armature_i * qdd_i.
    """
    nb = m.nb
    bs = jnp.shape(base_quat)[1:]
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    g = soa.bcast(jnp.asarray(gravity, dof_pos.dtype), bs)

    v = [v_base]
    zero3 = jnp.zeros((3,) + bs, dof_pos.dtype)
    a = [soa.sv(zero3, -soa.mv(E0[0], g * jnp.ones_like(zero3))) + qdd_base]
    f = []
    for i in range(1, nb):
        p = m.parent[i]
        S = _S(m, i, bs)
        vJ = S * dof_vel[i - 1]
        vi = soa.xform_motion(E_up[i], p_up[i], v[p]) + vJ
        ai = (
            soa.xform_motion(E_up[i], p_up[i], a[p])
            + S * qdd[i - 1]
            + soa.crm(vi, vJ)
        )
        v.append(vi)
        a.append(ai)
    for i in range(nb):
        mass_i, h_i, I_i = inertias[i]
        Iv = soa.inertia_mul(mass_i, h_i, I_i, v[i])
        fi = soa.inertia_mul(mass_i, h_i, I_i, a[i]) + soa.crf(v[i], Iv)
        if f_ext is not None:
            n_b = soa.mv(E0[i], f_ext[i][0:3])
            f_b = soa.mv(E0[i], f_ext[i][3:6])
            fi = fi - soa.sv(n_b, f_b)
        f.append(fi)
    tau = [None] * (nb - 1)
    for i in range(nb - 1, 0, -1):
        S = _S(m, i, bs)
        tau[i - 1] = soa.dot(S * jnp.ones_like(f[i]), f[i])
        if armature is not None:
            tau[i - 1] = tau[i - 1] + armature[i - 1] * qdd[i - 1]
        p = m.parent[i]
        f[p] = f[p] + soa.inv_xform_force(E_up[i], p_up[i], f[i])
    return f[0], jnp.stack(tau) if tau else jnp.zeros((0,) + bs)


def crba(m, inertias, base_quat, dof_pos, armature=None):
    """Composite rigid-body algorithm: mass matrix (nv, nv)+bs.

    Row/col order: [base 6 dof (ang, lin in base coords); joints].
    `armature` adds reflected rotor inertia on each joint diagonal (MuJoCo
    semantics; reference deploy plant go2.xml:9 armature=0.01).
    """
    nb = m.nb
    bs = jnp.shape(base_quat)[1:]
    E_up, p_up, _, _ = joint_transforms(m, base_quat, dof_pos)
    Ic = [soa.inertia_to_mat66(*inertias[i]) for i in range(nb)]
    X = [None] + [soa.xform_to_mat66(E_up[i], p_up[i]) for i in range(1, nb)]
    for i in range(nb - 1, 0, -1):
        p = m.parent[i]
        Ic[p] = Ic[p] + soa.mtm(X[i], soa.mm(Ic[i], X[i]))
    nv = 6 + nb - 1
    H = jnp.zeros((nv, nv) + bs, dof_pos.dtype)
    H = H.at[0:6, 0:6].set(Ic[0])
    for i in range(1, nb):
        S = _S(m, i, bs) * jnp.ones((6,) + bs, dof_pos.dtype)
        F = soa.mv(Ic[i], S)
        d_ii = soa.dot(S, F)
        if armature is not None:
            d_ii = d_ii + armature[i - 1]
        H = H.at[6 + i - 1, 6 + i - 1].set(d_ii)
        j = i
        while m.parent[j] > 0:
            F = soa.mtv(X[j], F)
            j = m.parent[j]
            Sj = _S(m, j, bs) * jnp.ones((6,) + bs, dof_pos.dtype)
            val = soa.dot(Sj, F)
            H = H.at[6 + i - 1, 6 + j - 1].set(val)
            H = H.at[6 + j - 1, 6 + i - 1].set(val)
        F = soa.mtv(X[j], F)
        H = H.at[6 + i - 1, 0:6].set(F)
        H = H.at[0:6, 6 + i - 1].set(F)
    return H


def aba(m, inertias, base_quat, dof_pos, v_base, dof_vel, tau, f_ext=None,
        gravity=(0.0, 0.0, -9.81), armature=None):
    """Articulated-body forward dynamics.

    Args:
      inertias: list from body_inertias().
      tau: (ndof,)+bs joint torques.
      f_ext: optional (nb, 6)+bs per-body [n; f] world axes, body origins.
      armature: optional (ndof,) reflected rotor inertia added in joint space
        (MuJoCo `armature`; reference deploy plant go2.xml:9 uses 0.01).
    Returns: (a_base (6,)+bs true spatial accel in base coords, qdd).
    Gravity is an explicit per-body external wrench at the com, so returned
    accelerations are true coordinate accelerations.
    """
    nb = m.nb
    bs = jnp.shape(base_quat)[1:]
    dtype = dof_pos.dtype
    E_up, p_up, E0, p0 = joint_transforms(m, base_quat, dof_pos)
    g = soa.bcast(jnp.asarray(gravity, dtype), bs)

    S = [None] + [_S(m, i, bs) for i in range(1, nb)]
    v = [v_base]
    c = [jnp.zeros((6,) + bs, dtype)]
    for i in range(1, nb):
        p = m.parent[i]
        vJ = S[i] * dof_vel[i - 1]
        vi = soa.xform_motion(E_up[i], p_up[i], v[p]) + vJ
        v.append(vi)
        c.append(soa.crm(vi, vJ))

    IA = [soa.inertia_to_mat66(*inertias[i]) for i in range(nb)]
    pA = []
    ones3 = jnp.ones((3,) + bs, dtype)
    for i in range(nb):
        mass_i, h_i, I_i = inertias[i]
        Iv = soa.inertia_mul(mass_i, h_i, I_i, v[i])
        pa = soa.crf(v[i], Iv)
        # gravity at the com, expressed about the body origin in body axes
        g_b = soa.mv(E0[i], g * ones3)
        pa = pa - soa.sv(soa.cross(h_i * ones3, g_b), mass_i * g_b)
        if f_ext is not None:
            n_b = soa.mv(E0[i], f_ext[i][0:3])
            f_b = soa.mv(E0[i], f_ext[i][3:6])
            pa = pa - soa.sv(n_b, f_b)
        pA.append(pa)

    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, 0, -1):
        p = m.parent[i]
        Si = S[i] * jnp.ones((6,) + bs, dtype)
        U[i] = soa.mv(IA[i], Si)
        d[i] = soa.dot(Si, U[i])
        if armature is not None:
            d[i] = d[i] + armature[i - 1]
        u[i] = tau[i - 1] - soa.dot(Si, pA[i])
        Ia = IA[i] - soa.outer(U[i], U[i]) / d[i]
        pa = pA[i] + soa.mv(Ia, c[i]) + U[i] * (u[i] / d[i])
        X = soa.xform_to_mat66(E_up[i], p_up[i])
        IA[p] = IA[p] + soa.mtm(X, soa.mm(Ia, X))
        pA[p] = pA[p] + soa.inv_xform_force(E_up[i], p_up[i], pa)

    # floating base equilibrium: IA[0] a0 + pA[0] = 0
    a0 = soa.solve66(IA[0], -pA[0])

    a = [a0]
    qdd = [None] * (nb - 1)
    for i in range(1, nb):
        p = m.parent[i]
        ai = soa.xform_motion(E_up[i], p_up[i], a[p]) + c[i]
        qdd[i - 1] = (u[i] - soa.dot(U[i] * jnp.ones((6,) + bs, dtype), ai)) / d[i]
        a.append(ai + S[i] * qdd[i - 1])
    return a0, jnp.stack(qdd) if qdd else jnp.zeros((0,) + bs, dtype)
