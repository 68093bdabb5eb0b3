"""Penalty contact of the robot's collision sphere set against the heightfield.

Replaces the PhysX TGS contact solver (reference legged_robot_config.py:189-200)
with a compliant spring-damper normal force + regularized Coulomb friction —
the standard massively-batched-sim contact model, fully branchless and
jit friendly.  Restitution is 0 as in the reference terrain config
(legged_robot_config.py:30).

Friction combines the per-env randomized shape friction (reference
legged_robot.py:318-328, buckets in domain_rand.friction_range) with the
terrain friction using PhysX's default *average* combine mode.

Layout: component-major with trailing batch (physics/soa.py): per-geom arrays
are (ng, 3)+bs so the env batch rides the vector lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import heightfield as hfield
from . import patch
from .algorithms import ModelArrays


class ContactParams(NamedTuple):
    # Gains sized for explicit integration at the engine's substep dt with the
    # lightest contacting body (the 0.19 kg calf+foot): stability needs
    # c*dt/m_eff < 2 and sqrt(k/m_eff)*dt << 2 (see tests/test_engine.py).
    stiffness: float = 6000.0    # [N/m] normal penetration spring
    damping: float = 100.0       # [N s/m] normal velocity damping
    friction_vel: float = 80.0   # [N s/m] tangential viscous slope (pre-saturation)
    terrain_friction: float = 1.0  # combined (averaged) with per-env friction


class ContactOutput(NamedTuple):
    geom_force: jnp.ndarray    # (ng, 3)+bs world-frame force on each sphere
    body_wrench: jnp.ndarray   # (nb, 6)+bs [n; f] world axes about body origins
    link_force: jnp.ndarray    # (n_links, 3)+bs net world force per report link


def geom_centers(ma: ModelArrays, E0: list, p0w: list) -> jnp.ndarray:
    """World positions of all collision-sphere centers, (ng, 3)+bs."""
    bs = jnp.shape(p0w[0])[1:]
    R_wb = jnp.stack([jnp.swapaxes(E0[i], 0, 1) for i in range(ma.nb)])
    p_w = jnp.stack(p0w)
    gpos = ma.geom_pos.reshape(ma.geom_pos.shape + (1,) * len(bs))
    Rg = R_wb[ma.geom_body]
    return p_w[ma.geom_body] + jnp.einsum(
        "gij...,gj...->gi...", Rg, gpos * jnp.ones_like(p_w[ma.geom_body])
    )


def sample_surface(ma: ModelArrays, hf, centers: jnp.ndarray):
    """Terrain surface (h, (nx, ny, nz)) under each collision sphere.

    Used by the engine to freeze the contact surface once per decimation
    tick (the reference plant's PhysX runs collision detection per 200 Hz
    sim step, legged_robot.py:79-85 — not per solver substep), which also
    cuts terrain sampling cost 'substeps'-fold.
    """
    if isinstance(hf, patch.LocalPatch):
        return patch.surface_cm(hf, centers[:, 0], centers[:, 1])
    return hfield.surface(hf, centers[:, 0], centers[:, 1])


def compute_contacts(
    ma: ModelArrays,
    hf,  # Heightfield (global table) or patch.LocalPatch (per-env window)
    params: ContactParams,
    friction: jnp.ndarray,     # ()+bs per-env shape friction coefficient
    E0: list,                  # per-body R_{body<-world}, (3,3)+bs
    p0w: list,                 # per-body world origin positions, (3,)+bs
    v_body: list,              # per-body spatial velocity (body coords), (6,)+bs
    surface=None,              # optional precomputed (h, (nx, ny, nz)) per geom
) -> ContactOutput:
    dtype = ma.geom_pos.dtype
    bs = jnp.shape(p0w[0])[1:]

    R_wb = jnp.stack([jnp.swapaxes(E0[i], 0, 1) for i in range(ma.nb)])  # (nb,3,3)+bs
    p_w = jnp.stack(p0w)                                   # (nb,3)+bs
    w_b = jnp.stack([v[0:3] for v in v_body])              # (nb,3)+bs
    u_b = jnp.stack([v[3:6] for v in v_body])              # (nb,3)+bs

    Rg = R_wb[ma.geom_body]                                # (ng,3,3)+bs
    gpos = ma.geom_pos.reshape(ma.geom_pos.shape + (1,) * len(bs))  # (ng,3,1..)
    centers = p_w[ma.geom_body] + jnp.einsum("gij...,gj...->gi...", Rg, gpos * jnp.ones_like(p_w[ma.geom_body]))
    vel_b = u_b[ma.geom_body] + jnp.cross(
        w_b[ma.geom_body], gpos * jnp.ones_like(u_b[ma.geom_body]), axisa=1, axisb=1, axisc=1
    )
    vel_w = jnp.einsum("gij...,gj...->gi...", Rg, vel_b)   # (ng,3)+bs

    if surface is not None:
        h, n = surface
    elif isinstance(hf, patch.LocalPatch):
        # per-env patch: samples are matmuls against the resident window
        # instead of global-table gathers (physics/patch.py)
        h, n = patch.surface_cm(hf, centers[:, 0], centers[:, 1])
    else:
        h, n = hfield.surface(hf, centers[:, 0], centers[:, 1])  # (ng,)+bs x3
    nx, ny, nz = n
    radius = ma.geom_radius.reshape(ma.geom_radius.shape + (1,) * len(bs))
    depth = radius - nz * (centers[:, 2] - h)
    active = depth > 0.0

    vn = vel_w[:, 0] * nx + vel_w[:, 1] * ny + vel_w[:, 2] * nz
    n_vec = jnp.stack([nx, ny, nz], axis=1)                # (ng,3)+bs
    vt = vel_w - vn[:, None] * n_vec
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=1))

    fn = jnp.maximum(params.stiffness * depth - params.damping * vn, 0.0)
    fn = jnp.where(active, fn, 0.0)

    mu = 0.5 * (friction + params.terrain_friction)
    ft_mag = jnp.minimum(params.friction_vel * vt_norm, mu * fn)
    t_dir = vt / (vt_norm[:, None] + 1e-6)
    force = fn[:, None] * n_vec - ft_mag[:, None] * t_dir  # (ng,3)+bs world

    arm = centers - p_w[ma.geom_body]
    torque = jnp.cross(arm, force, axisa=1, axisb=1, axisc=1)
    wrench = jnp.concatenate([torque, force], axis=1)      # (ng,6)+bs
    body_wrench = jnp.zeros((ma.nb, 6) + bs, dtype).at[ma.geom_body].add(wrench)
    link_force = jnp.zeros((ma.n_links, 3) + bs, dtype).at[ma.geom_link].add(force)
    return ContactOutput(force, body_wrench, link_force)
