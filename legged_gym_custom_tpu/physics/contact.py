"""Penalty contact of the robot's collision sphere set against the heightfield.

Replaces the PhysX TGS contact solver (reference legged_robot_config.py:189-200)
with a compliant spring-damper normal force + regularized Coulomb friction —
the standard massively-batched-sim contact model, fully branchless and
vmap/jit friendly.  Restitution is 0 as in the reference terrain config
(legged_robot_config.py:30).

Friction combines the per-env randomized shape friction (reference
legged_robot.py:318-328, buckets in domain_rand.friction_range) with the
terrain friction using PhysX's default *average* combine mode.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import heightfield as hfield
from .algorithms import ModelArrays


class ContactParams(NamedTuple):
    # Gains sized for explicit integration at the engine's substep dt with the
    # lightest contacting body (the 0.19 kg calf+foot): stability needs
    # c*dt/m_eff < 2 and sqrt(k/m_eff)*dt << 2 (see tests/test_engine.py).
    stiffness: float = 8000.0    # [N/m] normal penetration spring
    damping: float = 150.0       # [N s/m] normal velocity damping
    friction_vel: float = 250.0  # [N s/m] tangential viscous slope (pre-saturation)
    terrain_friction: float = 1.0  # combined (averaged) with per-env friction


class ContactOutput(NamedTuple):
    geom_force: jnp.ndarray    # (ng, 3) world-frame force on each sphere
    body_wrench: jnp.ndarray   # (nb, 6) [n; f] world axes about body origins
    link_force: jnp.ndarray    # (n_links, 3) net world force per report link


def compute_contacts(
    ma: ModelArrays,
    hf: hfield.Heightfield,
    params: ContactParams,
    friction: jnp.ndarray,     # () per-env combined-shape friction coefficient
    E0: list,                  # per-body R_{body<-world}
    p0w: list,                 # per-body world origin positions
    v_body: list,              # per-body spatial velocity in body coords
) -> ContactOutput:
    ng = ma.geom_pos.shape[0]
    dtype = ma.geom_pos.dtype

    # world positions / velocities of all sphere centers (stacked over geoms)
    R_wb = jnp.stack([E0[i].T for i in range(ma.nb)])        # (nb,3,3)
    p_w = jnp.stack(p0w)                                     # (nb,3)
    w_b = jnp.stack([v_body[i][0:3] for i in range(ma.nb)])  # (nb,3)
    u_b = jnp.stack([v_body[i][3:6] for i in range(ma.nb)])  # (nb,3)

    Rg = R_wb[ma.geom_body]                                  # (ng,3,3)
    centers = p_w[ma.geom_body] + jnp.einsum("gij,gj->gi", Rg, ma.geom_pos)
    vel_b = u_b[ma.geom_body] + jnp.cross(w_b[ma.geom_body], ma.geom_pos)
    vel_w = jnp.einsum("gij,gj->gi", Rg, vel_b)              # (ng,3)

    h, n = hfield.surface(hf, centers[:, 0], centers[:, 1])  # (ng,), (ng,3)
    # penetration depth along the surface normal
    depth = ma.geom_radius - n[:, 2] * (centers[:, 2] - h)
    active = depth > 0.0

    vn = jnp.sum(vel_w * n, axis=-1)
    vt = vel_w - vn[:, None] * n
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    fn = jnp.maximum(params.stiffness * depth - params.damping * vn, 0.0)
    fn = jnp.where(active, fn, 0.0)

    mu = 0.5 * (friction + params.terrain_friction)
    ft_mag = jnp.minimum(params.friction_vel * vt_norm, mu * fn)
    t_dir = vt / (vt_norm[:, None] + 1e-6)
    force = fn[:, None] * n - ft_mag[:, None] * t_dir        # (ng,3) world

    # accumulate per-body wrenches about body origins (world axes)
    arm = centers - p_w[ma.geom_body]
    torque = jnp.cross(arm, force)
    wrench = jnp.concatenate([torque, force], axis=-1)       # (ng,6)
    body_wrench = jnp.zeros((ma.nb, 6), dtype=dtype).at[ma.geom_body].add(wrench)

    link_force = jnp.zeros((ma.n_links, 3), dtype=dtype).at[ma.geom_link].add(force)
    return ContactOutput(force, body_wrench, link_force)
