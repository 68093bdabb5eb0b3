"""Parity: per-env local-patch terrain sampling (physics/patch.py) vs the
global-table samplers (physics/heightfield.py) it replaces in the hot loop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legged_gym_custom_tpu import physics as phys
from legged_gym_custom_tpu.physics import patch as patch_lib


@pytest.fixture(scope="module")
def hf():
    rng = np.random.default_rng(0)
    raw = (rng.integers(-40, 40, (300, 260))).astype(np.int16)
    return phys.from_raw(raw, horizontal_scale=0.1, vertical_scale=0.005,
                         border_size=2.0)


def _centers_and_points(hf, B, G, reach, seed=1):
    rng = np.random.default_rng(seed)
    R, C = hf.data.shape
    s, b = hf.horizontal_scale, hf.border_offset
    # keep both centers and queries well inside the table so global-border
    # clamping (identical semantics, different codepaths) is not in play
    cx = rng.uniform(3.0, (R - 1) * s - b - 3.0, B)
    cy = rng.uniform(3.0, (C - 1) * s - b - 3.0, B)
    px = cx[:, None] + rng.uniform(-reach, reach, (B, G))
    py = cy[:, None] + rng.uniform(-reach, reach, (B, G))
    return (jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
            jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32))


def test_surface_parity(hf):
    B, G, K = 64, 53, 24
    cx, cy, px, py = _centers_and_points(hf, B, G, reach=0.9)
    lp = patch_lib.extract(hf, cx, cy, K)
    h_p, (nx_p, ny_p, nz_p) = patch_lib.surface(lp, px, py)
    h_g, (nx_g, ny_g, nz_g) = phys.surface(hf, px, py)
    np.testing.assert_allclose(h_p, h_g, atol=1e-5)
    np.testing.assert_allclose(nx_p, nx_g, atol=1e-5)
    np.testing.assert_allclose(ny_p, ny_g, atol=1e-5)
    np.testing.assert_allclose(nz_p, nz_g, atol=1e-5)


def test_surface_cm_layout(hf):
    B, G, K = 16, 7, 24
    cx, cy, px, py = _centers_and_points(hf, B, G, reach=0.5, seed=2)
    lp = patch_lib.extract(hf, cx, cy, K)
    h_cm, (nx_cm, _, _) = patch_lib.surface_cm(lp, px.T, py.T)  # (G, B) in/out
    h_bl, (nx_bl, _, _) = patch_lib.surface(lp, px, py)
    np.testing.assert_allclose(h_cm, h_bl.T, atol=0)
    np.testing.assert_allclose(nx_cm, nx_bl.T, atol=0)


def test_min3_parity(hf):
    B, P, K = 64, 132, 40
    cx, cy, px, py = _centers_and_points(hf, B, P, reach=1.4, seed=3)
    lp = patch_lib.extract(hf, cx, cy, K)
    h_p = patch_lib.height_min3(lp, px, py)
    h_g = phys.height_min3(hf, px, py)
    np.testing.assert_allclose(h_p, h_g, atol=1e-6)


def test_engine_step_patch_vs_global(hf):
    """Full control_step parity: patch path vs patch_halfwidth=0 (global)."""
    B = 32
    model = phys.load_urdf(
        "/root/reference/resources/robots/go2/urdf/go2.urdf", "go2")
    ma = phys.model_arrays(model)
    DEF = np.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 1.0, -1.5, -0.1, 1.0, -1.5])
    pd = phys.PDParams(
        p_gains=jnp.full(12, 40.0), d_gains=jnp.full(12, 1.0),
        default_dof_pos=jnp.asarray(DEF, jnp.float32),
        torque_limits=jnp.asarray(model.dof_effort_limits, jnp.float32),
        action_scale=0.25)
    lims = (jnp.asarray(model.dof_pos_limits[:, 0], jnp.float32),
            jnp.asarray(model.dof_pos_limits[:, 1], jnp.float32),
            jnp.asarray(model.dof_vel_limits, jnp.float32))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    R, C = hf.data.shape
    s, b = hf.horizontal_scale, hf.border_offset
    state = phys.PhysicsState(
        base_pos=jnp.stack([
            jax.random.uniform(ks[0], (B,), minval=4.0, maxval=(R - 1) * s - b - 4.0),
            jax.random.uniform(ks[1], (B,), minval=4.0, maxval=(C - 1) * s - b - 4.0),
            jnp.full((B,), 0.6),
        ]),
        base_quat=jnp.zeros((4, B)).at[0].set(1.0),
        lin_vel=jax.random.normal(ks[2], (3, B)) * 0.3,
        ang_vel=jax.random.normal(ks[3], (3, B)) * 0.3,
        dof_pos=jnp.asarray(DEF)[:, None] + jax.random.normal(ks[4], (12, B)) * 0.1,
        dof_vel=jax.random.normal(ks[5], (12, B)) * 1.0,
    )
    dr = phys.DomainRandParams(
        friction=jnp.ones(B), added_mass=jnp.zeros(B), com_offset=jnp.zeros((3, B)),
        kp_mult=jnp.ones((12, B)), kd_mult=jnp.ones((12, B)))
    actions = jnp.zeros((12, B))
    p_patch = phys.SimParams()
    p_glob = p_patch._replace(patch_halfwidth=0.0)
    s1, i1, _ = jax.jit(
        lambda st, a: phys.control_step(ma, hf, p_patch, pd, dr, lims, st, a)
    )(state, actions)
    s2, i2, _ = jax.jit(
        lambda st, a: phys.control_step(ma, hf, p_glob, pd, dr, lims, st, a)
    )(state, actions)
    np.testing.assert_allclose(s1.base_pos, s2.base_pos, atol=1e-4)
    np.testing.assert_allclose(s1.dof_pos, s2.dof_pos, atol=1e-4)
    np.testing.assert_allclose(i1.link_forces, i2.link_forces, atol=2e-2)
