"""Cross-validate RNEA / CRBA / ABA against MuJoCo on the Go2 model.

The MuJoCo model is generated from *our* parsed RobotModel (model.to_mjcf), so
masses/joints are identical by construction and MuJoCo acts as an independent
oracle for the smooth dynamics — the verification strategy SURVEY §4 calls
for ("dynamics vs. MuJoCo step-by-step").

Conventions used for the mapping (MuJoCo free joint):
  qvel[0:3] = linear velocity of the body origin in WORLD coords,
  qvel[3:6] = angular velocity in BODY coords.
Our generalized velocity: [omega_body; v_body(origin); qd].
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from legged_gym_custom_tpu.physics import algorithms as alg
from legged_gym_custom_tpu.physics import spatial as sp
from legged_gym_custom_tpu.physics.urdf import load_urdf

GO2_URDF = "/root/reference/resources/robots/go2/urdf/go2.urdf"

@pytest.fixture(scope="module", autouse=True)
def _x64():
    """Run this module in float64 (oracle-grade comparison), restore after."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup():
    model = load_urdf(GO2_URDF, "go2")
    mjm = mujoco.MjModel.from_xml_string(model.to_mjcf())
    ma = alg.model_arrays(model, jnp.float64)
    return model, mjm, ma


def _rand_state(rng, model):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    pos = rng.normal(size=3)
    dof_pos = rng.uniform(model.dof_pos_limits[:, 0], model.dof_pos_limits[:, 1])
    v_world = rng.normal(size=3)
    w_body = rng.normal(size=3)
    dof_vel = rng.normal(size=12)
    return pos, q, v_world, w_body, dof_pos, dof_vel


def _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, dof_vel):
    mjd.qpos[:3] = pos
    mjd.qpos[3:7] = q  # wxyz, same as mujoco
    mjd.qpos[7:] = dof_pos
    mjd.qvel[:3] = v_world
    mjd.qvel[3:6] = w_body
    mjd.qvel[6:] = dof_vel


def _my_vbase(q, v_world, w_body):
    Rm = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
    v_body = Rm.T @ v_world
    return jnp.asarray(np.concatenate([w_body, v_body]))


def test_velocity_convention(setup, rng):
    """Confirm the assumed MuJoCo free-joint velocity convention via cvel."""
    model, mjm, ma = setup
    mjd = mujoco.MjData(mjm)
    pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
    _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, np.zeros(12))
    mujoco.mj_forward(mjm, mjd)
    Rm = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
    # cvel of base body (body 1; 0 is world): [ang; lin] in world frame about
    # the body's c-frame origin (subtree com).
    cvel = mjd.cvel[1]
    np.testing.assert_allclose(cvel[:3], Rm @ w_body, atol=1e-9)


def test_mass_matrix_vs_mujoco(setup, rng):
    model, mjm, ma = setup
    mjd = mujoco.MjData(mjm)
    for _ in range(3):
        pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
        _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, dof_vel)
        mujoco.mj_forward(mjm, mjd)
        M_mj = np.zeros((mjm.nv, mjm.nv))
        mujoco.mj_fullM(mjm, mjd, M_mj)

        inertias = alg.body_inertias(ma)
        H = np.asarray(alg.crba(ma, inertias, jnp.asarray(q), jnp.asarray(dof_pos)))

        # Map generalized velocities: mine = T @ mujoco's
        Rm = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
        for _ in range(5):
            u_mj = rng.normal(size=18)
            u_mine = np.concatenate([u_mj[3:6], Rm.T @ u_mj[0:3], u_mj[6:]])
            e_mj = u_mj @ M_mj @ u_mj
            e_mine = u_mine @ H @ u_mine
            np.testing.assert_allclose(e_mine, e_mj, rtol=1e-6)


def test_aba_vs_mujoco(setup, rng):
    model, mjm, ma = setup
    mjd = mujoco.MjData(mjm)
    for _ in range(5):
        pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
        tau = rng.normal(size=12) * 5.0
        _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, dof_vel)
        mjd.qfrc_applied[:] = 0.0
        mjd.qfrc_applied[6:] = tau
        # external contact-like force at a world point on a body
        fpt_body = 3  # FL_calf
        point = mjd.qpos[:3] + np.array([0.1, 0.05, -0.2])
        force = rng.normal(size=3) * 20.0
        mujoco.mj_forward(mjm, mjd)
        mujoco.mj_applyFT(
            mjm, mjd, force, np.zeros(3), point, fpt_body + 1, mjd.qfrc_applied
        )
        mujoco.mj_forward(mjm, mjd)
        qacc = mjd.qacc.copy()

        # mine: express the same external force about the body origin
        v_base = _my_vbase(q, v_world, w_body)
        E_up, p_up, E0, p0 = alg.joint_transforms(ma, jnp.asarray(q), jnp.asarray(dof_pos))
        body_origin_w = pos + np.asarray(E0[fpt_body]).T @ np.zeros(3) + np.asarray(p0[fpt_body])
        n_w = np.cross(point - body_origin_w, force)
        f_ext = np.zeros((13, 6))
        f_ext[fpt_body] = np.concatenate([n_w, force])

        inertias = alg.body_inertias(ma)
        a0, qdd = alg.aba(
            ma,
            inertias,
            jnp.asarray(q),
            jnp.asarray(dof_pos),
            v_base,
            jnp.asarray(dof_vel),
            jnp.asarray(tau),
            f_ext=jnp.asarray(f_ext),
        )
        a0 = np.asarray(a0)
        qdd_mine = np.asarray(qdd)

        Rm = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
        w_b = np.asarray(v_base[:3])
        u_b = np.asarray(v_base[3:])
        # qacc linear = d/dt v_world = R (udot + w x u)
        qacc_lin_mine = Rm @ (a0[3:] + np.cross(w_b, u_b))
        np.testing.assert_allclose(qacc_lin_mine, qacc[0:3], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a0[:3], qacc[3:6], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(qdd_mine, qacc[6:], rtol=1e-5, atol=1e-4)


def test_full_plant_vs_mujoco(setup, rng):
    """ABA/CRBA with armature + viscous joint damping vs the NON-zeroed
    MuJoCo model (the reference deploy plant's go2.xml:9 values) — the
    round-4 plant-fidelity check (VERDICT r3 missing #1).

    frictionloss is excluded here: MuJoCo resolves it in the constraint
    solver, not smooth forward dynamics; its smooth surrogate is validated in
    tests/test_engine.py::test_joint_passive_dynamics.
    """
    model, _, ma = setup
    damping, armature = 0.1, 0.01
    mjm = mujoco.MjModel.from_xml_string(
        model.to_mjcf(joint_damping=damping, joint_armature=armature)
    )
    mjd = mujoco.MjData(mjm)
    arm = jnp.full(12, armature, jnp.float64)
    for _ in range(3):
        pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
        tau = rng.normal(size=12) * 5.0
        _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, dof_vel)
        mjd.qfrc_applied[:] = 0.0
        mjd.qfrc_applied[6:] = tau
        mujoco.mj_forward(mjm, mjd)
        qacc = mjd.qacc.copy()
        M_mj = np.zeros((mjm.nv, mjm.nv))
        mujoco.mj_fullM(mjm, mjd, M_mj)

        # mass matrix including armature
        inertias = alg.body_inertias(ma)
        H = np.asarray(
            alg.crba(ma, inertias, jnp.asarray(q), jnp.asarray(dof_pos), armature=arm)
        )
        Rm = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
        u_mj = rng.normal(size=18)
        u_mine = np.concatenate([u_mj[3:6], Rm.T @ u_mj[0:3], u_mj[6:]])
        np.testing.assert_allclose(u_mine @ H @ u_mine, u_mj @ M_mj @ u_mj, rtol=1e-6)

        # forward dynamics: damping enters as an explicit joint torque
        # (engine._joint_passive_torque), armature via the ABA joint-space term
        v_base = _my_vbase(q, v_world, w_body)
        tau_eff = jnp.asarray(tau) - damping * jnp.asarray(dof_vel)
        a0, qdd = alg.aba(
            ma, inertias, jnp.asarray(q), jnp.asarray(dof_pos), v_base,
            jnp.asarray(dof_vel), tau_eff, armature=arm,
        )
        a0 = np.asarray(a0)
        w_b = np.asarray(v_base[:3])
        u_b = np.asarray(v_base[3:])
        qacc_lin_mine = Rm @ (a0[3:] + np.cross(w_b, u_b))
        np.testing.assert_allclose(qacc_lin_mine, qacc[0:3], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a0[:3], qacc[3:6], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qdd), qacc[6:], rtol=1e-5, atol=1e-4)


def test_rnea_aba_roundtrip(setup, rng):
    """Inverse dynamics of forward dynamics recovers the torques."""
    model, mjm, ma = setup
    pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
    tau = jnp.asarray(rng.normal(size=12) * 3.0)
    v_base = _my_vbase(q, v_world, w_body)
    inertias = alg.body_inertias(ma)
    a0, qdd = alg.aba(
        ma, inertias, jnp.asarray(q), jnp.asarray(dof_pos), v_base, jnp.asarray(dof_vel), tau
    )
    f0, tau_rec = alg.rnea(
        ma, inertias, jnp.asarray(q), jnp.asarray(dof_pos), v_base, jnp.asarray(dof_vel), a0, qdd
    )
    np.testing.assert_allclose(np.asarray(tau_rec), np.asarray(tau), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f0), np.zeros(6), atol=1e-8)


def test_bias_vs_mujoco(setup, rng):
    model, mjm, ma = setup
    mjd = mujoco.MjData(mjm)
    pos, q, v_world, w_body, dof_pos, dof_vel = _rand_state(rng, model)
    _set_mj_state(mjm, mjd, pos, q, v_world, w_body, dof_pos, dof_vel)
    mujoco.mj_forward(mjm, mjd)
    bias_mj = mjd.qfrc_bias.copy()

    v_base = _my_vbase(q, v_world, w_body)
    # MuJoCo's qacc=0 motion in our coordinates: w_dot=0, v_world_dot=0
    # => u_b_dot = -w_b x u_b.
    w_b = np.asarray(v_base[:3])
    u_b = np.asarray(v_base[3:])
    qdd_base = jnp.asarray(np.concatenate([np.zeros(3), -np.cross(w_b, u_b)]))
    inertias = alg.body_inertias(ma)
    f0, tau_b = alg.rnea(
        ma,
        inertias,
        jnp.asarray(q),
        jnp.asarray(dof_pos),
        v_base,
        jnp.asarray(dof_vel),
        qdd_base,
        jnp.zeros(12, dtype=jnp.float64),
    )
    np.testing.assert_allclose(np.asarray(tau_b), bias_mj[6:], rtol=1e-6, atol=1e-8)
