"""Sim-to-sim parity: the TPU engine vs MuJoCo over a contact-rich horizon.

The reference's deploy pipeline uses MuJoCo as the independent physics oracle
(SURVEY §2.4, BASELINE.md "Sim-to-sim parity").  Contact models differ
(penalty vs MuJoCo's soft constraints), so this is a tolerance-based check on
trajectories, not bit-equality: a PD-held Go2 dropped on flat ground must
settle to the same stance in both sims.
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from legged_gym_custom_tpu import physics as phys

GO2_URDF = "/root/reference/resources/robots/go2/urdf/go2.urdf"
DEFAULT_ANGLES = np.array(
    [0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 1.0, -1.5, -0.1, 1.0, -1.5]
)


def test_standing_parity_vs_mujoco():
    model = phys.load_urdf(GO2_URDF, "go2")
    ma = phys.model_arrays(model)
    pd = phys.PDParams(
        p_gains=jnp.full(12, 40.0),
        d_gains=jnp.full(12, 1.0),
        default_dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        torque_limits=jnp.asarray(model.dof_effort_limits, jnp.float32),
        action_scale=0.25,
    )
    dof_limits = (
        jnp.asarray(model.dof_pos_limits[:, 0], jnp.float32),
        jnp.asarray(model.dof_pos_limits[:, 1], jnp.float32),
        jnp.asarray(model.dof_vel_limits, jnp.float32),
    )
    dr = phys.DomainRandParams(
        friction=jnp.float32(1.0), added_mass=jnp.float32(0.0),
        com_offset=jnp.zeros(3), kp_mult=jnp.ones(12), kd_mult=jnp.ones(12),
    )
    params = phys.SimParams()
    hf = phys.plane()
    z0 = 0.33

    # --- TPU engine rollout ---
    st = phys.PhysicsState(
        base_pos=jnp.array([0.0, 0.0, z0]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.zeros(3),
        dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        dof_vel=jnp.zeros(12),
    )
    step = jax.jit(
        lambda s: phys.control_step(ma, hf, params, pd, dr, dof_limits, s, jnp.zeros(12))
    )
    traj_mine = []
    for _ in range(75):  # 1.5 s
        st, info, _ = step(st)
        traj_mine.append(
            np.concatenate([np.asarray(st.base_pos), np.asarray(st.dof_pos)])
        )
    traj_mine = np.asarray(traj_mine)

    # --- MuJoCo rollout, same PD law at 200 Hz ---
    mjm = mujoco.MjModel.from_xml_string(model.to_mjcf(contact=True, friction=1.0))
    mjd = mujoco.MjData(mjm)
    mjd.qpos[:3] = [0, 0, z0]
    mjd.qpos[3:7] = [1, 0, 0, 0]
    mjd.qpos[7:] = DEFAULT_ANGLES
    traj_mj = []
    for i in range(75):
        for _ in range(4):  # decimation at 200 Hz like the engine
            q = mjd.qpos[7:]
            dq = mjd.qvel[6:]
            tau = 40.0 * (DEFAULT_ANGLES - q) - 1.0 * dq
            mjd.qfrc_applied[:] = 0.0
            mjd.qfrc_applied[6:] = np.clip(
                tau, -model.dof_effort_limits, model.dof_effort_limits
            )
            mujoco.mj_step(mjm, mjd)
        traj_mj.append(np.concatenate([mjd.qpos[:3].copy(), mjd.qpos[7:].copy()]))
    traj_mj = np.asarray(traj_mj)

    # settled states agree: base height within 2 cm, joints within 0.1 rad
    z_mine = traj_mine[-25:, 2].mean()
    z_mj = traj_mj[-25:, 2].mean()
    assert abs(z_mine - z_mj) < 0.02, (z_mine, z_mj)
    q_mine = traj_mine[-1, 3:]
    q_mj = traj_mj[-1, 3:]
    np.testing.assert_allclose(q_mine, q_mj, atol=0.1)
    # transient: height trajectories track within 4 cm everywhere
    assert np.max(np.abs(traj_mine[:, 2] - traj_mj[:, 2])) < 0.04
    # xy drift small in both
    assert np.linalg.norm(traj_mine[-1, :2]) < 0.05
    assert np.linalg.norm(traj_mj[-1, :2]) < 0.05


def test_full_plant_parity():
    """Round-4 plant fidelity (VERDICT r3 missing #1): the go2 training plant
    (stiff overdamped contact + joint damping/armature/frictionloss from
    go2.xml:9) vs the NON-zeroed MuJoCo model over a contact transient.

    Tighter than the legacy test above: the stiff contact should track the
    hard-contact oracle's height transient within 2 cm and settle within 1 cm.
    """
    model = phys.load_urdf(GO2_URDF, "go2")
    ma = phys.model_arrays(model)
    pd = phys.PDParams(
        p_gains=jnp.full(12, 40.0),
        d_gains=jnp.full(12, 1.0),
        default_dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        torque_limits=jnp.asarray(model.dof_effort_limits, jnp.float32),
        action_scale=0.25,
    )
    dof_limits = (
        jnp.asarray(model.dof_pos_limits[:, 0], jnp.float32),
        jnp.asarray(model.dof_pos_limits[:, 1], jnp.float32),
        jnp.asarray(model.dof_vel_limits, jnp.float32),
    )
    dr = phys.DomainRandParams(
        friction=jnp.float32(1.0), added_mass=jnp.float32(0.0),
        com_offset=jnp.zeros(3), kp_mult=jnp.ones(12), kd_mult=jnp.ones(12),
    )
    damping, armature, frictionloss = 0.1, 0.01, 0.2
    params = phys.SimParams(
        substeps=4,
        contact=phys.ContactParams(
            stiffness=40000.0, damping=250.0, friction_vel=250.0,
            terrain_friction=1.0,
        ),
        dof_damping=jnp.full(12, damping),
        dof_armature=jnp.full(12, armature),
        dof_frictionloss=jnp.full(12, frictionloss),
    )
    hf = phys.plane()
    z0 = 0.36  # small drop => contact transient

    st = phys.PhysicsState(
        base_pos=jnp.array([0.0, 0.0, z0]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.zeros(3),
        dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        dof_vel=jnp.zeros(12),
    )
    step = jax.jit(
        lambda s: phys.control_step(ma, hf, params, pd, dr, dof_limits, s, jnp.zeros(12))
    )
    traj_mine = []
    for _ in range(100):  # 2 s
        st, info, _ = step(st)
        traj_mine.append(
            np.concatenate([np.asarray(st.base_pos), np.asarray(st.dof_pos)])
        )
    traj_mine = np.asarray(traj_mine)

    mjm = mujoco.MjModel.from_xml_string(
        model.to_mjcf(
            contact=True, friction=1.0, joint_damping=damping,
            joint_armature=armature, joint_frictionloss=frictionloss,
        )
    )
    mjd = mujoco.MjData(mjm)
    mjd.qpos[:3] = [0, 0, z0]
    mjd.qpos[3:7] = [1, 0, 0, 0]
    mjd.qpos[7:] = DEFAULT_ANGLES
    traj_mj = []
    for i in range(100):
        for _ in range(4):
            q = mjd.qpos[7:]
            dq = mjd.qvel[6:]
            tau = 40.0 * (DEFAULT_ANGLES - q) - 1.0 * dq
            mjd.qfrc_applied[:] = 0.0
            mjd.qfrc_applied[6:] = np.clip(
                tau, -model.dof_effort_limits, model.dof_effort_limits
            )
            mujoco.mj_step(mjm, mjd)
        traj_mj.append(np.concatenate([mjd.qpos[:3].copy(), mjd.qpos[7:].copy()]))
    traj_mj = np.asarray(traj_mj)

    z_mine = traj_mine[-25:, 2].mean()
    z_mj = traj_mj[-25:, 2].mean()
    assert abs(z_mine - z_mj) < 0.01, (z_mine, z_mj)
    np.testing.assert_allclose(traj_mine[-1, 3:], traj_mj[-1, 3:], atol=0.05)
    assert np.max(np.abs(traj_mine[:, 2] - traj_mj[:, 2])) < 0.02, \
        np.max(np.abs(traj_mine[:, 2] - traj_mj[:, 2]))
    assert np.linalg.norm(traj_mine[-1, :2]) < 0.05
    assert np.linalg.norm(traj_mj[-1, :2]) < 0.05


def _plant(frictionloss_implicit: bool):
    """The round-4 go2 full plant, with either frictionloss model."""
    model = phys.load_urdf(GO2_URDF, "go2")
    ma = phys.model_arrays(model)
    pd = phys.PDParams(
        p_gains=jnp.full(12, 40.0),
        d_gains=jnp.full(12, 1.0),
        default_dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        torque_limits=jnp.asarray(model.dof_effort_limits, jnp.float32),
        action_scale=0.25,
    )
    dof_limits = (
        jnp.asarray(model.dof_pos_limits[:, 0], jnp.float32),
        jnp.asarray(model.dof_pos_limits[:, 1], jnp.float32),
        jnp.asarray(model.dof_vel_limits, jnp.float32),
    )
    dr = phys.DomainRandParams(
        friction=jnp.float32(1.0), added_mass=jnp.float32(0.0),
        com_offset=jnp.zeros(3), kp_mult=jnp.ones(12), kd_mult=jnp.ones(12),
    )
    params = phys.SimParams(
        substeps=4,
        contact=phys.ContactParams(
            stiffness=40000.0, damping=250.0, friction_vel=250.0,
            terrain_friction=1.0,
        ),
        dof_damping=jnp.full(12, 0.1),
        dof_armature=jnp.full(12, 0.01),
        dof_frictionloss=jnp.full(12, 0.2),
        frictionloss_implicit=frictionloss_implicit,
        dof_meff=phys.effective_joint_inertia(
            ma, DEFAULT_ANGLES, armature=jnp.full(12, 0.01)
        )
        if frictionloss_implicit
        else None,
    )
    return model, ma, pd, dof_limits, dr, params


def test_rest_stiction_vs_mujoco():
    """Implicit Coulomb stiction (VERDICT r4 missing #2): standing with zero
    command, the settled joint angles — and therefore the PD holding
    torques — must match the MuJoCo oracle, whose constraint-based
    frictionloss (go2.xml:9) lets friction carry part of the gravity load at
    rest.  The tanh surrogate cannot do this (tanh(0)=0): it settles where
    PD+gravity balance alone, a measurably different pose.  Asserts the
    implicit plant (a) matches MuJoCo's settled pose and torques, (b) is
    strictly closer to the oracle than the tanh plant, (c) is truly at rest.
    """
    model, ma, pd, dof_limits, dr, params_imp = _plant(True)
    _, _, _, _, _, params_tanh = _plant(False)
    hf = phys.plane()
    z0 = 0.36

    def settle(params):
        st = phys.PhysicsState(
            base_pos=jnp.array([0.0, 0.0, z0]),
            base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
            lin_vel=jnp.zeros(3),
            ang_vel=jnp.zeros(3),
            dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
            dof_vel=jnp.zeros(12),
        )
        step = jax.jit(
            lambda s: phys.control_step(
                ma, hf, params, pd, dr, dof_limits, s, jnp.zeros(12)
            )
        )
        for _ in range(150):  # 3 s
            st, info, _ = step(st)
        return np.asarray(st.dof_pos), np.asarray(st.dof_vel)

    q_imp, qd_imp = settle(params_imp)
    q_tanh, _ = settle(params_tanh)

    mjm = mujoco.MjModel.from_xml_string(
        model.to_mjcf(
            contact=True, friction=1.0, joint_damping=0.1,
            joint_armature=0.01, joint_frictionloss=0.2,
        )
    )
    mjd = mujoco.MjData(mjm)
    mjd.qpos[:3] = [0, 0, z0]
    mjd.qpos[3:7] = [1, 0, 0, 0]
    mjd.qpos[7:] = DEFAULT_ANGLES
    for _ in range(150 * 4):
        q = mjd.qpos[7:]
        dq = mjd.qvel[6:]
        tau = 40.0 * (DEFAULT_ANGLES - q) - 1.0 * dq
        mjd.qfrc_applied[:] = 0.0
        mjd.qfrc_applied[6:] = np.clip(
            tau, -model.dof_effort_limits, model.dof_effort_limits
        )
        mujoco.mj_step(mjm, mjd)
    q_mj = mjd.qpos[7:].copy()

    # (a) settled pose matches the oracle => PD holding torques match:
    # |dtau| = kp * |dq| <= 40 * 0.02 = 0.8 N m on a 23 N m-limit joint
    np.testing.assert_allclose(q_imp, q_mj, atol=0.02)
    # (b) strictly closer than the tanh surrogate on the joints where the
    # models disagree measurably (calf joints carry the largest load)
    err_imp = np.abs(q_imp - q_mj).max()
    err_tanh = np.abs(q_tanh - q_mj).max()
    assert err_imp < err_tanh, (err_imp, err_tanh)
    # (c) truly at rest — no creep (the tanh plant's rest velocity is the
    # equilibrium of fl*tanh(qd/eps) against residual torque, not zero)
    assert np.abs(qd_imp).max() < 0.05, np.abs(qd_imp).max()


def test_stiction_holds_subthreshold_torque():
    """Gravity-free isolation: a constant applied torque BELOW frictionloss
    on one joint must not move the implicit-stiction plant at all, while
    the tanh plant creeps indefinitely (its friction vanishes at qd=0).
    (Single joint so the free base's reaction spin stays negligible — with
    all 12 torqued, the base slowly spins up and Coriolis coupling muddies
    the isolation; the standing-on-ground case is test_rest_stiction_*.)"""
    model, ma, pd, dof_limits, dr, params_imp = _plant(True)
    _, _, _, _, _, params_tanh = _plant(False)
    pd = pd._replace(control_type="T", action_scale=1.0)
    params_imp = params_imp._replace(gravity=(0.0, 0.0, 0.0))
    params_tanh = params_tanh._replace(gravity=(0.0, 0.0, 0.0))
    hf = phys.plane()
    actions = jnp.zeros(12).at[0].set(0.1)  # 0.1 N m < frictionloss 0.2

    def run(params):
        st = phys.PhysicsState(
            base_pos=jnp.array([0.0, 0.0, 5.0]),  # airborne: no contact
            base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
            lin_vel=jnp.zeros(3),
            ang_vel=jnp.zeros(3),
            dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
            dof_vel=jnp.zeros(12),
        )
        step = jax.jit(
            lambda s: phys.control_step(
                ma, hf, params, pd, dr, dof_limits, s, actions
            )
        )
        for _ in range(50):  # 1 s
            st, _, _ = step(st)
        return np.asarray(st.dof_pos)

    q_imp = run(params_imp)
    q_tanh = run(params_tanh)
    drift_imp = np.abs(q_imp - DEFAULT_ANGLES).max()
    drift_tanh = np.abs(q_tanh - DEFAULT_ANGLES).max()
    assert drift_imp < 1e-4, drift_imp          # held exactly at rest
    assert drift_tanh > 10 * max(drift_imp, 1e-6), (drift_imp, drift_tanh)
