"""Engine integration tests: freefall, standing stability, batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_custom_tpu import physics as phys

GO2_URDF = "/root/reference/resources/robots/go2/urdf/go2.urdf"

# Go2 default joint angles (reference go2_config.py:152-157), dof order
# FL_hip..., FR..., RL..., RR...
DEFAULT_ANGLES = np.array([0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 1.0, -1.5, -0.1, 1.0, -1.5])


@pytest.fixture(scope="module")
def go2():
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
        friction=jnp.float32(1.0),
        added_mass=jnp.float32(0.0),
        com_offset=jnp.zeros(3),
        kp_mult=jnp.ones(12),
        kd_mult=jnp.ones(12),
    )
    return model, ma, pd, dof_limits, dr


def _init_state(z=0.42):
    return phys.PhysicsState(
        base_pos=jnp.array([0.0, 0.0, z]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.zeros(3),
        dof_pos=jnp.asarray(DEFAULT_ANGLES, jnp.float32),
        dof_vel=jnp.zeros(12),
    )


def test_freefall(go2):
    model, ma, pd, dof_limits, dr = go2
    hf = phys.plane()
    params = phys.SimParams(substeps=1)
    state = _init_state(z=10.0)
    step = jax.jit(
        lambda s, a: phys.control_step(ma, hf, params, pd, dr, dof_limits, s, a)
    )
    n = 25  # 0.5 s
    for _ in range(n):
        state, info, _ = step(state, jnp.asarray(DEFAULT_ANGLES * 0.0))
    t = n * params.dt * params.decimation
    expect_z = 10.0 - 0.5 * 9.81 * t**2
    assert abs(float(state.base_pos[2]) - expect_z) < 0.05
    assert abs(float(state.lin_vel[2]) + 9.81 * t) < 0.05


def test_standing_stable(go2):
    """PD holding default angles on flat ground: settles upright near 0.3 m."""
    model, ma, pd, dof_limits, dr = go2
    hf = phys.plane()
    params = phys.SimParams()
    state = _init_state(z=0.34)
    step = jax.jit(
        lambda s, a: phys.control_step(ma, hf, params, pd, dr, dof_limits, s, a)
    )
    zero = jnp.zeros(12)
    for i in range(100):  # 2 s
        state, info, _ = step(state, zero)
    assert np.isfinite(np.asarray(state.base_pos)).all()
    z = float(state.base_pos[2])
    assert 0.24 < z < 0.36, f"unexpected standing height {z}"
    # settled: small velocities (some contact micro-jitter is expected)
    assert float(jnp.linalg.norm(state.lin_vel)) < 0.1
    assert float(jnp.linalg.norm(state.ang_vel)) < 0.2
    # upright
    from legged_gym_custom_tpu.physics import spatial as sp

    g_proj = np.asarray(sp.quat_rotate_inverse(state.base_quat, jnp.array([0.0, 0.0, -1.0])))
    assert g_proj[2] < -0.99
    # feet carry the weight (time-average over 20 steps to smooth jitter)
    feet = [i for i, n in enumerate(model.link_names) if "foot" in n]
    sums = []
    for _ in range(20):
        state, info, _ = step(state, zero)
        sums.append(np.asarray(info.link_forces)[feet, 2].sum())
    np.testing.assert_allclose(np.mean(sums), model.mass.sum() * 9.81, rtol=0.25)


GO2_PLANT = dict(
    dof_damping=jnp.full(12, 0.1),
    dof_armature=jnp.full(12, 0.01),
    dof_frictionloss=jnp.full(12, 0.2),
)
STIFF_CONTACT = phys.ContactParams(
    stiffness=40000.0, damping=250.0, friction_vel=250.0, terrain_friction=1.0
)


def test_joint_passive_dynamics(go2):
    """The go2.xml:9 joint damping/armature/frictionloss surrogate (round 4).

    (a) the tanh Coulomb friction dissipates: a torque below frictionloss
    barely moves the joint; (b) armature slows qdd for the same torque;
    (c) the full plant is stable at the stiff-contact settings.
    """
    model, ma, pd, dof_limits, dr = go2
    hf = phys.plane()

    # (a)+(b): freefall (no contact) joint response to a small constant torque
    def qdd_probe(params, tau_z):
        st = _init_state(z=100.0)
        tfn = lambda a, q, qd, s: (jnp.full(12, tau_z), s)
        st2, _, _ = phys.control_step(
            ma, hf, params, pd, dr, dof_limits, st,
            jnp.zeros(12), torque_fn=tfn,
        )
        return np.asarray(st2.dof_pos) - DEFAULT_ANGLES

    base = phys.SimParams()
    full = phys.SimParams(**GO2_PLANT)
    # torque below frictionloss: full plant moves far less than the free plant
    dq_free = np.abs(qdd_probe(base, 0.15)).max()
    dq_full = np.abs(qdd_probe(full, 0.15)).max()
    assert dq_full < 0.35 * dq_free, (dq_free, dq_full)
    # large torque: armature + damping still slow the response measurably
    dq_free = np.abs(qdd_probe(base, 5.0)).max()
    dq_full = np.abs(qdd_probe(full, 5.0)).max()
    assert dq_full < dq_free

    # (c): stiff contact + full plant, dropped from 10 cm up — stays finite,
    # settles without rebound (the overdamped contact returns no push-off
    # energy: peak post-drop height stays below the drop height)
    params = phys.SimParams(substeps=4, contact=STIFF_CONTACT, **GO2_PLANT)
    state = _init_state(z=0.42)
    step = jax.jit(
        lambda s, a: phys.control_step(ma, hf, params, pd, dr, dof_limits, s, a)
    )
    zs = []
    for _ in range(100):
        state, info, _ = step(state, jnp.zeros(12))
        zs.append(float(state.base_pos[2]))
    zs = np.asarray(zs)
    assert np.isfinite(zs).all()
    assert 0.24 < zs[-1] < 0.36
    settle = zs[-25:].mean()
    # bounded rebound: after first touching down, the base never rises more
    # than ~3 cm above the settle height (the residual overshoot is the PD
    # leg-spring, which the MuJoCo oracle also shows — the apples-to-apples
    # transient check lives in test_sim_parity.py::test_full_plant_parity)
    below = np.nonzero(zs < settle + 0.01)[0]
    assert below.size > 0
    assert zs[below[0]:].max() < settle + 0.03
    # stiff contact: static penetration is mm-scale => stands tall, and
    # velocities settle
    assert float(jnp.linalg.norm(state.lin_vel)) < 0.05


def test_standing_batch_soa(go2):
    """Natively batched SoA engine (trailing batch) with per-env domain rand."""
    model, ma, pd, dof_limits, dr = go2
    hf = phys.plane()
    params = phys.SimParams()
    B = 8
    key = jax.random.PRNGKey(0)
    dr_b = phys.DomainRandParams(
        friction=jax.random.uniform(key, (B,), minval=0.3, maxval=1.2),
        added_mass=jax.random.uniform(key, (B,), minval=0.0, maxval=3.0),
        com_offset=jax.random.uniform(key, (3, B), minval=-0.15, maxval=0.15),
        kp_mult=jnp.ones((12, B)),
        kd_mult=jnp.ones((12, B)),
    )
    state0 = _init_state(z=0.34)
    # component-major: batch on the trailing axis
    state_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x[..., None], x.shape + (B,)), state0
    )

    step = jax.jit(
        lambda s, a, d: phys.control_step(ma, hf, params, pd, d, dof_limits, s, a)
    )
    actions = jnp.zeros((12, B))
    st = state_b
    for _ in range(50):
        st, info, _ = step(st, actions, dr_b)
    assert np.isfinite(np.asarray(st.base_pos)).all()
    z = np.asarray(st.base_pos[2, :])
    assert (z > 0.2).all() and (z < 0.4).all()
    # unbatched and batched agree: env 0 with default-ish dr vs single run
    assert info.link_forces.shape == (model.n_links, 3, B)
