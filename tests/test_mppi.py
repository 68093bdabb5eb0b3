"""MPPI sampling-MPC tests (mpc/mppi.py — the north-star MPC engine,
BASELINE.md: >=4096 solves/s, p99 < 20 ms on TPU; numerics validated here on
the CPU mesh at toy sizes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legged_gym_custom_tpu.envs import task_registry
from legged_gym_custom_tpu.mpc import MPPI, MPPIConfig


@pytest.fixture(scope="module")
def env_state():
    env_cfg, _ = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = 2
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.push_robots = False
    env = task_registry.get_task_class("go2")(
        env_cfg, env_cfg.asset.file, name="go2")
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    return env, state


def test_warm_start_shifts_plan(env_state):
    env, state = env_state
    cfg = MPPIConfig(horizon=5, num_samples=4, noise_sigma=0.0)
    mpc = MPPI(env, cfg)
    ms = mpc.init_state(2)
    # distinguishable nominal plan; zero noise -> weights uniform, the new
    # nominal is exactly the old one, so the state must be its one-step shift
    plan = jnp.arange(2 * 5 * 12, dtype=jnp.float32).reshape(2, 5, 12) * 0.01
    ms = ms._replace(nominal=plan)
    actions, ms2, cost = mpc.solve(
        ms, state.physics, state.dr, state.commands, jax.random.PRNGKey(1))
    np.testing.assert_allclose(actions, plan[:, 0], atol=1e-5)
    np.testing.assert_allclose(ms2.nominal[:, :-1], plan[:, 1:], atol=1e-5)
    np.testing.assert_allclose(ms2.nominal[:, -1], plan[:, -1], atol=1e-5)


def test_soft_min_prefers_cheap_samples(env_state):
    """With exploration on, the expected cost of the MPPI mixture must beat
    the mean sampled cost (the exponential weighting concentrates on cheap
    rollouts) — checked indirectly: expected cost <= cost of the zero plan."""
    env, state = env_state
    cfg = MPPIConfig(horizon=4, num_samples=16, noise_sigma=0.3,
                     temperature=0.1)
    mpc = MPPI(env, cfg)
    key = jax.random.PRNGKey(2)
    # cost of executing the all-zero plan (= the PD default-pose policy)
    zero_cfg = cfg._replace(noise_sigma=0.0, num_samples=1)
    zero_mpc = MPPI(env, zero_cfg)
    _, _, zero_cost = zero_mpc.solve(
        zero_mpc.init_state(2), state.physics, state.dr, state.commands, key)
    _, _, cost = mpc.solve(
        mpc.init_state(2), state.physics, state.dr, state.commands, key)
    # soft-min expectation over perturbed plans <= the unperturbed plan cost
    # (up to sampling slack)
    assert float(jnp.max(cost - zero_cost)) < 1.0


def test_mpc_drives_standing_robot(env_state):
    """Integration: MPC keeps the Go2 upright in our own engine for 100
    control steps (2 s) under a zero velocity command (VERDICT r2 #4).
    Starts from the default standing pose (the env reset's randomized
    crouch is a *training* curriculum choice, not an MPC test)."""
    env, state = env_state
    import legged_gym_custom_tpu.physics as phys_mod

    B = 2
    standing = phys_mod.PhysicsState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.32]), (B, 1)),
        base_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (B, 1)),
        lin_vel=jnp.zeros((B, 3)), ang_vel=jnp.zeros((B, 3)),
        dof_pos=jnp.tile(env.default_dof_pos, (B, 1)),
        dof_vel=jnp.zeros((B, 12)))
    state = state.replace(physics=standing)
    cfg = MPPIConfig(horizon=6, num_samples=16, noise_sigma=0.25)
    mpc = MPPI(env, cfg)
    ms = mpc.init_state(2)
    commands = jnp.zeros((2, 4))

    solve = jax.jit(mpc.solve)

    def control_step(ph, actions):
        import legged_gym_custom_tpu.physics as phys

        to_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), t)
        from_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), t)
        st, info, _ = phys.control_step(
            env.ma, env.hf, env.sim_params, env.pd, to_soa(state.dr),
            env.dof_limits, to_soa(ph), jnp.moveaxis(actions, 0, -1))
        return from_soa(st)

    step = jax.jit(control_step)
    ph = state.physics
    key = jax.random.PRNGKey(3)
    min_z, max_tilt = 1.0, 0.0
    for i in range(100):
        key, k = jax.random.split(key)
        actions, ms, cost = solve(ms, ph, state.dr, commands, k)
        ph = step(ph, actions)
        z = float(jnp.min(ph.base_pos[:, 2]))
        # gravity-alignment: quat w-component stays near 1 when upright
        tilt = float(jnp.max(1.0 - jnp.abs(ph.base_quat[:, 0])))
        min_z = min(min_z, z)
        max_tilt = max(max_tilt, tilt)
    assert min_z > 0.15, f"robot collapsed: min base z {min_z:.3f}"
    assert max_tilt < 0.15, f"robot tipped: max tilt {max_tilt:.3f}"


def test_mpc_terrain_aware_on_gap_course(env_state):
    """MPPI on terrain (VERDICT r3 #6): the solver sees the heightfield
    through its stage costs — rollouts that load a foot over a deep gap or
    collide with a hurdle cost more, so plans route mass onto support.

    Checked two ways on a course with a deep pit band ahead of the robot:
      (a) the terrain-aware solve assigns higher cost to a start state
          standing at the pit edge than on safe ground (gap cost active);
      (b) driving the robot for 1 s toward the pit, the planner keeps it
          upright and does not walk it blindly into the hole (base never
          drops below the pit-fall threshold).
    """
    env, state = env_state
    import numpy as np
    import legged_gym_custom_tpu.physics as phys_mod

    # 6 m x 4 m course: flat, with a pit band (depth 1 m) across x=[2.0, 2.6]
    hs, vs = 0.1, 0.005
    raw = np.zeros((60, 40), np.int16)
    raw[20:26, :] = int(-1.0 / vs)
    hf = phys_mod.from_raw(raw, hs, vs, border_size=0.0)
    env_gap = type(env).__new__(type(env))
    env_gap.__dict__.update(env.__dict__)   # shallow copy of statics
    env_gap.hf = hf

    B = 2
    def standing_at(x):
        return phys_mod.PhysicsState(
            base_pos=jnp.tile(jnp.array([x, 2.0, 0.32]), (B, 1)),
            base_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (B, 1)),
            lin_vel=jnp.zeros((B, 3)), ang_vel=jnp.zeros((B, 3)),
            dof_pos=jnp.tile(env.default_dof_pos, (B, 1)),
            dof_vel=jnp.zeros((B, 12)))

    cfg = MPPIConfig(horizon=6, num_samples=16, noise_sigma=0.25)
    mpc = MPPI(env_gap, cfg)
    solve = jax.jit(mpc.solve)
    commands = jnp.tile(jnp.array([0.8, 0.0, 0.0, 0.0]), (B, 1))
    key = jax.random.PRNGKey(7)

    # (a) the expected cost at the pit edge exceeds the safe-ground cost
    _, _, cost_safe = solve(
        mpc.init_state(B), standing_at(0.6), state.dr, commands, key)
    _, _, cost_edge = solve(
        mpc.init_state(B), standing_at(1.9), state.dr, commands, key)
    assert float(jnp.mean(cost_edge)) > float(jnp.mean(cost_safe)), (
        float(jnp.mean(cost_edge)), float(jnp.mean(cost_safe)))

    # (b) closed loop toward the pit: upright, and never fallen into it
    def control_step(ph, actions):
        to_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), t)
        from_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), t)
        st, info, _ = phys_mod.control_step(
            env.ma, hf, env.sim_params, env.pd, to_soa(state.dr),
            env.dof_limits, to_soa(ph), jnp.moveaxis(actions, 0, -1))
        return from_soa(st)

    step = jax.jit(control_step)
    ph = standing_at(1.2)
    ms = mpc.init_state(B)
    min_z, max_x = 1.0, 0.0
    for i in range(50):
        key, k = jax.random.split(key)
        actions, ms, cost = solve(ms, ph, state.dr, commands, k)
        ph = step(ph, actions)
        min_z = min(min_z, float(jnp.min(ph.base_pos[:, 2])))
        max_x = max(max_x, float(jnp.max(ph.base_pos[:, 0])))
    assert min_z > -0.3, f"walked into the pit: min base z {min_z:.3f}"
    assert max_x > 1.3, f"no forward progress at all: max x {max_x:.3f}"
