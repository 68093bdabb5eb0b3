"""Env-level tests: shapes, layout, resets, rewards, terrain curriculum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_custom_tpu.envs import task_registry


@pytest.fixture(scope="module")
def go2_env():
    env_cfg, _ = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = 4
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    return env, state, obs


def test_obs_shapes_go2(go2_env):
    """Dimensions from SURVEY §2.3 / go2_config.py:6-22."""
    env, state, obs = go2_env
    B = 4
    assert obs.obs.shape == (B, 572)
    assert obs.privileged.shape == (B, 29)
    assert obs.critic.shape == (B, 736)
    assert obs.estimated.shape == (B, 3)
    assert obs.scan.shape == (B, 132)


def test_obs_layout_go2(go2_env):
    """Current proprio occupies the LAST 52 entries; command slots match."""
    env, state, obs = go2_env
    cur = np.asarray(obs.obs[:, -52:])
    # commands at [5:8] scaled by [2, 2, 0.25]
    cmds = np.asarray(state.commands[:, :3])
    np.testing.assert_allclose(
        cur[:, 5:8], cmds * np.array([2.0, 2.0, 0.25]), atol=1e-5
    )
    # phase features at [44:52] are sin/cos pairs: sin^2 + cos^2 == 1
    ph = cur[:, 44:52]
    s2c2 = ph[:, 0::2] ** 2 + ph[:, 1::2] ** 2
    np.testing.assert_allclose(s2c2, 1.0, atol=1e-5)


def test_privileged_obs_contents(go2_env):
    """Privileged stream = [mass 4, friction 1, kp-1 12, kd-1 12] (go2.py:528)."""
    env, state, obs = go2_env
    p = np.asarray(obs.privileged)
    np.testing.assert_allclose(p[:, 0], np.asarray(state.dr.added_mass), atol=1e-6)
    np.testing.assert_allclose(p[:, 1:4], np.asarray(state.dr.com_offset), atol=1e-6)
    np.testing.assert_allclose(p[:, 4], np.asarray(state.dr.friction), atol=1e-6)
    np.testing.assert_allclose(p[:, 5:17], np.asarray(state.dr.kp_mult) - 1, atol=1e-6)


def test_critic_is_concat(go2_env):
    env, state, obs = go2_env
    cat = np.concatenate(
        [obs.obs, obs.privileged, obs.estimated, obs.scan], axis=-1
    )
    np.testing.assert_allclose(np.asarray(obs.critic), np.clip(cat, -100, 100), atol=1e-6)


def test_step_progresses_and_terminates(go2_env):
    env, state, obs = go2_env
    step = jax.jit(env.step)
    # flip one robot upside down -> should terminate next step
    ph = state.physics
    flipped_quat = ph.base_quat.at[0].set(jnp.array([0.0, 1.0, 0.0, 0.0]))
    state2 = state.replace(physics=ph._replace(base_quat=flipped_quat))
    state3, obs3, rew, done, info = step(state2, jnp.zeros((4, 12)))
    assert bool(done[0])
    # reset env 0 got fresh episode_length
    assert int(state3.episode_length[0]) == 0
    # non-flipped envs keep counting
    assert int(state3.episode_length[1]) > 0


def test_timeout_flag(go2_env):
    env, state, obs = go2_env
    step = jax.jit(env.step)
    state2 = state.replace(
        episode_length=jnp.full_like(state.episode_length, env.max_episode_length)
    )
    _, _, _, done, info = step(state2, jnp.zeros((4, 12)))
    assert bool(jnp.all(done))
    assert bool(jnp.all(info["time_outs"]))


def test_rewards_finite_and_positive_clipped(go2_env):
    env, state, obs = go2_env
    step = jax.jit(env.step)
    st = state
    for i in range(5):
        acts = jax.random.normal(jax.random.PRNGKey(i), (4, 12))
        st, _, rew, _, _ = step(st, acts)
        r = np.asarray(rew)
        assert np.isfinite(r).all()
        assert (r >= 0).all()  # only_positive_rewards + termination=0


def test_determinism(go2_env):
    env, state, obs = go2_env
    step = jax.jit(env.step)
    a = jnp.ones((4, 12)) * 0.1
    s1, o1, r1, d1, _ = step(state, a)
    s2, o2, r2, d2, _ = step(state, a)
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_parkour_env_builds():
    env_cfg, _ = task_registry.get_cfgs("go2_parkour")
    env_cfg.env.num_envs = 2
    env_cfg.terrain.num_rows = 3
    env_cfg.terrain.num_cols = 2
    env_cfg.terrain.border_size = 5
    env = task_registry.get_task_class("go2_parkour")(
        env_cfg, env_cfg.asset.file, name="go2_parkour"
    )
    state, obs = env.reset_all(jax.random.PRNGKey(1))
    assert obs.scan.shape == (2, 132)
    # scan obs should see real terrain (not all equal)
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, rew, done, info = step(state, jnp.zeros((2, 12)))
    assert np.isfinite(np.asarray(obs.obs)).all()
    # per-env episode contributions (batch reductions moved to the runner's
    # post-scan reduce — scripts/comm_budget.py receipts)
    assert info["episode_contrib"].shape == (2, len(env.episode_sum_names))


def test_config_instances_isolated():
    """Mutating one cfg instance's nested dict/list must not leak into the
    class attribute and poison later get_cfgs() calls (utils/config.py
    deep-copies mutable defaults at instantiation)."""
    from legged_gym_custom_tpu.envs import task_registry

    a, _ = task_registry.get_cfgs("go2_parkour")
    orig = list(a.terrain.parkour_kwargs["obstacle_lengths"])
    a.terrain.parkour_kwargs["obstacle_lengths"] = [0.123] * 7
    a.terrain.terrain_proportions[0] = 0.5
    b, _ = task_registry.get_cfgs("go2_parkour")
    assert b.terrain.parkour_kwargs["obstacle_lengths"] == orig
    assert b.terrain.terrain_proportions[0] == 1.0


def test_spawn_curriculum_reset():
    """rand_x_offsets / rand_x_jitter / rand_vx_range (the parkour bootcamp
    spawn curriculum) shape the reset distribution as configured."""
    import jax
    import numpy as np
    from legged_gym_custom_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("go2_parkour_bootcamp")
    env_cfg.env.num_envs = 64
    env_cfg.terrain.num_rows = 1
    env_cfg.terrain.num_cols = 1
    env_cfg.terrain.curriculum = False
    env, _ = task_registry.make_env(
        name="go2_parkour_bootcamp", args=None, env_cfg=env_cfg
    )
    state, obs = env.reset_all(jax.random.PRNGKey(3))
    x = np.asarray(state.physics.base_pos[:, 0])
    vx = np.asarray(state.physics.lin_vel[:, 0])
    origins_x = np.asarray(state.env_origins[:, 0])
    rel = x - origins_x - float(env.base_init["pos"][0])
    offs = np.asarray(env_cfg.init_state.rand_x_offsets)
    lo_j, hi_j = env_cfg.init_state.rand_x_jitter
    # every spawn lands in one of the configured slots (+-1 m custom-origin
    # xy randomization on top of the slot+jitter window)
    lo = offs.min() + lo_j - 1.01
    hi = offs.max() + hi_j + 1.01
    assert (rel >= lo).all() and (rel <= hi).all(), (rel.min(), rel.max())
    # multiple distinct slots actually used
    assigned = np.argmin(np.abs(rel[:, None] - offs[None, :]), axis=1)
    assert len(np.unique(assigned)) >= 3
    # initial forward velocity applied (reset_all steps once after the
    # reset — reference base_task.reset semantics — so exact bounds soften;
    # the default reset draws vx ~ U(-0.5, 0.5) with mean 0)
    assert vx.mean() > 0.5, vx.mean()
    assert vx.max() > 1.0


def test_progress_stall_termination():
    """Round-5 commit-stage mechanics (go2_parkour_commit): with an active
    velocity command and no new course ground, `stall_time` accumulates and
    terminates the episode as a death (not a time_out); `max_x` tracks the
    episode's running max; the `progress` reward term is registered."""
    env_cfg, _ = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = 4
    env_cfg.domain_rand.push_robots = False

    class termination:
        stall_time_s = 0.24   # 12 control steps at dt=0.02
        stall_min_vel = 0.2

    env_cfg.termination = termination
    env_cfg.rewards.scales.progress = 1.5
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    assert env.stall_time_s == pytest.approx(0.24)
    assert "progress" in env.reward_names

    state, obs = env.reset_all(jax.random.PRNGKey(0))
    # force an active forward command and a fresh episode clock
    cmds = jnp.tile(jnp.array([0.8, 0.0, 0.0, 0.0]), (4, 1))
    state = state.replace(
        commands=cmds, episode_length=jnp.zeros(4, jnp.int32),
        stall_time=jnp.zeros(4),
    )
    step = jax.jit(env.step)
    zero = jnp.zeros((4, env.num_actions))
    died_at = None
    for i in range(40):
        prev_max = np.asarray(state.max_x)
        state = state.replace(commands=cmds)
        state, obs, rew, done, info = step(state, zero)
        # max_x never decreases for surviving envs
        alive = ~np.asarray(done)
        assert (np.asarray(state.max_x)[alive] >= prev_max[alive] - 1e-6).all()
        if bool(np.asarray(done).any()):
            died_at = i
            assert not bool(np.asarray(info["time_outs"]).any())
            break
    # a PD-held standing robot gains no ground: the stall rule must fire
    # within stall_time_s (12 steps) plus a small slack
    assert died_at is not None and died_at <= 20, died_at
    # reset envs restarted their progress tracking at the respawn position
    d = np.asarray(done)
    np.testing.assert_allclose(
        np.asarray(state.max_x)[d], np.asarray(state.physics.base_pos[:, 0])[d],
        atol=1e-5,
    )
    assert (np.asarray(state.stall_time)[d] == 0.0).all()
