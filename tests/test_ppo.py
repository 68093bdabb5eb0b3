"""PPO math unit tests against straightforward numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_gym_custom_tpu.rl import ppo as ppo_lib
from legged_gym_custom_tpu.rl.ppo import PPOConfig, Transition


def _mk_traj(rng, T=6, B=4, D=3):
    z = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return Transition(
        obs=z(T, B, 8),
        privileged=z(T, B, 5),
        critic=z(T, B, 10),
        estimated=z(T, B, 3),
        scan=z(T, B, 6),
        actions=z(T, B, D),
        rewards=z(T, B),
        dones=jnp.asarray(rng.random((T, B)) < 0.2),
        values=z(T, B),
        log_probs=z(T, B),
        mu=z(T, B, D),
        sigma=jnp.abs(z(T, B, D)) + 0.5,
    )


def test_gae_matches_reference_loop(rng):
    """GAE scan vs the reference's reverse python loop
    (rollout_storage.py:110-124)."""
    T, B = 6, 4
    traj = _mk_traj(rng, T, B)
    last_values = jnp.asarray(rng.normal(size=B).astype(np.float32))
    gamma, lam = 0.99, 0.95
    returns, norm_adv = ppo_lib.compute_gae(traj, last_values, gamma, lam)

    vals = np.asarray(traj.values)
    rews = np.asarray(traj.rewards)
    dones = np.asarray(traj.dones).astype(np.float32)
    ret_ref = np.zeros((T, B))
    advantage = 0.0
    for step in reversed(range(T)):
        next_values = np.asarray(last_values) if step == T - 1 else vals[step + 1]
        not_terminal = 1.0 - dones[step]
        delta = rews[step] + not_terminal * gamma * next_values - vals[step]
        advantage = delta + not_terminal * gamma * lam * advantage
        ret_ref[step] = advantage + vals[step]
    np.testing.assert_allclose(np.asarray(returns), ret_ref, rtol=1e-5, atol=1e-5)
    adv_ref = ret_ref - vals
    adv_ref = (adv_ref - adv_ref.mean()) / (adv_ref.std() + 1e-8)
    np.testing.assert_allclose(np.asarray(norm_adv), adv_ref, rtol=1e-3, atol=1e-4)


def test_gaussian_log_prob_matches_scipy(rng):
    from scipy.stats import norm

    x = rng.normal(size=(5, 3)).astype(np.float32)
    mean = rng.normal(size=(5, 3)).astype(np.float32)
    std = (np.abs(rng.normal(size=(5, 3))) + 0.3).astype(np.float32)
    got = np.asarray(
        ppo_lib.gaussian_log_prob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std))
    )
    want = norm.logpdf(x, mean, std).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    ent = np.asarray(ppo_lib.gaussian_entropy(jnp.asarray(std)))
    want_ent = norm.entropy(scale=std).sum(-1)
    np.testing.assert_allclose(ent, want_ent, rtol=1e-5)


def test_roa_schedule():
    """0 -> 0.05 over updates 5000..15000 (ppo.py:41,219-220)."""
    cfg = PPOConfig()
    assert float(ppo_lib.roa_coefficient(cfg, 0.0)) == 0.0
    assert float(ppo_lib.roa_coefficient(cfg, 5000.0)) == 0.0
    np.testing.assert_allclose(float(ppo_lib.roa_coefficient(cfg, 10000.0)), 0.025)
    np.testing.assert_allclose(float(ppo_lib.roa_coefficient(cfg, 15000.0)), 0.05)
    np.testing.assert_allclose(float(ppo_lib.roa_coefficient(cfg, 99999.0)), 0.05)
    # resume semantics: flat 0.1 from the start (ppo.py:42-43)
    class A:  # minimal alg cfg
        clip_param = 0.2; num_learning_epochs = 5; num_mini_batches = 4
        value_loss_coef = 1.0; entropy_coef = 0.01; learning_rate = 1e-3
        estimator_learning_rate = 1e-3; max_grad_norm = 1.0
        use_clipped_value_loss = True; schedule = "fixed"; desired_kl = 0.01
        gamma = 0.99; lam = 0.95
    cfg_r = PPOConfig.from_cfg(A, resume=True)
    np.testing.assert_allclose(float(ppo_lib.roa_coefficient(cfg_r, 1.0)), 0.1)
    np.testing.assert_allclose(float(ppo_lib.roa_coefficient(cfg_r, 500.0)), 0.1)


def test_ppo_update_runs_and_respects_groups(rng):
    """One update: policy/estimator params change, adaptation encoder frozen;
    DAgger: only the adaptation encoder changes."""
    from legged_gym_custom_tpu.models.networks import ActorCriticNetworks

    class P:
        actor_hidden_dims = [16, 16]
        critic_hidden_dims = [16, 16]
        priv_encoder_hidden_dims = [8, 8]
        scan_encoder_hidden_dims = [8, 8]
        estimator_hidden_dims = [8, 8]
        use_history = True
        latent_encoder_output_dim = 4
        scan_encoder_output_dim = 4
        activation = "elu"
        init_noise_std = 1.0

    H, Pn, D = 6, 4, 3  # H >= 6 needed by the adaptation CNN (k4s2 then k2s1)
    nets = ActorCriticNetworks(
        P, num_proprio=Pn, num_privileged_obs=5, num_critic_obs=10,
        num_estimated_obs=3, num_scan_obs=6, num_actions=D, history_buffer_length=H,
    )
    cfg = PPOConfig(num_learning_epochs=2, num_mini_batches=2, schedule="adaptive")
    ts = ppo_lib.init_train_state(nets, cfg, jax.random.PRNGKey(0))

    T, B = 4, 4
    traj = _mk_traj(rng, T, B, D)
    traj = traj._replace(obs=jnp.asarray(rng.normal(size=(T, B, Pn * (1 + H))).astype(np.float32)))
    last_values = jnp.zeros(B)
    returns, advantages = ppo_lib.compute_gae(traj, last_values, cfg.gamma, cfg.lam)
    ts2, metrics = ppo_lib.ppo_update(
        nets, cfg, ts, traj, returns, advantages, jax.random.PRNGKey(1)
    )
    # policy + estimator changed
    d_actor = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), ts.params["actor"], ts2.params["actor"]),
    )
    d_est = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), ts.params["estimator"], ts2.params["estimator"]),
    )
    d_adapt = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), ts.params["adapt_encoder"], ts2.params["adapt_encoder"]),
    )
    assert d_actor > 0 and d_est > 0
    assert d_adapt == 0.0
    assert float(ts2.total_updates) == 1.0
    # std clamped
    assert float(jnp.max(ts2.params["std"])) <= cfg.max_action_std + 1e-6

    # DAgger: only adaptation moves
    ts3, dmetrics = ppo_lib.dagger_update(nets, cfg, ts2, traj, jax.random.PRNGKey(2))
    d_actor2 = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), ts2.params["actor"], ts3.params["actor"]),
    )
    d_adapt2 = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), ts2.params["adapt_encoder"], ts3.params["adapt_encoder"]),
    )
    assert d_actor2 == 0.0
    assert d_adapt2 > 0
    assert "adaptation_loss" in dmetrics


def test_network_shapes():
    """Go2 network dims match SURVEY §2.1 (627-d actor input, 736-d critic)."""
    from legged_gym_custom_tpu.models.networks import ActorCriticNetworks

    class P:
        actor_hidden_dims = [512, 256, 128]
        critic_hidden_dims = [512, 256, 128]
        priv_encoder_hidden_dims = [64, 20]
        scan_encoder_hidden_dims = [128, 64]
        estimator_hidden_dims = [256, 128]
        use_history = True
        latent_encoder_output_dim = 20
        scan_encoder_output_dim = 32
        activation = "elu"
        init_noise_std = 1.0

    nets = ActorCriticNetworks(
        P, num_proprio=52, num_privileged_obs=29, num_critic_obs=736,
        num_estimated_obs=3, num_scan_obs=132, num_actions=12,
        history_buffer_length=10,
    )
    params = nets.init_params(jax.random.PRNGKey(0))
    obs = jnp.zeros((2, 572))
    priv = jnp.zeros((2, 29))
    scan = jnp.zeros((2, 132))
    est = nets.estimate(params, obs)
    assert est.shape == (2, 3)
    mean = nets.action_mean(params, obs, priv, est, scan, adaptation_mode=False)
    assert mean.shape == (2, 12)
    mean_a = nets.action_mean(params, obs, priv, est, scan, adaptation_mode=True)
    assert mean_a.shape == (2, 12)
    v = nets.value(params, jnp.zeros((2, 736)))
    assert v.shape == (2,)
    # actor first layer input dim is 627 = 572 + 20 + 32 + 3
    k = params["actor"]["params"]["MLP_0"]["Dense_0"]["kernel"]
    assert k.shape[0] == 627
