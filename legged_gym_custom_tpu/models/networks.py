"""Policy/value networks + encoders (reference rsl_rl/modules).

Architectures replicate the reference exactly:
  * Actor MLP  in=proprio*(1+H) + latent(20) + scan_latent(32) + est(3)
               hidden [512,256,128] -> num_actions      (actor_critic.py:82-95)
  * Critic MLP in=num_critic_obs, hidden [512,256,128] -> 1        (:97-107)
  * PrivilegedEncoder MLP priv -> [64,20] -> 20  (support_networks.py:95-126)
  * ScanEncoder MLP 132 -> [128,64] -> 32                   (:9-41)
  * MlpEstimator 572 -> [256,128] -> 3 (optionally current-obs-only) (:44-92)
  * AdaptationEncoder: per-step linear 52->30 + 1-D CNN over the history
    (Conv 30->20 k4 s2, 20->10 k2 s1) + linear 30->20, all ELU    (:129-175)

The Gaussian policy std is a free (12,) parameter owned by the train state
(actor_critic.py:132), not a module parameter, so the optimizer grouping of
the reference's three Adam optimizers (ppo.py:58-70) maps onto parameter
sub-trees directly.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "elu": nn.elu,
    "selu": nn.selu,
    "relu": nn.relu,
    "crelu": nn.relu,
    "lrelu": nn.leaky_relu,
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
}


def _safe_lecun_normal(key, shape, dtype=jnp.float32):
    """flax's default Dense init, tolerating zero fan-in.

    The reference instantiates the scan encoder even for tasks with
    num_scan_obs = 0 (legged_robot_config.py:7, actor_critic.py:120-122) —
    torch Linear(0, h) is a bias-only layer; variance-scaling init would
    divide by fan_in == 0 here, so empty kernels are returned directly.
    """
    if shape[0] == 0:
        return jnp.zeros(shape, dtype)
    return nn.initializers.lecun_normal()(key, shape, dtype)


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACTIVATIONS[self.activation]
        for h in self.hidden_dims:
            x = act(nn.Dense(h, kernel_init=_safe_lecun_normal)(x))
        return nn.Dense(self.out_dim, kernel_init=_safe_lecun_normal)(x)


class Actor(nn.Module):
    hidden_dims: Sequence[int]
    num_actions: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, actor_input):
        return MLP(self.hidden_dims, self.num_actions, self.activation)(actor_input)


class Critic(nn.Module):
    hidden_dims: Sequence[int]
    activation: str = "elu"

    @nn.compact
    def __call__(self, critic_obs):
        return MLP(self.hidden_dims, 1, self.activation)(critic_obs)


class PrivilegedEncoder(nn.Module):
    hidden_dims: Sequence[int] = (64, 20)
    out_dim: int = 20
    activation: str = "elu"

    @nn.compact
    def __call__(self, priv_obs):
        return MLP(self.hidden_dims, self.out_dim, self.activation)(priv_obs)


class ScanEncoder(nn.Module):
    hidden_dims: Sequence[int] = (128, 64)
    out_dim: int = 32
    activation: str = "elu"

    @nn.compact
    def __call__(self, scan_obs):
        return MLP(self.hidden_dims, self.out_dim, self.activation)(scan_obs)


class MlpEstimator(nn.Module):
    num_proprio: int
    history_buffer_length: int
    out_dim: int
    hidden_dims: Sequence[int] = (256, 128)
    activation: str = "elu"
    use_history: bool = True

    @nn.compact
    def __call__(self, obs_with_history):
        x = obs_with_history
        if not self.use_history:
            x = x[..., -self.num_proprio:]
        return MLP(self.hidden_dims, self.out_dim, self.activation)(x)


class AdaptationEncoder(nn.Module):
    """ROA adaptation encoder over the obs history (support_networks.py:129-175).

    Input: the *history part* of the obs buffer reshaped to (B, H, P); the
    reference slices `obs[:, :-P]` (actor_critic.py:174-180) — history only,
    current obs excluded.

    Short histories: the reference hardcodes the post-conv flatten width to
    30 (support_networks.py:166 `nn.Linear(3*channel_size, ...)`), which only
    holds for H = 10; with the base/anymal H = 5 its second conv would see a
    length-1 sequence and crash, making those tasks untrainable upstream.
    Here each conv is applied only when the sequence is long enough for its
    kernel, so every H >= 1 works and H = 10 reproduces the reference stack
    exactly (10 -> conv k4s2 -> 4 -> conv k2s1 -> 3 -> flatten 30).
    """

    num_proprio: int
    history_buffer_length: int
    out_dim: int = 20
    activation: str = "elu"
    channel_size: int = 10

    @nn.compact
    def __call__(self, obs_history):
        act = _ACTIVATIONS[self.activation]
        c = self.channel_size
        x = act(nn.Dense(3 * c)(obs_history))            # (B, H, 3c)
        length = self.history_buffer_length
        if length >= 4:
            x = act(nn.Conv(2 * c, kernel_size=(4,), strides=(2,), padding="VALID")(x))
            length = (length - 4) // 2 + 1
        if length >= 2:
            x = act(nn.Conv(c, kernel_size=(2,), strides=(1,), padding="VALID")(x))
            length = length - 1
        # torch flattens channel-major (B, C, L); transpose to match so that
        # converted reference weights stay compatible
        x = jnp.swapaxes(x, -1, -2).reshape(x.shape[:-2] + (-1,))
        return act(nn.Dense(self.out_dim)(x))


class ActorCriticNetworks:
    """Bundle of modules + pure apply helpers (no parameters owned)."""

    def __init__(self, cfg_policy, num_proprio, num_privileged_obs, num_critic_obs,
                 num_estimated_obs, num_scan_obs, num_actions, history_buffer_length):
        p = cfg_policy
        self.num_proprio = num_proprio
        self.history_buffer_length = history_buffer_length
        self.num_actions = num_actions
        self.actor = Actor(tuple(p.actor_hidden_dims), num_actions, p.activation)
        self.critic = Critic(tuple(p.critic_hidden_dims), p.activation)
        self.priv_encoder = PrivilegedEncoder(
            tuple(p.priv_encoder_hidden_dims), p.latent_encoder_output_dim, "elu"
        )
        self.scan_encoder = ScanEncoder(
            tuple(p.scan_encoder_hidden_dims), p.scan_encoder_output_dim, "elu"
        )
        self.adapt_encoder = AdaptationEncoder(
            num_proprio, history_buffer_length, p.latent_encoder_output_dim, "elu"
        )
        self.estimator = MlpEstimator(
            num_proprio, history_buffer_length, num_estimated_obs,
            tuple(p.estimator_hidden_dims), p.activation, p.use_history,
        )
        self.init_noise_std = p.init_noise_std
        self.dims = dict(
            num_obs=num_proprio * (1 + history_buffer_length),
            num_privileged_obs=num_privileged_obs,
            num_critic_obs=num_critic_obs,
            num_estimated_obs=num_estimated_obs,
            num_scan_obs=num_scan_obs,
        )

    def init_params(self, key):
        d = self.dims
        ks = jax.random.split(key, 6)
        obs = jnp.zeros((1, d["num_obs"]))
        hist = jnp.zeros((1, self.history_buffer_length, self.num_proprio))
        actor_in = jnp.zeros(
            (1, d["num_obs"] + self.priv_encoder.out_dim + self.scan_encoder.out_dim
             + d["num_estimated_obs"])
        )
        return {
            "actor": self.actor.init(ks[0], actor_in),
            "critic": self.critic.init(ks[1], jnp.zeros((1, d["num_critic_obs"]))),
            "priv_encoder": self.priv_encoder.init(
                ks[2], jnp.zeros((1, d["num_privileged_obs"]))
            ),
            "scan_encoder": self.scan_encoder.init(
                ks[3], jnp.zeros((1, d["num_scan_obs"]))
            ),
            "adapt_encoder": self.adapt_encoder.init(ks[4], hist),
            "estimator": self.estimator.init(ks[5], obs),
            "std": self.init_noise_std * jnp.ones(self.num_actions),
        }

    # ---- pure applies -------------------------------------------------
    def history_part(self, obs):
        """Slice + reshape the history block (actor_critic.py:179-180)."""
        hist = obs[..., : -self.num_proprio]
        return hist.reshape(obs.shape[:-1] + (self.history_buffer_length, self.num_proprio))

    def latent(self, params, obs, privileged_obs, adaptation_mode: bool):
        if adaptation_mode:
            return self.adapt_encoder.apply(params["adapt_encoder"], self.history_part(obs))
        return self.priv_encoder.apply(params["priv_encoder"], privileged_obs)

    def action_mean(self, params, obs, privileged_obs, estimated_obs, scan_obs,
                    adaptation_mode: bool):
        lat = self.latent(params, obs, privileged_obs, adaptation_mode)
        scan_lat = self.scan_encoder.apply(params["scan_encoder"], scan_obs)
        actor_in = jnp.concatenate([obs, lat, scan_lat, estimated_obs], axis=-1)
        return self.actor.apply(params["actor"], actor_in)

    def value(self, params, critic_obs):
        return self.critic.apply(params["critic"], critic_obs)[..., 0]

    def estimate(self, params, obs):
        return self.estimator.apply(params["estimator"], obs)
