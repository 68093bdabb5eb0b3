"""PPO with ROA regularization, state-estimator supervision and DAgger.

Pure-functional re-design of the reference PPO (rsl_rl/algorithms/ppo.py):
  * clipped surrogate + clipped value loss + entropy bonus      (:248-270)
  * adaptive-KL learning rate (:234-246) or fixed schedule
  * ROA regularization ||priv_latent - sg(adapt_latent)|| with the linear
    coefficient schedule 0->0.05 over updates 5000..15000, flat 0.1 on
    resume                                                      (:39-46, :211-221)
  * supervised estimator loss ||est(obs) - true||^2             (:223-231)
  * DAgger distillation of the adaptation encoder every
    dagger_update_freq iterations                               (:309-349)
  * three Adam groups: policy(actor+critic+priv+scan+std) /
    adaptation / estimator                                      (:58-70)
  * GAE with advantage normalization (rollout_storage.py:110-124), minibatch
    permutation drawn once and reused across epochs (:134-181), time-out
    value bootstrapping (:165-166), max-std clamp (:301-307).

The rollout buffer is just the stacked pytree produced by `lax.scan` over the
env step — no mutable storage class.  Multi-device: the env batch is sharded
on the mesh 'data' axis and parameters are replicated; XLA's GSPMD partitioner
inserts the all-reduce over ICI for every batch-mean (grads, advantage stats)
automatically — verified by the compiled-HLO check in tests/test_sharding.py.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from legged_gym_custom_tpu.models.networks import ActorCriticNetworks


class PPOConfig(NamedTuple):
    clip_param: float = 0.2
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.01
    learning_rate: float = 1e-3
    estimator_learning_rate: float = 1e-3
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = True
    schedule: str = "adaptive"
    desired_kl: float = 0.01
    gamma: float = 0.99
    lam: float = 0.95
    max_action_std: float = 1.0
    # ROA schedule (reference ppo.py:41-43); resume flips to flat 0.1
    roa_start_val: float = 0.0
    roa_end_val: float = 0.05
    roa_start_step: float = 5000.0
    roa_duration: float = 10000.0

    @staticmethod
    def from_cfg(alg_cfg, resume: bool = False) -> "PPOConfig":
        base = PPOConfig(
            clip_param=alg_cfg.clip_param,
            num_learning_epochs=alg_cfg.num_learning_epochs,
            num_mini_batches=alg_cfg.num_mini_batches,
            value_loss_coef=alg_cfg.value_loss_coef,
            entropy_coef=alg_cfg.entropy_coef,
            learning_rate=alg_cfg.learning_rate,
            estimator_learning_rate=getattr(
                alg_cfg, "estimator_learning_rate", alg_cfg.learning_rate
            ),
            max_grad_norm=alg_cfg.max_grad_norm,
            use_clipped_value_loss=alg_cfg.use_clipped_value_loss,
            schedule=alg_cfg.schedule,
            desired_kl=alg_cfg.desired_kl,
            gamma=alg_cfg.gamma,
            lam=alg_cfg.lam,
        )
        if resume:
            base = base._replace(
                roa_start_val=0.0, roa_end_val=0.1, roa_start_step=0.0, roa_duration=1.0
            )
        return base


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state_policy: Any
    opt_state_adapt: Any
    opt_state_est: Any
    learning_rate: jnp.ndarray   # () adaptive-KL LR (policy group)
    total_updates: jnp.ndarray   # () counts update() + update_dagger()


POLICY_GROUP = ("actor", "critic", "priv_encoder", "scan_encoder", "std")


def _subset(params, keys):
    return {k: params[k] for k in keys}


def make_optimizers(cfg: PPOConfig):
    # inject_hyperparams lets the adaptive-KL schedule set the LR dynamically
    policy_opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )
    adapt_opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )
    est_opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.estimator_learning_rate),
    )
    return policy_opt, adapt_opt, est_opt


def init_train_state(nets: ActorCriticNetworks, cfg: PPOConfig, key) -> TrainState:
    params = nets.init_params(key)
    policy_opt, adapt_opt, est_opt = make_optimizers(cfg)
    return TrainState(
        params=params,
        opt_state_policy=policy_opt.init(_subset(params, POLICY_GROUP)),
        opt_state_adapt=adapt_opt.init(_subset(params, ("adapt_encoder",))),
        opt_state_est=est_opt.init(_subset(params, ("estimator",))),
        learning_rate=jnp.asarray(cfg.learning_rate, jnp.float32),
        total_updates=jnp.zeros((), jnp.float32),
    )


class Transition(NamedTuple):
    """One rollout step across all envs (rollout_storage.py Transition)."""

    obs: jnp.ndarray
    privileged: jnp.ndarray
    critic: jnp.ndarray
    estimated: jnp.ndarray       # ground-truth estimator targets
    scan: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_probs: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


def policy_act(nets, params, obs5, key, adaptation_mode: bool):
    """Sample an action + bookkeeping (reference ppo.py:129-153)."""
    estimated = nets.estimate(params, obs5.obs)
    mean = nets.action_mean(
        params, obs5.obs, obs5.privileged, estimated, obs5.scan, adaptation_mode
    )
    std = jnp.broadcast_to(params["std"], mean.shape)
    noise = jax.random.normal(key, mean.shape)
    actions = mean + std * noise
    log_prob = gaussian_log_prob(actions, mean, std)
    values = nets.value(params, obs5.critic)
    return actions, log_prob, mean, std, values


def gaussian_log_prob(x, mean, std):
    var = std**2
    lp = -0.5 * ((x - mean) ** 2 / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * std**2), axis=-1)


def compute_gae(traj: Transition, last_values, gamma, lam):
    """GAE over the (T, B) trajectory (rollout_storage.py:110-124)."""
    def body(carry, t):
        adv_next, v_next = carry
        not_terminal = 1.0 - t.dones.astype(jnp.float32)
        delta = t.rewards + not_terminal * gamma * v_next - t.values
        adv = delta + not_terminal * gamma * lam * adv_next
        return (adv, t.values), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_values), last_values),
        traj,
        reverse=True,
    )
    returns = advantages + traj.values
    mean = jnp.mean(advantages)
    var = jnp.mean((advantages - mean) ** 2)
    norm_adv = (advantages - mean) / (jnp.sqrt(var) + 1e-8)
    return returns, norm_adv


def roa_coefficient(cfg: PPOConfig, total_updates):
    stage = jnp.clip((total_updates - cfg.roa_start_step) / cfg.roa_duration, 0.0, 1.0)
    return cfg.roa_start_val + stage * (cfg.roa_end_val - cfg.roa_start_val)


def ppo_update(
    nets: ActorCriticNetworks,
    cfg: PPOConfig,
    ts: TrainState,
    traj: Transition,
    returns,
    advantages,
    key,
    axis_name=None,
):
    """Full PPO update: epochs x minibatches (reference ppo.py:182-293).

    traj leaves are (T, B, ...); flattened to (T*B, ...) and permuted once
    (same permutation reused across epochs, rollout_storage.py:142).

    `axis_name`: set when running under `shard_map` over the mesh 'data'
    axis (rl/runner.py) — each device permutes and minibatches its *local*
    env shard (zero data movement) and gradients/metrics are pmean-reduced
    over ICI, the TPU analog of the reference's dead horovod path
    (SURVEY §2.5(b)).
    """
    T, B = traj.rewards.shape
    batch = T * B
    nmb = cfg.num_mini_batches
    mb_size = batch // nmb

    flat = jax.tree.map(lambda x: x.reshape((batch,) + x.shape[2:]), traj)
    returns_f = returns.reshape(batch)
    adv_f = advantages.reshape(batch)
    if axis_name is not None:  # decorrelate the per-device local permutations
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    perm = jax.random.permutation(key, batch)[: nmb * mb_size]

    data = (flat, returns_f, adv_f)
    policy_opt, adapt_opt, est_opt = make_optimizers(cfg)
    reg_coef = roa_coefficient(cfg, ts.total_updates)

    def loss_fn(policy_params, est_params, other_params, mb, lr_unused):
        params = {**other_params, **policy_params, **est_params}
        t, ret, adv = mb
        estimated = nets.estimate(params, t.obs)  # grads flow to estimator only
        mean = nets.action_mean(
            params, t.obs, t.privileged, t.estimated, t.scan, adaptation_mode=False
        )
        std = jnp.broadcast_to(params["std"], mean.shape)
        log_prob = gaussian_log_prob(t.actions, mean, std)
        value = nets.value(params, t.critic)
        entropy = gaussian_entropy(std)

        # ROA regularization (adapt latent is stop-gradient, ppo.py:211-216)
        priv_latent = nets.priv_encoder.apply(params["priv_encoder"], t.privileged)
        adapt_latent = jax.lax.stop_gradient(
            nets.adapt_encoder.apply(params["adapt_encoder"], nets.history_part(t.obs))
        )
        reg_loss = jnp.mean(
            jnp.linalg.norm(priv_latent - adapt_latent, axis=-1)
        )

        # estimator supervised loss (ppo.py:223-225)
        est_loss = jnp.mean(
            jnp.sum((estimated - t.estimated) ** 2, axis=-1)
        )

        ratio = jnp.exp(log_prob - t.log_probs)
        surr = -adv * ratio
        surr_clipped = -adv * jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param)
        surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))

        if cfg.use_clipped_value_loss:
            v_clipped = t.values + jnp.clip(
                value - t.values, -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum((value - ret) ** 2, (v_clipped - ret) ** 2)
            )
        else:
            value_loss = jnp.mean((ret - value) ** 2)

        loss = (
            surrogate_loss
            + cfg.value_loss_coef * value_loss
            - cfg.entropy_coef * jnp.mean(entropy)
            + reg_coef * reg_loss
        )
        # KL for adaptive LR (ppo.py:236-238)
        kl = jnp.sum(
            jnp.log(std / t.sigma + 1e-5)
            + (t.sigma**2 + (t.mu - mean) ** 2) / (2.0 * std**2)
            - 0.5,
            axis=-1,
        )
        aux = dict(
            value_loss=value_loss,
            surrogate_loss=surrogate_loss,
            reg_loss=reg_loss,
            est_loss=est_loss,
            kl_mean=jnp.mean(kl),
        )
        return loss + est_loss, aux

    def minibatch_step(carry, i):
        params, opt_p, opt_e, lr = carry
        idx = jax.lax.dynamic_slice_in_dim(perm, (i % nmb) * mb_size, mb_size)
        mb = jax.tree.map(lambda x: x[idx], data)

        policy_params = _subset(params, POLICY_GROUP)
        est_params = _subset(params, ("estimator",))
        other = {k: v for k, v in params.items() if k not in POLICY_GROUP and k != "estimator"}
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            policy_params, est_params, other, mb, lr
        )
        g_policy, g_est = grads
        if axis_name is not None:
            # ICI gradient reduction; aux is reduced too so the adaptive-KL
            # LR below evolves identically on every device
            g_policy = jax.lax.pmean(g_policy, axis_name)
            g_est = jax.lax.pmean(g_est, axis_name)
            aux = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), aux)

        # adaptive-KL LR (ppo.py:234-246)
        if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
            kl = aux["kl_mean"]
            lr = jnp.where(
                kl > cfg.desired_kl * 2.0,
                jnp.maximum(1e-5, lr / 1.5),
                jnp.where(
                    (kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                    jnp.minimum(1e-2, lr * 1.5),
                    lr,
                ),
            )
        opt_p_h = opt_p
        opt_p_h[1].hyperparams["learning_rate"] = lr
        updates, opt_p2 = policy_opt.update(g_policy, opt_p_h, policy_params)
        policy_params = optax.apply_updates(policy_params, updates)
        updates_e, opt_e2 = est_opt.update(g_est, opt_e, est_params)
        est_params = optax.apply_updates(est_params, updates_e)
        params = {**params, **policy_params, **est_params}
        return (params, opt_p2, opt_e2, lr), aux

    carry0 = (ts.params, ts.opt_state_policy, ts.opt_state_est, ts.learning_rate)
    (params, opt_p, opt_e, lr), auxs = jax.lax.scan(
        minibatch_step, carry0, jnp.arange(cfg.num_learning_epochs * nmb)
    )
    # max-std clamp (ppo.py:301-307)
    params = {**params, "std": jnp.minimum(params["std"], cfg.max_action_std)}
    metrics = jax.tree.map(jnp.mean, auxs)
    metrics["reg_coef"] = roa_coefficient(cfg, ts.total_updates)
    metrics["learning_rate"] = lr
    ts = ts.replace(
        params=params,
        opt_state_policy=opt_p,
        opt_state_est=opt_e,
        learning_rate=lr,
        total_updates=ts.total_updates + 1.0,
    )
    return ts, metrics


def dagger_update(
    nets: ActorCriticNetworks,
    cfg: PPOConfig,
    ts: TrainState,
    traj: Transition,
    key,
    axis_name=None,
):
    """Adaptation-encoder distillation (reference ppo.py:309-349).

    `axis_name`: see ppo_update — device-local minibatches, pmean'd grads.
    """
    T, B = traj.rewards.shape
    batch = T * B
    nmb = cfg.num_mini_batches
    mb_size = batch // nmb
    flat_obs = traj.obs.reshape((batch,) + traj.obs.shape[2:])
    flat_priv = traj.privileged.reshape((batch,) + traj.privileged.shape[2:])
    if axis_name is not None:  # decorrelate the per-device local permutations
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    perm = jax.random.permutation(key, batch)[: nmb * mb_size]
    _, adapt_opt, _ = make_optimizers(cfg)

    def loss_fn(adapt_params, obs, priv, frozen):
        priv_latent = jax.lax.stop_gradient(
            nets.priv_encoder.apply(frozen["priv_encoder"], priv)
        )
        adapt_latent = nets.adapt_encoder.apply(
            adapt_params["adapt_encoder"], nets.history_part(obs)
        )
        return jnp.mean(jnp.linalg.norm(priv_latent - adapt_latent, axis=-1))

    def minibatch_step(carry, i):
        params, opt_a = carry
        idx = jax.lax.dynamic_slice_in_dim(perm, (i % nmb) * mb_size, mb_size)
        obs = flat_obs[idx]
        priv = flat_priv[idx]
        adapt_params = _subset(params, ("adapt_encoder",))
        loss, grads = jax.value_and_grad(loss_fn)(adapt_params, obs, priv, params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_a2 = adapt_opt.update(grads, opt_a, adapt_params)
        adapt_params = optax.apply_updates(adapt_params, updates)
        return ({**params, **adapt_params}, opt_a2), loss

    (params, opt_a), losses = jax.lax.scan(
        minibatch_step,
        (ts.params, ts.opt_state_adapt),
        jnp.arange(cfg.num_learning_epochs * nmb),
    )
    ts = ts.replace(
        params=params,
        opt_state_adapt=opt_a,
        total_updates=ts.total_updates + 1.0,
    )
    return ts, {"adaptation_loss": jnp.mean(losses)}
