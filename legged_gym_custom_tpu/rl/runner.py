"""Training driver (reference rsl_rl/runners/on_policy_runner.py).

One *iteration* = 24-step rollout (`lax.scan` over the env step + policy act)
followed by either a PPO update or a DAgger update (every dagger_update_freq
iterations, on_policy_runner.py:147,182-186).  The iteration runs as two
jitted phases (collection / learning) so their wall-clock split can be
reported like the reference's Perf scalars.  With a multi-device mesh the env
batch is placed on the 'data' axis and parameters replicated; XLA's GSPMD
partitioner inserts the ICI all-reduces for gradient/statistics means
(SURVEY §2.5; asserted on compiled HLO by tests/test_sharding.py).

Logging keeps the reference's TensorBoard scalar names
(on_policy_runner.py:221-239) and console block; checkpoints store model +
*all three* optimizer states + iteration (fixing the reference quirk of
dropping the adaptation/estimator optimizers, on_policy_runner.py:283-288).
"""
from __future__ import annotations

import functools
import os
import pickle
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_custom_tpu.models.networks import ActorCriticNetworks
from legged_gym_custom_tpu.utils import checkpoint as checkpoint_lib
from legged_gym_custom_tpu.parallel.mesh import make_mesh, shard_env_state
from . import ppo as ppo_lib
from .ppo import PPOConfig, Transition, TrainState


class _EpisodeWindow:
    """Mean reward / episode length over the most recent ~`target_episodes`
    finished episodes, from per-iteration (rew_sum, len_sum, count) aggregates.

    The reference keeps a deque of the last 100 individual episode rewards
    (on_policy_runner.py:130-131,163-171); computing that exactly would need
    the per-episode values on the host.  Here the device hands over three
    scalars per iteration and the window covers the most recent iterations
    whose cumulative episode count reaches the target — identical semantics
    at iteration granularity (at 4096 envs ~100 episodes finish per iteration
    anyway, so the windows coincide in practice)."""

    def __init__(self, target_episodes: int = 100, max_iters: int = 200):
        self.target = target_episodes
        self.entries = deque(maxlen=max_iters)

    def push(self, rew_sum: float, len_sum: float, count: int):
        if count > 0:
            self.entries.append((rew_sum, len_sum, count))

    def means(self):
        """Returns (mean_reward, mean_length, have_any)."""
        rew = length = n = 0.0
        for rs, ls, c in reversed(self.entries):
            rew += rs
            length += ls
            n += c
            if n >= self.target:
                break
        if n == 0:
            return 0.0, 0.0, False
        return rew / n, length / n, True


class OnPolicyRunner:
    def __init__(self, env, train_cfg, log_dir: Optional[str] = None,
                 use_mesh: bool = True, writer=None, mesh=None):
        self.env = env
        self.cfg = train_cfg.runner
        self.alg_cfg = train_cfg.algorithm
        self.policy_cfg = train_cfg.policy
        self.log_dir = log_dir
        self.writer = writer

        ecfg = env.cfg.env
        self.nets = ActorCriticNetworks(
            self.policy_cfg,
            num_proprio=ecfg.num_proprio,
            num_privileged_obs=ecfg.num_privileged_obs,
            num_critic_obs=ecfg.num_critic_obs,
            num_estimated_obs=ecfg.num_estimated_obs,
            num_scan_obs=ecfg.num_scan_obs,
            num_actions=ecfg.num_actions,
            history_buffer_length=ecfg.history_buffer_length,
        )
        self.ppo_cfg = PPOConfig.from_cfg(self.alg_cfg, resume=self.cfg.resume)
        self.dagger_update_freq = self.alg_cfg.dagger_update_freq
        self.num_steps_per_env = self.cfg.num_steps_per_env
        self.save_interval = self.cfg.save_interval

        seed = getattr(train_cfg, "seed", 1)
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.train_state = ppo_lib.init_train_state(self.nets, self.ppo_cfg, init_key)

        if mesh is not None:
            self.mesh = mesh
        else:
            self.mesh = make_mesh(env.cfg.parallel) if use_mesh else None
        self._build_train_fns()

        self.tot_timesteps = 0
        self.tot_time = 0.0
        self.current_learning_iteration = 0
        self.env_state = None
        self.obs = None

    # ------------------------------------------------------------------
    def _build_train_fns(self):
        env = self.env
        nets = self.nets
        cfg = self.ppo_cfg
        T = self.num_steps_per_env

        def rollout(ts: TrainState, env_state, obs, key, cur_rew, cur_len,
                    adaptation_mode: bool):
            B = env.num_envs
            nterms = len(env.episode_sum_names)
            acc0 = dict(
                ep=jnp.zeros((B, nterms)),
                fin_rew=jnp.zeros(B),
                fin_len=jnp.zeros(B, jnp.int32),
                fin_count=jnp.zeros(B, jnp.int32),
            )

            def body(carry, _):
                env_state, obs, key, cur_rew, cur_len, acc = carry
                key, k_act = jax.random.split(key)
                actions, log_prob, mu, sigma, values = ppo_lib.policy_act(
                    nets, ts.params, obs, k_act, adaptation_mode
                )
                next_state, next_obs, rewards, dones, info = env.step(env_state, actions)
                # time-out bootstrap (reference ppo.py:165-166)
                rewards_b = rewards + cfg.gamma * values * info["time_outs"].astype(
                    jnp.float32
                )
                tr = Transition(
                    obs=obs.obs,
                    privileged=obs.privileged,
                    critic=obs.critic,
                    estimated=obs.estimated,
                    scan=obs.scan,
                    actions=actions,
                    rewards=rewards_b,
                    dones=dones,
                    values=values,
                    log_probs=log_prob,
                    mu=mu,
                    sigma=sigma,
                )
                # On-device episode bookkeeping (reference on_policy_runner.py
                # :163-171's cur_reward_sum/rewbuffer, without shipping the
                # (T, B) rewards/dones arrays to the host — SURVEY §2.5(d)).
                # All accumulation is PER-ENV in the carry (elementwise on the
                # sharded batch axis): a batch-sum here would put an
                # all-reduce inside every scan step of the sharded HLO
                # (scripts/comm_budget.py); the single reduction happens once
                # after the scan.
                cur_rew = cur_rew + rewards  # raw rewards, not bootstrapped
                cur_len = cur_len + 1
                fin = dones > 0
                acc = dict(
                    ep=acc["ep"] + info["episode_contrib"],
                    fin_rew=acc["fin_rew"] + jnp.where(fin, cur_rew, 0.0),
                    fin_len=acc["fin_len"] + jnp.where(fin, cur_len, 0),
                    fin_count=acc["fin_count"] + fin.astype(jnp.int32),
                )
                cur_rew = jnp.where(fin, 0.0, cur_rew)
                cur_len = jnp.where(fin, 0, cur_len)
                return (next_state, next_obs, key, cur_rew, cur_len, acc), tr

            (env_state, obs, key, cur_rew, cur_len, acc), traj = jax.lax.scan(
                body, (env_state, obs, key, cur_rew, cur_len, acc0), None,
                length=T,
            )
            return env_state, obs, traj, acc, cur_rew, cur_len

        def collect_phase(ts, env_state, obs, key, cur_rew, cur_len,
                          adaptation_mode: bool):
            """Rollout + GAE (the reference's 'collection' half,
            on_policy_runner.py:149-181)."""
            env_state, obs, traj, acc, cur_rew, cur_len = rollout(
                ts, env_state, obs, key, cur_rew, cur_len, adaptation_mode
            )
            last_values = nets.value(ts.params, obs.critic)
            returns, advantages = ppo_lib.compute_gae(
                traj, last_values, cfg.gamma, cfg.lam
            )
            # The one cross-shard reduction of the episode stats.  Episode
            # means are now episode-weighted over the whole iteration
            # (sum of per-episode sums / total finished episodes) — the
            # reference's deque-of-episodes semantics — rather than the
            # round-4 mean-of-per-step-means.
            n_resets = jnp.sum(acc["fin_count"]).astype(jnp.float32)
            denom = jnp.maximum(n_resets, 1.0)
            ep = {
                "rew_" + nm: jnp.sum(acc["ep"][:, i]) / denom
                / env.max_episode_length_s
                for i, nm in enumerate(env.episode_sum_names)
            }
            # curriculum telemetry from the post-rollout state (was a
            # per-step batch-mean inside env.step)
            if env.cfg.terrain.curriculum:
                ep["terrain_level"] = jnp.mean(
                    env_state.terrain_levels.astype(jnp.float32)
                )
            if env.cfg.commands.curriculum:
                ep["max_command_x"] = env_state.command_ranges[0, 1]
                ep["min_command_x"] = env_state.command_ranges[0, 0]
            logs = dict(
                episode=ep,
                n_resets=n_resets,
                fin_rew_sum=jnp.sum(acc["fin_rew"]),
                fin_len_sum=jnp.sum(acc["fin_len"]),
                fin_count=jnp.sum(acc["fin_count"]),
            )
            return env_state, obs, traj, returns, advantages, logs, cur_rew, cur_len

        def update_phase(ts, traj, returns, advantages, key,
                         adaptation_mode: bool, axis_name=None):
            """PPO or DAgger update (the reference's 'learning' half)."""
            if adaptation_mode:
                ts, metrics = ppo_lib.dagger_update(
                    nets, cfg, ts, traj, key, axis_name=axis_name
                )
            else:
                ts, metrics = ppo_lib.ppo_update(
                    nets, cfg, ts, traj, returns, advantages, key,
                    axis_name=axis_name,
                )
            metrics = dict(metrics)
            metrics["mean_std"] = jnp.mean(ts.params["std"])
            return ts, metrics

        # Two jitted phases (collection / learning) so the runner can report
        # the reference's Perf/collection_time vs Perf/learning_time split
        # honestly (on_policy_runner.py:175-189,230-232).
        #
        # Collection: sharding comes from input placement — `_shard_state`
        # puts the env batch on the 'data' mesh axis and XLA's GSPMD
        # partitioner keeps the whole rollout device-local, inserting the
        # ICI all-reduce only for the advantage-normalization statistics.
        #
        # Learning: runs under `shard_map` over the 'data' axis so each
        # device permutes and minibatches its *local* (T, B/n) trajectory
        # shard (zero cross-chip data movement) and only the gradients and
        # scalar metrics cross ICI via pmean — plain GSPMD would instead
        # all-gather the flattened batch to every device because of the
        # random-permutation gather.  Both facts are asserted on compiled
        # HLO by tests/test_sharding.py.
        self._collect = {
            mode: jax.jit(
                functools.partial(collect_phase, adaptation_mode=mode),
                donate_argnums=(1, 2, 4, 5),
            )
            for mode in (False, True)
        }
        multi = self.mesh is not None and np.prod(self.mesh.devices.shape) > 1
        if multi:
            n_dev = int(np.prod(self.mesh.devices.shape))
            if env.num_envs % n_dev != 0:
                raise ValueError(
                    f"num_envs ({env.num_envs}) must be divisible by the mesh "
                    f"size ({n_dev}): shard_map would otherwise silently pad "
                    "the env shards and mis-weight per-device batch means"
                )
            from jax.sharding import PartitionSpec as P

            axis = self.mesh.axis_names[0]
            data2 = P(None, axis)  # (T, B, ...) leaves sharded on B
            # only ts (argnums 0) is donated: the update's outputs (new
            # params/opt states) alias its buffers; traj/returns have no
            # matching outputs so donating them is a no-op
            self._update = {
                mode: jax.jit(
                    jax.shard_map(
                        functools.partial(
                            update_phase, adaptation_mode=mode, axis_name=axis
                        ),
                        mesh=self.mesh,
                        in_specs=(P(), data2, data2, data2, P()),
                        out_specs=(P(), P()),
                        check_vma=False,
                    ),
                    donate_argnums=(0,),
                )
                for mode in (False, True)
            }
            self._shard_state = lambda s: shard_env_state(self.mesh, s)
        else:
            self._update = {
                mode: jax.jit(
                    functools.partial(update_phase, adaptation_mode=mode),
                    donate_argnums=(0,),
                )
                for mode in (False, True)
            }
            self._shard_state = lambda s: s
        # composite iteration (same signature the bench/dryrun callers use)
        self._train_it = {
            mode: functools.partial(self._run_iteration, mode)
            for mode in (False, True)
        }
        self._collection_time = 0.0
        self._learn_time = 0.0
        # pack every per-iteration logging scalar into ONE device array so
        # the host pays a single D2H round-trip per iteration instead of ~40
        # (each np.asarray on a device scalar is a full tunnel RTT here)
        self._pack_scalars = jax.jit(
            lambda leaves: jnp.stack([jnp.asarray(l, jnp.float32) for l in leaves])
        )
        # per-env episode accumulators, device-resident (lazily initialized so
        # they inherit the sharding layout of their first use)
        self._cur_rew = None
        self._cur_len = None

    def _run_iteration(self, mode, ts, env_state, obs, key, timeit=False):
        if self._cur_rew is None:
            self._cur_rew = jnp.zeros(self.env.num_envs)
            self._cur_len = jnp.zeros(self.env.num_envs, jnp.int32)
        k_roll, k_upd = jax.random.split(key)
        t0 = time.time()
        (
            env_state, obs, traj, returns, advantages, logs,
            self._cur_rew, self._cur_len,
        ) = self._collect[mode](
            ts, env_state, obs, k_roll, self._cur_rew, self._cur_len
        )
        if timeit:
            jax.block_until_ready(returns)
            self._collection_time = time.time() - t0
        t1 = time.time()
        ts, metrics = self._update[mode](ts, traj, returns, advantages, k_upd)
        if timeit:
            jax.block_until_ready(metrics)
            self._learn_time = time.time() - t1
        return ts, env_state, obs, metrics, logs

    def _host_scalars(self, metrics, logs):
        """One batched D2H transfer for all logging scalars -> python floats."""
        leaves, treedef = jax.tree.flatten((metrics, logs))
        packed = np.asarray(self._pack_scalars(leaves))
        return jax.tree.unflatten(treedef, [float(v) for v in packed])

    # ------------------------------------------------------------------
    def learn(self, num_learning_iterations: int, init_at_random_ep_len: bool = False):
        if self.log_dir is not None and self.writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                os.makedirs(self.log_dir, exist_ok=True)
                self.writer = SummaryWriter(log_dir=self.log_dir, flush_secs=10)
            except Exception:
                self.writer = None

        if self.env_state is None:
            self.key, k_reset = jax.random.split(self.key)
            self.env_state, self.obs = self.env.reset_all(
                k_reset, init_at_random_ep_len=init_at_random_ep_len
            )
            self.env_state = self._shard_state(self.env_state)

        ep_window = _EpisodeWindow(target_episodes=100)

        tot_iter = self.current_learning_iteration + num_learning_iterations
        metrics = {}
        for it in range(self.current_learning_iteration, tot_iter):
            start = time.time()
            use_adaptation = it % self.dagger_update_freq == 0
            self.key, k_it = jax.random.split(self.key)
            (
                self.train_state,
                self.env_state,
                self.obs,
                metrics,
                logs,
            ) = self._run_iteration(
                use_adaptation,
                self.train_state,
                self.env_state,
                self.obs,
                k_it,
                timeit=True,
            )
            iter_time = time.time() - start

            # single batched transfer of every logging scalar
            metrics, logs = self._host_scalars(metrics, logs)

            # episode bookkeeping: device-reduced scalars per iteration
            # (the per-env accumulation ran inside the collection phase)
            ep_window.push(
                logs["fin_rew_sum"], logs["fin_len_sum"], int(logs["fin_count"])
            )

            self.tot_timesteps += self.num_steps_per_env * self.env.num_envs
            self.tot_time += iter_time
            fps = int(self.num_steps_per_env * self.env.num_envs / iter_time)
            self._log(it, tot_iter, metrics, logs, fps, iter_time, ep_window)
            # keep the counter live so mid-run checkpoints carry the true
            # iteration (a stale counter made every mid-run ckpt resume at 0)
            self.current_learning_iteration = it + 1
            if it % self.save_interval == 0 and self.log_dir is not None:
                self.save(os.path.join(self.log_dir, f"model_{it}.ckpt"))
        if self.log_dir is not None:
            self.save(os.path.join(self.log_dir, f"model_{tot_iter}.ckpt"))
        return metrics

    # ------------------------------------------------------------------
    def _log(self, it, tot_iter, metrics, logs, fps, iter_time, ep_window,
             width=80, pad=35):
        mean_reward, mean_len, have_eps = ep_window.means()
        m = metrics  # host floats (learn() ran _host_scalars)
        if self.writer is not None:
            for key, val in logs["episode"].items():
                self.writer.add_scalar("Episode/" + key, val, it)
            self.writer.add_scalar("Loss/value_function", m.get("value_loss", 0.0), it)
            self.writer.add_scalar("Loss/surrogate", m.get("surrogate_loss", 0.0), it)
            self.writer.add_scalar("Loss/regularization", m.get("reg_loss", 0.0), it)
            self.writer.add_scalar("Loss/regularization coef", m.get("reg_coef", 0.0), it)
            self.writer.add_scalar("Loss/adaptation", m.get("adaptation_loss", 0.0), it)
            self.writer.add_scalar("Loss/estimator", m.get("est_loss", 0.0), it)
            self.writer.add_scalar("Loss/learning_rate", m.get("learning_rate", 0.0), it)
            self.writer.add_scalar("Policy/mean_noise_std", m.get("mean_std", 0.0), it)
            self.writer.add_scalar("Perf/total_fps", fps, it)
            self.writer.add_scalar("Perf/collection time", self._collection_time, it)
            self.writer.add_scalar("Perf/learning_time", self._learn_time, it)
            if have_eps:
                self.writer.add_scalar("Train/mean_reward", mean_reward, it)
                self.writer.add_scalar(
                    "Train/mean_episode_length", mean_len, it
                )
        head = f" Learning iteration {it}/{tot_iter} "
        lines = [
            "#" * width,
            head.center(width),
            f"{'Computation:':>{pad}} {fps:.0f} steps/s (collection: "
            f"{self._collection_time:.3f}s, learning {self._learn_time:.3f}s)",
            f"{'Value function loss:':>{pad}} {m.get('value_loss', 0.0):.4f}",
            f"{'Surrogate loss:':>{pad}} {m.get('surrogate_loss', 0.0):.4f}",
            f"{'Adaptation loss:':>{pad}} {m.get('adaptation_loss', 0.0):.4f}",
            f"{'Regularization loss:':>{pad}} {m.get('reg_loss', 0.0):.4f}",
            f"{'Estimator loss:':>{pad}} {m.get('est_loss', 0.0):.4f}",
            f"{'Mean action noise std:':>{pad}} {m.get('mean_std', 0.0):.2f}",
        ]
        if have_eps:
            lines.append(f"{'Mean reward:':>{pad}} {mean_reward:.2f}")
            lines.append(f"{'Mean episode length:':>{pad}} {mean_len:.2f}")
        lines.append(f"{'Total timesteps:':>{pad}} {self.tot_timesteps}")
        lines.append(f"{'Total time:':>{pad}} {self.tot_time:.2f}s")
        print("\n".join(lines))

    # ------------------------------------------------------------------
    def save(self, path, infos=None):
        """Checkpoint model + ALL THREE optimizer states + iteration.

        Orbax directory format by default (multi-host sharded-array safe,
        utils/checkpoint.py); single-file pickle fallback if orbax is
        unavailable.  The reference saves only the main optimizer
        (on_policy_runner.py:283-288) — fixed here.
        """
        arrays = {
            "params": self.train_state.params,
            "opt_state_policy": self.train_state.opt_state_policy,
            "opt_state_adapt": self.train_state.opt_state_adapt,
            "opt_state_est": self.train_state.opt_state_est,
        }
        meta = {
            "learning_rate": float(self.train_state.learning_rate),
            "total_updates": float(self.train_state.total_updates),
            "iter": self.current_learning_iteration,
            "infos": infos,
        }
        if checkpoint_lib.have_orbax():
            checkpoint_lib.save_checkpoint(path, arrays, meta)
            return
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        payload = dict(jax.tree.map(np.asarray, arrays), **meta)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path, load_optimizer=True):
        if os.path.isdir(path):
            target = {
                "params": self.train_state.params,
                "opt_state_policy": self.train_state.opt_state_policy,
                "opt_state_adapt": self.train_state.opt_state_adapt,
                "opt_state_est": self.train_state.opt_state_est,
            }
            arrays, meta = checkpoint_lib.load_checkpoint(path, target=target)
            payload = dict(arrays, **meta)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        ts = self.train_state
        params = jax.tree.map(jnp.asarray, payload["params"])
        ts = ts.replace(params=params)
        if load_optimizer:
            ts = ts.replace(
                opt_state_policy=jax.tree.map(
                    jnp.asarray, payload["opt_state_policy"],
                    is_leaf=lambda x: isinstance(x, np.ndarray),
                ),
                opt_state_adapt=jax.tree.map(
                    jnp.asarray, payload["opt_state_adapt"],
                    is_leaf=lambda x: isinstance(x, np.ndarray),
                ),
                opt_state_est=jax.tree.map(
                    jnp.asarray, payload["opt_state_est"],
                    is_leaf=lambda x: isinstance(x, np.ndarray),
                ),
                learning_rate=jnp.asarray(payload["learning_rate"]),
                total_updates=jnp.asarray(payload["total_updates"]),
            )
        self.train_state = ts
        self.current_learning_iteration = payload["iter"]
        return payload.get("infos")

    def get_inference_policy(self, stochastic: bool = False):
        """Deterministic (or sampling) policy fn over the 5 obs streams
        (reference on_policy_runner.py:299-309).

        stochastic=True returns a fn with an extra `key` argument that
        samples from the Gaussian policy (mean + std * N(0,1)) — the
        rollout-time behavior, useful for evaluating the exploration policy
        rather than its mean.
        """
        nets = self.nets
        params = self.train_state.params

        @functools.partial(jax.jit, static_argnames=("adaptation_mode",))
        def act_inference(obs5, adaptation_mode: bool = True):
            estimated = nets.estimate(params, obs5.obs)
            return nets.action_mean(
                params, obs5.obs, obs5.privileged, estimated, obs5.scan,
                adaptation_mode,
            )

        if not stochastic:
            return act_inference

        @functools.partial(jax.jit, static_argnames=("adaptation_mode",))
        def act_sample(obs5, key, adaptation_mode: bool = True):
            mean = act_inference(obs5, adaptation_mode)
            std = params["std"]
            return mean + std * jax.random.normal(key, mean.shape)

        return act_sample
