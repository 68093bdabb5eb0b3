"""Batched sampling MPC (MPPI) on the TPU physics core.

The north-star extension beyond the reference (BASELINE.json): the same
physics engine driven as a batched shooting/rollout engine, with legged_gym
reward terms recast as stage costs.  Per solve: K perturbed action sequences
of horizon H are rolled through the dynamics (`lax.scan` over the horizon,
all B*K scenario rollouts natively batched in the SoA engine), exponentially
weighted by trajectory cost (MPPI, Williams et al. 2017), and averaged into a
new nominal sequence; warm-started by shifting between solves.

Scaling: the B*K rollout batch is the same trailing batch axis the training
engine shards on the 'data' mesh axis — scenario blocks across chips, cost
reductions per robot stay shard-local when K is kept within a shard.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legged_gym_custom_tpu import physics as phys
from legged_gym_custom_tpu.physics import soa


class MPPIConfig(NamedTuple):
    horizon: int = 12          # control steps (@50 Hz -> 0.24 s lookahead)
    num_samples: int = 32      # K rollouts per robot per solve
    temperature: float = 0.3   # lambda in the MPPI soft-min
    noise_sigma: float = 0.4   # action perturbation std (action units)
    smooth_beta: float = 0.6   # AR(1) smoothing of sampled noise along time
    # stage-cost weights (negated analogs of the go2 reward terms)
    w_tracking_lin: float = 3.0
    w_tracking_ang: float = 1.0
    w_height: float = 20.0
    w_orientation: float = 5.0
    w_action_rate: float = 0.1
    w_torque: float = 1e-4
    height_target: float = 0.30


class MPCState(NamedTuple):
    nominal: jnp.ndarray       # (B, H, A) warm-started action plan


def stage_cost(cfg: MPPIConfig, ph: phys.PhysicsState, info, commands, actions,
               prev_actions):
    """Negative-reward stage cost over one control step (SoA layout).

    ph leaves component-major (…, BK); commands (4, BK); actions (A, BK).
    """
    R = soa.quat_to_matrix(ph.base_quat)
    base_lin = soa.mtv(R, ph.lin_vel)
    base_ang = soa.mtv(R, ph.ang_vel)
    g_b = -R[2]  # world -z in body coords: row 2 of R^T applied... R^T @ [0,0,-1]
    c_track = cfg.w_tracking_lin * (
        jnp.square(commands[0] - base_lin[0]) + jnp.square(commands[1] - base_lin[1])
    )
    c_ang = cfg.w_tracking_ang * jnp.square(commands[2] - base_ang[2])
    c_height = cfg.w_height * jnp.square(ph.base_pos[2] - cfg.height_target)
    c_orient = cfg.w_orientation * (jnp.square(g_b[0]) + jnp.square(g_b[1]))
    c_rate = cfg.w_action_rate * jnp.sum(jnp.square(actions - prev_actions), axis=0)
    c_tau = cfg.w_torque * jnp.sum(jnp.square(info.torques), axis=0)
    return c_track + c_ang + c_height + c_orient + c_rate + c_tau


class MPPI:
    """Builder: binds an env's physics statics into a pure jittable solver."""

    def __init__(self, env, cfg: MPPIConfig = MPPIConfig()):
        self.env = env
        self.cfg = cfg
        self.num_actions = env.num_actions

    def init_state(self, batch: int) -> MPCState:
        return MPCState(
            nominal=jnp.zeros((batch, self.cfg.horizon, self.num_actions))
        )

    def _rollout_costs(self, ph0, dr, commands, samples_soa):
        """Total costs for all B*K rollouts.

        ph0/dr: component-major leaves with trailing batch BK;
        commands (4, BK); samples_soa (H, A, BK).
        Returns (BK,) costs.
        """
        env, cfg = self.env, self.cfg

        def body(carry, actions):
            ph, prev_a = carry
            ph, info, _ = phys.control_step(
                env.ma, env.hf, env.sim_params, env.pd, dr, env.dof_limits,
                ph, actions,
            )
            c = stage_cost(cfg, ph, info, commands, actions, prev_a)
            return (ph, actions), c

        (_, _), costs = jax.lax.scan(
            body, (ph0, jnp.zeros_like(samples_soa[0])), samples_soa
        )
        return jnp.sum(costs, axis=0)

    def solve(self, mpc_state: MPCState, physics, dr, commands, key):
        """One MPPI solve for a batch of robots.

        Args (batch-LEADING, as stored by the env):
          physics: (B, ...) PhysicsState;  dr: (B, ...) DomainRandParams;
          commands: (B, 4) velocity commands.
        Returns: (actions (B, A), new MPCState, expected cost (B,)).
        """
        cfg = self.cfg
        B = commands.shape[0]
        H, A, K = cfg.horizon, self.num_actions, cfg.num_samples

        eps = jax.random.normal(key, (B, K, H, A)) * cfg.noise_sigma

        # AR(1)-smooth the noise along the horizon for coherent exploration
        def smooth(carry, e):
            s = cfg.smooth_beta * carry + (1 - cfg.smooth_beta) * e
            return s, s

        eps_t = jnp.moveaxis(eps, 2, 0)  # (H, B, K, A)
        _, eps_s = jax.lax.scan(smooth, jnp.zeros((B, K, A)), eps_t)
        eps = jnp.moveaxis(eps_s, 0, 2)

        samples = mpc_state.nominal[:, None] + eps       # (B, K, H, A)
        clip_a = self.env.cfg.normalization.clip_actions
        samples = jnp.clip(samples, -clip_a, clip_a)

        # tile robots K times, convert to SoA trailing batch BK
        tile = lambda x: jnp.repeat(x, K, axis=0)
        to_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(tile(x), 0, -1), t)
        ph0 = to_soa(physics)
        dr_s = to_soa(dr)
        cmds = jnp.moveaxis(tile(commands), 0, -1)        # (4, BK)
        samples_soa = jnp.moveaxis(samples.reshape(B * K, H, A), 0, -1)  # (H,A,BK)

        costs = self._rollout_costs(ph0, dr_s, cmds, samples_soa).reshape(B, K)
        costs = jnp.where(jnp.isfinite(costs), costs, 1e9)
        beta = jnp.min(costs, axis=1, keepdims=True)
        w = jnp.exp(-(costs - beta) / cfg.temperature)
        w = w / jnp.sum(w, axis=1, keepdims=True)        # (B, K)

        nominal = jnp.einsum("bk,bkha->bha", w, samples)
        actions = nominal[:, 0]
        # warm start: shift the plan one step
        shifted = jnp.concatenate([nominal[:, 1:], nominal[:, -1:]], axis=1)
        return actions, MPCState(nominal=shifted), jnp.sum(w * costs, axis=1)
