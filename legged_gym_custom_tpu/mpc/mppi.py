"""Batched sampling MPC (MPPI) on the TPU physics core.

The north-star extension beyond the reference (BASELINE.json): the same
physics engine driven as a batched shooting/rollout engine, with the
legged_gym go2 reward terms recast as stage costs.  Per solve: K perturbed
action sequences of horizon H are rolled through the dynamics (`lax.scan`
over the horizon, all B*K scenario rollouts natively batched in the SoA
engine), exponentially weighted by trajectory cost (MPPI, Williams et al.
2017), and averaged into a new nominal sequence; warm-started by shifting
between solves.

Stage costs (negated analogs of the go2 reward set, envs/rewards.py /
reference go2.py:578-831):
  tracking_lin/ang (go2_config scales 1.5/1.0), terrain-relative base height
  (legged_robot.py:1036 `_reward_base_height` with measured heights),
  orientation, action_rate, torques, collision on penalized links
  (legged_robot.py:1100), phase_contact_match + phase_foot_lifting
  (go2.py:621-678, same stance-flag construction), and a scandot-style
  gap cost that penalizes feet loaded over deep terrain (the MPC analog of
  the parkour fell-in-hole termination, go2.py:186-204).  Terrain heights
  come from the same heightfield sampler the env uses, so the solver is
  gap/hurdle-aware on parkour courses (tests/test_mppi.py).

Scaling: the B*K rollout batch is the same trailing batch axis the training
engine shards on the 'data' mesh axis — scenario blocks across chips, cost
reductions per robot stay shard-local when K is kept within a shard.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from legged_gym_custom_tpu import physics as phys
from legged_gym_custom_tpu.physics import heightfield as hfield
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
    w_height: float = 20.0     # terrain-RELATIVE base height error
    w_orientation: float = 5.0
    w_action_rate: float = 0.1
    w_torque: float = 1e-4
    w_collision: float = 5.0       # go2 collision scale -10 * rew -> cost
    w_phase_contact: float = 0.5   # go2 phase_contact_match 1.0
    w_foot_lift: float = 0.125     # go2 phase_foot_lifting 0.25
    w_gap: float = 10.0            # feet loaded over deep terrain (parkour)
    height_target: float = 0.30
    contact_force_thresh: float = 1.0   # [N] stance detection (go2.py:300)
    gap_depth: float = 0.3         # [m] terrain lower than this is a "hole"
    # gait clock (go2_config.py:18-22); phases advance along the horizon
    period: float = 0.45
    leg_offsets: tuple = (0.5, 0.0, 0.0, 0.5)   # [fl, fr, bl, br]


class MPCState(NamedTuple):
    nominal: jnp.ndarray       # (B, H, A) warm-started action plan
    phase: float = 0.0         # () global gait clock in [0, 1)


class CostStatics(NamedTuple):
    """Env-derived constants the stage costs need (SoA layouts)."""

    feet_link_ids: jnp.ndarray       # (n_feet,) indices into link axes
    penalized_link_ids: jnp.ndarray  # (n_pen,)
    max_foot_height: float
    percent_time_on_ground: float


def stage_cost(cfg: MPPIConfig, statics: CostStatics, hf, ph: phys.PhysicsState,
               info, commands, actions, prev_actions, phases):
    """Negative-reward stage cost over one control step (SoA layout).

    ph leaves component-major (…, BK); commands (4, BK); actions (A, BK);
    info: physics StepInfo (link_forces/link_pos (n_links, 3, BK));
    phases (4, BK) per-leg gait phases in [0, 1).
    """
    R = soa.quat_to_matrix(ph.base_quat)
    base_lin = soa.mtv(R, ph.lin_vel)
    base_ang = soa.mtv(R, ph.ang_vel)
    g_b = -R[2]  # world -z in body coords: row 2 of R^T applied to -e_z
    c_track = cfg.w_tracking_lin * (
        jnp.square(commands[0] - base_lin[0]) + jnp.square(commands[1] - base_lin[1])
    )
    c_ang = cfg.w_tracking_ang * jnp.square(commands[2] - base_ang[2])
    c_orient = cfg.w_orientation * (jnp.square(g_b[0]) + jnp.square(g_b[1]))
    c_rate = cfg.w_action_rate * jnp.sum(jnp.square(actions - prev_actions), axis=0)
    c_tau = cfg.w_torque * jnp.sum(jnp.square(info.torques), axis=0)

    # terrain-relative base height (legged_robot.py `_reward_base_height`
    # subtracts measured heights under the robot)
    h_base = hfield.height_bilinear(hf, ph.base_pos[0], ph.base_pos[1])
    c_height = cfg.w_height * jnp.square(
        ph.base_pos[2] - h_base - cfg.height_target
    )

    # collision: contact force on any penalized link (legged_robot.py:1100)
    f_pen = info.link_forces[statics.penalized_link_ids]      # (n_pen, 3, BK)
    pen_mag = jnp.sqrt(jnp.sum(f_pen * f_pen, axis=1))
    c_coll = cfg.w_collision * jnp.sum(pen_mag > 0.1, axis=0).astype(f_pen.dtype)

    # phase-gait terms (go2.py:621-678): stance when sin(2 pi phase) below
    # the duty-cycle threshold
    stance_thresh = 2.0 * statics.percent_time_on_ground - 1.0
    stance = jnp.sin(2.0 * jnp.pi * phases) <= stance_thresh      # (4, BK)
    feet_f = info.link_forces[statics.feet_link_ids]              # (4, 3, BK)
    contact = feet_f[:, 2] > cfg.contact_force_thresh             # (4, BK)
    match = ~(contact ^ stance)
    c_phase = cfg.w_phase_contact * jnp.sum(
        jnp.where(match, -0.25, 0.25), axis=0
    )

    feet_pos = info.link_pos[statics.feet_link_ids]               # (4, 3, BK)
    h_feet = hfield.height_bilinear(hf, feet_pos[:, 0], feet_pos[:, 1])
    lift = jnp.clip(feet_pos[:, 2] - h_feet, 0.0, statics.max_foot_height)
    lift = lift / statics.max_foot_height
    c_lift = cfg.w_foot_lift * jnp.sum(
        jnp.where(stance, lift, -lift), axis=0
    ) / 2.0

    # scandot-style gap cost: a foot bearing load where the terrain is a deep
    # hole means the plan steps into the gap (parkour go2.py:186-204 analog)
    in_hole = h_feet < -cfg.gap_depth
    c_gap = cfg.w_gap * jnp.sum(
        (contact & in_hole).astype(h_feet.dtype), axis=0
    )

    return (
        c_track + c_ang + c_height + c_orient + c_rate + c_tau
        + c_coll + c_phase + c_lift + c_gap
    )


class MPPI:
    """Builder: binds an env's physics statics into a pure jittable solver."""

    def __init__(self, env, cfg: MPPIConfig = MPPIConfig()):
        self.env = env
        self.cfg = cfg
        self.num_actions = env.num_actions
        self.statics = CostStatics(
            feet_link_ids=jnp.asarray(env.feet_ids),
            penalized_link_ids=jnp.asarray(env.penalized_ids),
            max_foot_height=float(env.cfg.rewards.max_foot_height),
            percent_time_on_ground=float(env.cfg.rewards.percent_time_on_ground),
        )

    def init_state(self, batch: int) -> MPCState:
        return MPCState(
            nominal=jnp.zeros((batch, self.cfg.horizon, self.num_actions)),
            phase=jnp.zeros((), jnp.float32),
        )

    def _phase_schedule(self, phase0, BK):
        """Per-leg gait phases along the horizon, (H, 4, BK)."""
        cfg = self.cfg
        t = jnp.arange(1, cfg.horizon + 1, dtype=jnp.float32)
        base = (phase0 + t * self.env.dt / cfg.period) % 1.0        # (H,)
        offs = jnp.asarray(cfg.leg_offsets, jnp.float32)            # (4,)
        ph = (base[:, None] + offs[None, :]) % 1.0                  # (H, 4)
        return jnp.broadcast_to(ph[..., None], (cfg.horizon, 4, BK))

    def _rollout_costs(self, ph0, dr, commands, samples_soa, phase0):
        """Total costs for all B*K rollouts.

        ph0/dr: component-major leaves with trailing batch BK;
        commands (4, BK); samples_soa (H, A, BK).
        Returns (BK,) costs.
        """
        env, cfg = self.env, self.cfg
        BK = commands.shape[-1]
        phases_seq = self._phase_schedule(phase0, BK)

        def body(carry, inp):
            actions, phases = inp
            ph, prev_a = carry
            ph, info, _ = phys.control_step(
                env.ma, env.hf, env.sim_params, env.pd, dr, env.dof_limits,
                ph, actions,
            )
            c = stage_cost(
                cfg, self.statics, env.hf, ph, info, commands, actions,
                prev_a, phases,
            )
            return (ph, actions), c

        (_, _), costs = jax.lax.scan(
            body, (ph0, jnp.zeros_like(samples_soa[0])),
            (samples_soa, phases_seq),
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

        costs = self._rollout_costs(
            ph0, dr_s, cmds, samples_soa, mpc_state.phase
        ).reshape(B, K)
        costs = jnp.where(jnp.isfinite(costs), costs, 1e9)
        beta = jnp.min(costs, axis=1, keepdims=True)
        w = jnp.exp(-(costs - beta) / cfg.temperature)
        w = w / jnp.sum(w, axis=1, keepdims=True)        # (B, K)

        nominal = jnp.einsum("bk,bkha->bha", w, samples)
        actions = nominal[:, 0]
        # warm start: shift the plan one step; advance the gait clock
        shifted = jnp.concatenate([nominal[:, 1:], nominal[:, -1:]], axis=1)
        next_phase = (mpc_state.phase + self.env.dt / cfg.period) % 1.0
        return (
            actions,
            MPCState(nominal=shifted, phase=next_phase),
            jnp.sum(w * costs, axis=1),
        )
