"""Reward term library: declarative registry replacing getattr reflection.

Every `_reward_*` method of the reference (legged_robot.py:1036-1148,
go2.py:578-831, cassie.py:42-46) as a pure batched function over a
`RewardCtx`.  The env builds its term list from cfg.rewards.scales at
construction (scale * dt, zero scales dropped — legged_robot.py:730-754) and
sums terms in `compute_reward` with positive clipping and the
termination-after-clip rule (legged_robot.py:216-237).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax.numpy as jnp
import numpy as np


class RewardStatics(NamedTuple):
    """Static (per-task) data used by reward terms."""

    dt: float
    tracking_sigma: float
    base_height_target: float
    max_contact_force: float
    pitch_deg_target: float
    roll_deg_target: float
    max_foot_height: float
    percent_time_on_ground: float
    soft_dof_pos_limits: jnp.ndarray   # (ndof, 2) midpoint-scaled
    soft_dof_vel_limit: float
    soft_torque_limit: float
    dof_vel_limits: jnp.ndarray        # (ndof,)
    torque_limits: jnp.ndarray         # (ndof,)
    default_dof_pos: jnp.ndarray       # (ndof,)
    feet_ids: np.ndarray               # link indices (static numpy)
    penalized_ids: np.ndarray
    termination_ids: np.ndarray
    calf_link_ids: np.ndarray
    hip_joint_ids: np.ndarray
    thigh_joint_ids: np.ndarray
    calf_joint_ids: np.ndarray
    heading_command: bool
    # Gate the jump-zone rewards on ACTUAL forward velocity (m/s; 0 = off =
    # reference behavior).  The reference's jump terms document "reward only
    # when the robot is moving" but implement the mask on the COMMAND
    # (go2.py:778,791) — a stationary robot bobbing at a gap edge farms
    # jump_zone_upward_vel risk-free, which is exactly the balk local
    # optimum its own comments complain about.  Gating on the measured
    # forward velocity implements the stated intent and removes the exploit.
    jump_zone_fwd_gate: float = 0.0


class RewardCtx(NamedTuple):
    """Per-step batched quantities reward terms read."""

    base_pos: jnp.ndarray          # (B,3) world
    base_lin_vel: jnp.ndarray      # (B,3) body frame
    base_ang_vel: jnp.ndarray      # (B,3) body frame
    world_lin_vel: jnp.ndarray     # (B,3) world frame
    projected_gravity: jnp.ndarray # (B,3)
    roll: jnp.ndarray              # (B,)
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    heading: jnp.ndarray           # (B,) atan2 of forward vector
    commands: jnp.ndarray          # (B,4)
    dof_pos: jnp.ndarray           # (B,ndof)
    dof_vel: jnp.ndarray
    last_dof_vel: jnp.ndarray
    torques: jnp.ndarray
    last_torques: jnp.ndarray
    actions: jnp.ndarray
    last_actions: jnp.ndarray
    link_forces: jnp.ndarray       # (B, n_links, 3)
    feet_pos: jnp.ndarray          # (B, n_feet, 3) world
    feet_vel: jnp.ndarray          # (B, n_feet, 3) world
    last_contact_heights: jnp.ndarray  # (B,4)
    contact_filt: jnp.ndarray      # (B,4) bool, PhysX-style OR-filtered
    feet_air_time: jnp.ndarray     # (B,4) seconds (pre-update value + dt)
    first_contact: jnp.ndarray     # (B,4) bool
    phases: jnp.ndarray            # (B,4) per-leg [fl, fr, bl, br]
    measured_heights: jnp.ndarray  # (B,P)
    jump_flags: jnp.ndarray        # (B,)
    reset_buf: jnp.ndarray         # (B,) bool
    time_out_buf: jnp.ndarray      # (B,) bool
    # New-ground rate (m/s): clip(base_x - max_x_so_far, 0)/dt.  Zero while
    # re-covering previously reached ground, so pacing/bobbing at a gap edge
    # earns nothing while genuinely crossing earns the gap width.  None for
    # callers predating the field (treated as zero by _reward_progress).
    progress: jnp.ndarray = None   # (B,)


# ---------------------------------------------------------------------------
# Base terms (legged_robot.py:1036-1148)
# ---------------------------------------------------------------------------

def _reward_lin_vel_z(ctx, s):
    return jnp.square(ctx.base_lin_vel[:, 2])


def _reward_ang_vel_xy(ctx, s):
    return jnp.sum(jnp.square(ctx.base_ang_vel[:, :2]), axis=1)


def _reward_orientation(ctx, s):
    return jnp.sum(jnp.square(ctx.projected_gravity[:, :2]), axis=1)


def _reward_base_height(ctx, s):
    base_height = jnp.mean(ctx.base_pos[:, 2:3] - ctx.measured_heights, axis=1)
    return jnp.square(base_height - s.base_height_target)


def _reward_torques(ctx, s):
    return jnp.sum(jnp.square(ctx.torques), axis=1)


def _reward_dof_vel(ctx, s):
    return jnp.sum(jnp.square(ctx.dof_vel), axis=1)


def _reward_dof_acc(ctx, s):
    return jnp.sum(jnp.square((ctx.last_dof_vel - ctx.dof_vel) / s.dt), axis=1)


def _reward_action_rate(ctx, s):
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions), axis=1)


def _reward_collision(ctx, s):
    f = jnp.linalg.norm(ctx.link_forces[:, s.penalized_ids, :], axis=-1)
    return jnp.sum(1.0 * (f > 0.1), axis=1)


def _reward_termination(ctx, s):
    return (ctx.reset_buf & ~ctx.time_out_buf).astype(jnp.float32)


def _reward_dof_pos_limits(ctx, s):
    out = -jnp.clip(ctx.dof_pos - s.soft_dof_pos_limits[:, 0], max=0.0)
    out += jnp.clip(ctx.dof_pos - s.soft_dof_pos_limits[:, 1], min=0.0)
    return jnp.sum(out, axis=1)


def _reward_dof_vel_limits(ctx, s):
    return jnp.sum(
        jnp.clip(jnp.abs(ctx.dof_vel) - s.dof_vel_limits * s.soft_dof_vel_limit, 0.0, 1.0),
        axis=1,
    )


def _reward_torque_limits(ctx, s):
    return jnp.sum(
        jnp.clip(jnp.abs(ctx.torques) - s.torque_limits * s.soft_torque_limit, min=0.0),
        axis=1,
    )


def _reward_tracking_lin_vel(ctx, s):
    err = jnp.sum(jnp.square(ctx.commands[:, :2] - ctx.base_lin_vel[:, :2]), axis=1)
    return jnp.exp(-err / s.tracking_sigma)


def _reward_tracking_ang_vel(ctx, s):
    err = jnp.square(ctx.commands[:, 2] - ctx.base_ang_vel[:, 2])
    return jnp.exp(-err / s.tracking_sigma)


def _reward_stumble_feet(ctx, s):
    f = ctx.link_forces[:, s.feet_ids, :]
    return jnp.any(
        jnp.linalg.norm(f[:, :, :2], axis=2) > 5 * jnp.abs(f[:, :, 2]), axis=1
    ).astype(jnp.float32)


def _reward_stand_still(ctx, s):
    small = jnp.linalg.norm(ctx.commands[:, :2], axis=1) < 0.1
    return jnp.sum(jnp.abs(ctx.dof_pos - s.default_dof_pos), axis=1) * small


def _reward_contact_forces(ctx, s):
    f = jnp.linalg.norm(ctx.link_forces[:, s.feet_ids, :], axis=-1)
    return jnp.sum(jnp.clip(f - s.max_contact_force, min=0.0), axis=1)


def _reward_feet_air_time(ctx, s):
    """Long-step reward on filtered first contact (go2.py:819-831)."""
    rew = jnp.sum((ctx.feet_air_time - 0.5) * ctx.first_contact, axis=1)
    return rew * (jnp.linalg.norm(ctx.commands[:, :2], axis=1) > 0.1)


# ---------------------------------------------------------------------------
# Go2 "extreme parkour" terms (go2.py:578-617)
# ---------------------------------------------------------------------------

def _reward_delta_torques(ctx, s):
    return jnp.sum(jnp.square(ctx.torques - ctx.last_torques), axis=1)


def _reward_dof_error(ctx, s):
    return jnp.sum(jnp.square(ctx.dof_pos - s.default_dof_pos), axis=1)


def _reward_zero_cmd_dof_error(ctx, s):
    zero = (jnp.linalg.norm(ctx.commands[:, :3], axis=1) < 0.2).astype(jnp.float32)
    return _reward_dof_error(ctx, s) * zero


def _reward_hip_pos(ctx, s):
    d = ctx.dof_pos[:, s.hip_joint_ids] - s.default_dof_pos[s.hip_joint_ids]
    return jnp.sum(jnp.square(d), axis=1)


def _reward_thigh_pos(ctx, s):
    d = ctx.dof_pos[:, s.thigh_joint_ids] - s.default_dof_pos[s.thigh_joint_ids]
    return jnp.sum(jnp.square(d), axis=1)


def _reward_calf_pos(ctx, s):
    d = ctx.dof_pos[:, s.calf_joint_ids] - s.default_dof_pos[s.calf_joint_ids]
    return jnp.sum(jnp.square(d), axis=1)


# ---------------------------------------------------------------------------
# Phase-gait terms (go2.py:621-678). phases order: [fl, fr, bl, br].
# ---------------------------------------------------------------------------

def _stance_flags(ctx, s):
    stance_threshold = 2.0 * s.percent_time_on_ground - 1.0
    return jnp.sin(2 * jnp.pi * ctx.phases) <= stance_threshold


def _reward_phase_contact_match(ctx, s):
    stance = _stance_flags(ctx, s)
    match = ~(ctx.contact_filt ^ stance)
    return jnp.sum(jnp.where(match, 0.25, -0.25), axis=1)


def _reward_phase_foot_lifting(ctx, s):
    stance = _stance_flags(ctx, s)
    heights = ctx.feet_pos[:, :, 2] - ctx.last_contact_heights
    heights = jnp.clip(heights, 0.0, s.max_foot_height)
    normalized = heights / s.max_foot_height
    rew = jnp.where(~stance, normalized, -normalized)
    return jnp.sum(rew, axis=1) / 2.0


def _reward_stumble_calves(ctx, s):
    f = ctx.link_forces[:, s.calf_link_ids, :]
    return jnp.any(
        jnp.linalg.norm(f[:, :, :2], axis=2) > 5 * jnp.abs(f[:, :, 2]), axis=1
    ).astype(jnp.float32)


def _reward_calf_collision(ctx, s):
    f = jnp.linalg.norm(ctx.link_forces[:, s.calf_link_ids, :], axis=-1)
    return jnp.sum(1.0 * (f > 0.1), axis=1)


def _reward_tracking_pitch(ctx, s):
    pitch_deg = ctx.pitch * (180.0 / jnp.pi)
    return jnp.exp(-jnp.square(pitch_deg - s.pitch_deg_target) / s.tracking_sigma)


def _reward_tracking_roll(ctx, s):
    roll_deg = ctx.roll * (180.0 / jnp.pi)
    return jnp.exp(-jnp.square(roll_deg - s.roll_deg_target) / s.tracking_sigma)


def _reward_thigh_symmetry(ctx, s):
    left = ctx.dof_pos[:, s.thigh_joint_ids[[0, 2]]]
    right = ctx.dof_pos[:, s.thigh_joint_ids[[1, 3]]]
    return jnp.sum(jnp.abs(left - right), axis=1)


def _reward_calf_symmetry(ctx, s):
    left = ctx.dof_pos[:, s.calf_joint_ids[[0, 2]]]
    right = ctx.dof_pos[:, s.calf_joint_ids[[1, 3]]]
    return jnp.sum(jnp.abs(left - right), axis=1)


# ---------------------------------------------------------------------------
# Jumper terms (go2.py:734-814)
# ---------------------------------------------------------------------------

def _wrap_to_pi(x):
    return jnp.mod(x + jnp.pi, 2 * jnp.pi) - jnp.pi


def _reward_heading_alignment(ctx, s):
    desired = _wrap_to_pi(ctx.commands[:, 3]) if s.heading_command else jnp.zeros_like(ctx.heading)
    err = _wrap_to_pi(desired - ctx.heading)
    moving = (jnp.linalg.norm(ctx.commands[:, :3], axis=1) >= 0.2).astype(jnp.float32)
    return jnp.square(err) * moving


def _reward_reverse_penalty(ctx, s):
    return -jnp.clip(ctx.world_lin_vel[:, 0], max=0.0)


def _jump_motion_gate(ctx, s):
    """Command mask (reference go2.py:778,791) + optional actual-motion gate
    (RewardStatics.jump_zone_fwd_gate; see its docstring)."""
    moving = (jnp.linalg.norm(ctx.commands[:, :3], axis=1) >= 0.2).astype(jnp.float32)
    if s.jump_zone_fwd_gate > 0.0:
        moving = moving * (
            ctx.world_lin_vel[:, 0] > s.jump_zone_fwd_gate
        ).astype(jnp.float32)
    return moving


def _reward_jump_zone_forward_vel(ctx, s):
    fwd = jnp.clip(ctx.world_lin_vel[:, 0], min=0.0)
    jump = (ctx.jump_flags > 0.0).astype(jnp.float32)
    return fwd * jump * _jump_motion_gate(ctx, s)


def _reward_jump_zone_upward_vel(ctx, s):
    up = jnp.clip(ctx.world_lin_vel[:, 2], min=0.0)
    jump = (ctx.jump_flags > 0.0).astype(jnp.float32)
    return up * jump * _jump_motion_gate(ctx, s)


def _reward_progress(ctx, s):
    """New-ground bonus (round-5 commit stage; no reference counterpart —
    the reference attacks the same balk optimum with repeated finetunes,
    deploy/networks/go2/parkour_v12_ft_i..iii).  Pays only for course-x the
    robot has never reached before this episode, so the total is bounded by
    distance covered and the edge-bob/backtrack loop earns exactly zero."""
    if ctx.progress is None:
        return jnp.zeros(ctx.base_pos.shape[0])
    moving = (jnp.linalg.norm(ctx.commands[:, :3], axis=1) >= 0.2).astype(jnp.float32)
    return ctx.progress * moving


def _reward_min_height(ctx, s):
    z_err = jnp.clip(s.base_height_target - ctx.base_pos[:, 2], 0.0, s.base_height_target)
    jump = (ctx.jump_flags > 0.0).astype(jnp.float32)
    return z_err * jump


# ---------------------------------------------------------------------------
# G1 humanoid terms (g1_env_broken.py:106-124; the env is kept non-registered
# in the reference — "broken" — but the terms are implemented faithfully, and
# forward_vel, declared in its config but missing from the reference env, is
# implemented as clipped world forward velocity)
# ---------------------------------------------------------------------------

def _reward_g1_contact(ctx, s):
    stance = ctx.phases < 0.55
    contact = ctx.link_forces[:, s.feet_ids, 2] > 1.0
    return jnp.sum((~(contact ^ stance)).astype(jnp.float32), axis=1)


def _reward_feet_swing_height(ctx, s):
    contact = jnp.linalg.norm(ctx.link_forces[:, s.feet_ids, :], axis=-1) > 1.0
    pos_error = jnp.square(ctx.feet_pos[:, :, 2] - 0.08) * ~contact
    return jnp.sum(pos_error, axis=1)


def _reward_alive(ctx, s):
    return jnp.ones_like(ctx.roll)


def _reward_contact_no_vel(ctx, s):
    contact = jnp.linalg.norm(ctx.link_forces[:, s.feet_ids, :], axis=-1) > 1.0
    v = ctx.feet_vel * contact[..., None]
    return jnp.sum(jnp.square(v), axis=(1, 2))


def _reward_forward_vel(ctx, s):
    return jnp.clip(ctx.world_lin_vel[:, 0], min=0.0)


# ---------------------------------------------------------------------------
# Cassie biped term (cassie.py:42-46)
# ---------------------------------------------------------------------------

def _reward_no_fly(ctx, s):
    contacts = ctx.link_forces[:, s.feet_ids, 2] > 0.1
    single = jnp.sum(1.0 * contacts, axis=1) == 1
    return 1.0 * single


REWARD_REGISTRY: Dict[str, Callable] = {
    "lin_vel_z": _reward_lin_vel_z,
    "ang_vel_xy": _reward_ang_vel_xy,
    "orientation": _reward_orientation,
    "base_height": _reward_base_height,
    "torques": _reward_torques,
    "dof_vel": _reward_dof_vel,
    "dof_acc": _reward_dof_acc,
    "action_rate": _reward_action_rate,
    "collision": _reward_collision,
    "termination": _reward_termination,
    "dof_pos_limits": _reward_dof_pos_limits,
    "dof_vel_limits": _reward_dof_vel_limits,
    "torque_limits": _reward_torque_limits,
    "tracking_lin_vel": _reward_tracking_lin_vel,
    "tracking_ang_vel": _reward_tracking_ang_vel,
    "stumble_feet": _reward_stumble_feet,
    "stand_still": _reward_stand_still,
    "contact_forces": _reward_contact_forces,
    "feet_contact_forces": _reward_contact_forces,
    "feet_air_time": _reward_feet_air_time,
    "delta_torques": _reward_delta_torques,
    "dof_error": _reward_dof_error,
    "zero_cmd_dof_error": _reward_zero_cmd_dof_error,
    "hip_pos": _reward_hip_pos,
    "thigh_pos": _reward_thigh_pos,
    "calf_pos": _reward_calf_pos,
    "phase_contact_match": _reward_phase_contact_match,
    "phase_foot_lifting": _reward_phase_foot_lifting,
    "stumble_calves": _reward_stumble_calves,
    "calf_collision": _reward_calf_collision,
    "tracking_pitch": _reward_tracking_pitch,
    "tracking_roll": _reward_tracking_roll,
    "thigh_symmetry": _reward_thigh_symmetry,
    "calf_symmetry": _reward_calf_symmetry,
    "heading_alignment": _reward_heading_alignment,
    "reverse_penalty": _reward_reverse_penalty,
    "jump_zone_forward_vel": _reward_jump_zone_forward_vel,
    "jump_zone_upward_vel": _reward_jump_zone_upward_vel,
    "progress": _reward_progress,
    "min_height": _reward_min_height,
    "no_fly": _reward_no_fly,
    "contact": _reward_g1_contact,
    "feet_swing_height": _reward_feet_swing_height,
    "alive": _reward_alive,
    "contact_no_vel": _reward_contact_no_vel,
    "forward_vel": _reward_forward_vel,
}
