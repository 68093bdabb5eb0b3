"""Actuation models: PD position control + actuator-network hook.

PD semantics replicate reference legged_robot.py:440-478 (`_compute_torques`):
position / velocity / torque control modes, optional per-env kp/kd multiplier
randomization (legged_robot.py:457-462), and clipping to URDF effort limits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PDParams(NamedTuple):
    p_gains: jnp.ndarray        # (ndof,)
    d_gains: jnp.ndarray        # (ndof,)
    default_dof_pos: jnp.ndarray  # (ndof,)
    torque_limits: jnp.ndarray  # (ndof,)
    action_scale: float
    control_type: str = "P"     # 'P' | 'V' | 'T'


def _bcast(x, bs):
    return x.reshape(x.shape + (1,) * len(bs))


def compute_torques(
    pd: PDParams,
    actions: jnp.ndarray,       # (ndof,)+bs, already clipped by the env
    dof_pos: jnp.ndarray,
    dof_vel: jnp.ndarray,
    kp_mult: jnp.ndarray | None = None,   # (ndof,)+bs domain-rand multipliers
    kd_mult: jnp.ndarray | None = None,
    last_dof_vel: jnp.ndarray | None = None,
    dt: float | None = None,
) -> jnp.ndarray:
    """Component-major with trailing batch (physics/soa.py layout)."""
    bs = dof_pos.shape[1:]
    p_gains = _bcast(pd.p_gains, bs)
    d_gains = _bcast(pd.d_gains, bs)
    default = _bcast(pd.default_dof_pos, bs)
    tlim = _bcast(pd.torque_limits, bs)
    actions_scaled = actions * pd.action_scale
    if pd.control_type == "P":
        kp = p_gains if kp_mult is None else kp_mult * p_gains
        kd = d_gains if kd_mult is None else kd_mult * d_gains
        torques = kp * (actions_scaled + default - dof_pos) - kd * dof_vel
    elif pd.control_type == "V":
        torques = p_gains * (actions_scaled - dof_vel) - d_gains * (
            (dof_vel - last_dof_vel) / dt
        )
    elif pd.control_type == "T":
        torques = actions_scaled
    else:
        raise NameError(f"Unknown controller type: {pd.control_type}")
    return jnp.clip(torques, -tlim, tlim)


# --------------------------------------------------------------------------
# SEA actuator network (ANYmal): 2-layer LSTM, hidden 8, per-dof
# (reference anymal.py:62-80, resources/actuator_nets/anydrive_v3_lstm.pt).
# Implemented as a pure function over explicit (h, c) state pytrees; weights
# are converted from the TorchScript checkpoint by models/actuator_net.py.
# --------------------------------------------------------------------------


class LSTMWeights(NamedTuple):
    w_ih: tuple   # per layer: (4*hidden, in)
    w_hh: tuple   # per layer: (4*hidden, hidden)
    b_ih: tuple
    b_hh: tuple
    w_out: jnp.ndarray
    b_out: jnp.ndarray
    in_scale: jnp.ndarray = 1.0   # input normalization (anydrive_v3_lstm)
    out_scale: jnp.ndarray = 1.0  # torque output scaling


def lstm_cell(x, h_prev, c_prev, w_ih, w_hh, b_ih, b_hh, bs):
    """Torch-convention LSTM cell (gate order i, f, g, o), SoA layout.

    x: (ndof, in)+bs, h/c: (ndof, hidden)+bs; weights are plain torch shapes.
    """
    gates = (
        jnp.einsum("nd...,gd->ng...", x, w_ih)
        + jnp.einsum("nh...,gh->ng...", h_prev, w_hh)
        + _bcast(b_ih + b_hh, bs)[None]
    )
    i, f, g, o = jnp.split(gates, 4, axis=1)
    sig = lambda t: 1.0 / (1.0 + jnp.exp(-t))
    c = sig(f) * c_prev + sig(i) * jnp.tanh(g)
    h = sig(o) * jnp.tanh(c)
    return h, c


def lstm_actuator(
    weights: LSTMWeights,
    pos_err: jnp.ndarray,     # (ndof,)+bs
    dof_vel: jnp.ndarray,     # (ndof,)+bs
    hidden: jnp.ndarray,      # (layers, ndof, hidden)+bs
    cell: jnp.ndarray,        # (layers, ndof, hidden)+bs
):
    """One step of the per-dof SEA LSTM; returns (torques, hidden', cell')."""
    bs = pos_err.shape[1:]
    x = jnp.stack([pos_err, dof_vel], axis=1) * _bcast(
        jnp.asarray(weights.in_scale).reshape(-1), bs
    )  # (ndof, 2)+bs
    new_h, new_c = [], []
    for l in range(len(weights.w_ih)):
        h, c = lstm_cell(
            x, hidden[l], cell[l], weights.w_ih[l], weights.w_hh[l],
            weights.b_ih[l], weights.b_hh[l], bs,
        )
        new_h.append(h)
        new_c.append(c)
        x = h
    torques = (
        jnp.einsum("nh...,oh->no...", x, weights.w_out)[:, 0]
        + _bcast(jnp.asarray(weights.b_out).reshape(()), bs)
    ) * weights.out_scale
    return torques, jnp.stack(new_h), jnp.stack(new_c)
