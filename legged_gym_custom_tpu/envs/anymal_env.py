"""ANYmal-C environment with the SEA actuator network
(reference legged_gym/envs/anymal_c/anymal.py).

Replaces PD control with a per-dof 2-layer LSTM actuator model (hidden 8,
input [pos err, vel], anymal.py:71-80) whose hidden/cell states live in
EnvState.actuator_state and are zeroed on reset (anymal.py:55-58).
"""
from __future__ import annotations

import jax.numpy as jnp

from legged_gym_custom_tpu.physics.actuator import lstm_actuator
from .base_env import LeggedEnv


class AnymalEnv(LeggedEnv):
    def _build_torque_fn(self):
        cfg = self.cfg.control
        if not getattr(cfg, "use_actuator_network", False):
            return None
        from legged_gym_custom_tpu.models.actuator_net import load_actuator_net

        weights = load_actuator_net(cfg.actuator_net_file)
        action_scale = cfg.action_scale
        default = self.default_dof_pos

        def torque_fn(actions, dof_pos, dof_vel, act_state):
            # SoA layout: dof arrays are (ndof,)+bs, default is (ndof,)
            hidden, cell = act_state
            d = default.reshape(default.shape + (1,) * (dof_pos.ndim - 1))
            pos_err = actions * action_scale + d - dof_pos
            tau, hidden, cell = lstm_actuator(weights, pos_err, dof_vel, hidden, cell)
            return tau, (hidden, cell)

        return torque_fn

    def _init_actuator_state(self):
        if self._torque_fn is None:
            return super()._init_actuator_state()
        B, n = self.num_envs, self.num_actions
        # (layers=2, ndof, hidden=8) per env, hidden + cell
        return (
            jnp.zeros((B, 2, n, 8), jnp.float32),
            jnp.zeros((B, 2, n, 8), jnp.float32),
        )
