"""Unitree G1 humanoid environment (reference "g1 (broken)/g1_env_broken.py").

The reference keeps this env unregistered and non-functional (its config
declares a forward_vel reward with no implementation, and the 5-stream API is
unserved).  This version is a *working* port: the same 47-d observation layout
(ang_vel 3 + gravity 3 + cmd 3 + dof 12 + dof_vel 12 + actions 12 + sin/cos
phase 2, g1_env_broken.py:70-93), the biped walk phase (period 0.8, offset
0.5, :57-62), and the G1 reward set — wired into the 5-stream machinery like
every other task.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base_env import EnvState, LeggedEnv


class G1Env(LeggedEnv):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # G1 hip_pos penalizes roll+pitch only (g1_env_broken.py:124, dofs
        # [1,2,7,8]); rebuild the statics with the narrower group
        ids = self.model.dof_ids_matching(["hip_roll", "hip_pitch"])
        self.hip_joint_ids = ids
        self.reward_statics = self.reward_statics._replace(hip_joint_ids=ids)

    def _phases(self, state: EnvState) -> jnp.ndarray:
        """Biped leg phases [left, right] (g1_env_broken.py:57-62);
        no zero-command masking in the reference G1."""
        period = getattr(self.cfg.env, "period", 0.8)
        offset = 0.5
        phase = (state.episode_length.astype(jnp.float32) * self.dt) % period / period
        return jnp.stack([phase, (phase + offset) % 1.0], axis=-1)

    def _noise_scale_vec(self) -> jnp.ndarray:
        cfg = self.cfg
        n = np.zeros(cfg.env.num_proprio, np.float32)
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        osc = cfg.normalization.obs_scales
        a = self.num_actions
        n[0:3] = ns.ang_vel * lvl * osc.ang_vel
        n[3:6] = ns.gravity * lvl
        n[6:9] = 0.0  # commands
        n[9:9 + a] = ns.dof_pos * lvl * osc.dof_pos
        n[9 + a:9 + 2 * a] = ns.dof_vel * lvl * osc.dof_vel
        n[9 + 2 * a:9 + 3 * a] = 0.0
        n[9 + 3 * a:] = 0.0  # sin/cos phase
        return jnp.asarray(n)

    def _proprio_obs(self, state: EnvState, derived) -> jnp.ndarray:
        ph = state.physics
        phases = self._phases(state)
        phase = phases[:, 0]
        two_pi = 2.0 * jnp.pi
        return jnp.concatenate(
            [
                derived["base_ang_vel"] * self.obs_scales.ang_vel,
                derived["projected_gravity"],
                state.commands[:, :3] * self.commands_scale,
                (ph.dof_pos - self.default_dof_pos) * self.obs_scales.dof_pos,
                ph.dof_vel * self.obs_scales.dof_vel,
                state.actions,
                jnp.sin(two_pi * phase)[:, None],
                jnp.cos(two_pi * phase)[:, None],
            ],
            axis=-1,
        )
