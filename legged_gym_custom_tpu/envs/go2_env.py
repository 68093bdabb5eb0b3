"""Go2 task environment (reference legged_gym/envs/go2/go2.py).

Overrides the base observation layout with the Go2's 52-proprio scheme
(go2.py:467-574): IMU roll/pitch instead of projected gravity + lin vel,
trot-gait phase features, and the parkour jump-flag machinery.  The 5-stream
outputs (privileged 29 / estimated 3 / scan 132 / critic 736) come from the
base class which already implements the go2 stream layout.

Reset-boundary note: the reference computes roll/pitch/phases *before*
`reset_idx` and reuses them in `compute_observations`, so freshly reset envs
see one frame of stale values (go2.py:367, 375-377, 467).  Here observations
are recomputed from the post-reset state — a cleaner boundary; differs from
the reference only on reset frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from legged_gym_custom_tpu.physics import spatial as sp
from .base_env import EnvState, LeggedEnv


class Go2Env(LeggedEnv):
    def _noise_scale_vec(self) -> jnp.ndarray:
        """Go2 noise vector (go2.py:110-129), aligned to the actual layout."""
        cfg = self.cfg
        n = np.zeros(cfg.env.num_proprio, np.float32)
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        osc = cfg.normalization.obs_scales
        a = self.num_actions
        n[0:3] = ns.ang_vel * lvl * osc.ang_vel       # angular vel (3)
        n[3:5] = ns.imu * lvl                          # roll, pitch (2)
        n[5:8] = 0.0                                   # commands (3)
        n[8:8 + a] = ns.dof_pos * lvl * osc.dof_pos    # dof pos (12)
        n[8 + a:8 + 2 * a] = ns.dof_vel * lvl * osc.dof_vel  # dof vel (12)
        n[8 + 2 * a:8 + 3 * a] = 0.0                   # prev actions (12)
        n[8 + 3 * a:] = 0.0                            # phase features (8)
        return jnp.asarray(n)

    def _proprio_obs(self, state: EnvState, derived) -> jnp.ndarray:
        """Go2 52-d proprio (go2.py:506-515 + phase features :471-481)."""
        ph = state.physics
        roll, pitch, _ = sp.quat_to_rpy(ph.base_quat)
        phases = self._phases(state)  # [fl, fr, bl, br]
        two_pi = 2.0 * jnp.pi
        fl, fr, bl, br = phases[:, 0], phases[:, 1], phases[:, 2], phases[:, 3]
        phase_features = jnp.stack(
            [
                jnp.sin(two_pi * fr), jnp.cos(two_pi * fr),
                jnp.sin(two_pi * fl), jnp.cos(two_pi * fl),
                jnp.sin(two_pi * bl), jnp.cos(two_pi * bl),
                jnp.sin(two_pi * br), jnp.cos(two_pi * br),
            ],
            axis=-1,
        )
        return jnp.concatenate(
            [
                derived["base_ang_vel"] * self.obs_scales.ang_vel,
                jnp.stack([roll, pitch], axis=-1),
                state.commands[:, :3] * self.commands_scale,
                (ph.dof_pos - self.default_dof_pos) * self.obs_scales.dof_pos,
                ph.dof_vel * self.obs_scales.dof_vel,
                state.actions,
                phase_features,
            ],
            axis=-1,
        )

    def _pre_obs_hook(self, state: EnvState) -> EnvState:
        """Jump-flag detection from scandot outliers (go2.py:487-494)."""
        if not getattr(self.cfg.terrain, "parkour", False):
            return state
        num_outliers = jnp.sum(
            jnp.abs(state.measured_heights) > 0.1, axis=1
        )
        jump_flags = (num_outliers >= 8).astype(jnp.float32)
        return state.replace(jump_flags=jump_flags)
