"""Pure-functional vectorized legged-robot environment.

TPU-native re-design of the reference's mutable-buffer env stack
(legged_gym/envs/base/base_task.py + legged_robot.py): the entire env is a
pytree `EnvState` plus a pure `step(state, actions, ...)` function.  Resets
are branchless lane-masked `where` rebuilds (no `nonzero()` host syncs —
SURVEY §7.3 "Masked resets without host sync"), randomness is explicit key
plumbing, and the whole step jits/shards over a device mesh.

Step pipeline order matches go2.py:345-387 / legged_robot.py:67-100 exactly:
  clip actions -> decimated physics -> derived quantities -> feet/phase update
  -> callback (command resample / heading / heights / pushes) -> termination
  -> rewards -> masked reset -> observations -> last_* buffer update -> clip.

The base class implements the upstream-legged_gym observation layout
(legged_robot.py:240-273, 48 proprio + optional 187 heights); Go2Env
(go2_env.py) overrides the proprio layout and adds the 5-stream outputs.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from legged_gym_custom_tpu import physics as phys
from legged_gym_custom_tpu.physics import spatial as sp
from legged_gym_custom_tpu.physics.engine import DomainRandParams, PhysicsState
from legged_gym_custom_tpu.terrain import Terrain
from . import rewards as rew_lib
from .rewards import RewardCtx, RewardStatics


class Obs(NamedTuple):
    """The five observation streams (reference base_task.py:76-81)."""

    obs: jnp.ndarray          # (B, num_obs) proprio + history
    privileged: jnp.ndarray   # (B, num_privileged_obs)
    critic: jnp.ndarray       # (B, num_critic_obs)
    estimated: jnp.ndarray    # (B, num_estimated_obs) ground-truth targets
    scan: jnp.ndarray         # (B, num_scan_obs)


@struct.dataclass
class EnvState:
    physics: PhysicsState                 # batched leaves (B, ...)
    episode_length: jnp.ndarray           # (B,) int32
    common_step: jnp.ndarray              # () int32
    commands: jnp.ndarray                 # (B, 4)
    actions: jnp.ndarray                  # (B, A)
    last_actions: jnp.ndarray
    last_dof_vel: jnp.ndarray
    last_torques: jnp.ndarray
    last_base_lin_vel: jnp.ndarray        # (B, 3)
    last_root_vel: jnp.ndarray            # (B, 6)
    obs_history: jnp.ndarray              # (B, H, P)
    measured_heights: jnp.ndarray         # (B, n_scan_points)
    feet_air_time: jnp.ndarray            # (B, n_feet)
    last_contacts: jnp.ndarray            # (B, n_feet) bool
    last_contact_heights: jnp.ndarray     # (B, n_feet)
    jump_flags: jnp.ndarray               # (B,)
    terrain_levels: jnp.ndarray           # (B,) int32
    terrain_types: jnp.ndarray            # (B,) int32
    env_origins: jnp.ndarray              # (B, 3)
    episode_sums: jnp.ndarray             # (B, n_reward_terms)
    command_ranges: jnp.ndarray           # (4, 2) [vx, vy, wz, heading]
    dr: DomainRandParams                  # batched per-env params
    rng: jnp.ndarray                      # PRNG key
    actuator_state: Any = None            # stateful actuator models (SEA LSTM)
    # Course-progress tracking (round-5 parkour commit stage; None-tolerant
    # so older call sites that build EnvState without them keep working):
    max_x: Any = None                     # (B,) max world-x reached this episode
    stall_time: Any = None                # (B,) s with an active command + no new ground


class LeggedEnv:
    """Static env builder; all step/reset methods are pure functions."""

    def __init__(self, cfg, urdf_path: str, name: str = "robot",
                 terrain_seed: int = 0):
        self.cfg = cfg
        self.model = phys.load_urdf(urdf_path, name)
        self.ma = phys.model_arrays(self.model)
        self.num_envs = cfg.env.num_envs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.sim.dt * cfg.control.decimation
        self.max_episode_length_s = cfg.env.episode_length_s
        self.max_episode_length = int(np.ceil(self.max_episode_length_s / self.dt))
        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)

        # ---- terrain ----
        mesh_type = cfg.terrain.mesh_type
        self.custom_origins = mesh_type in ("heightfield", "trimesh")
        if self.custom_origins:
            self.terrain = Terrain(cfg.terrain, self.num_envs,
                                   np.random.default_rng(terrain_seed))
            self.hf = phys.from_raw(
                self.terrain.height_field_raw,
                cfg.terrain.horizontal_scale,
                cfg.terrain.vertical_scale,
                cfg.terrain.border_size,
            )
            self.terrain_origins = jnp.asarray(self.terrain.env_origins, jnp.float32)
        else:
            self.terrain = None
            self.hf = phys.plane()
            self.terrain_origins = None
        if mesh_type not in ("heightfield", "trimesh"):
            cfg.terrain.curriculum = False  # reference _parse_cfg:950-951

        # ---- PD / actuation ----
        m = self.model
        p_gains = np.zeros(m.num_dof)
        d_gains = np.zeros(m.num_dof)
        default_dof_pos = np.zeros(m.num_dof)
        for i, dname in enumerate(m.dof_names):
            default_dof_pos[i] = cfg.init_state.default_joint_angles[dname]
            for key_s in cfg.control.stiffness:
                if key_s in dname:
                    p_gains[i] = cfg.control.stiffness[key_s]
                    d_gains[i] = cfg.control.damping[key_s]
        self.default_dof_pos = jnp.asarray(default_dof_pos, jnp.float32)
        self.pd = phys.PDParams(
            p_gains=jnp.asarray(p_gains, jnp.float32),
            d_gains=jnp.asarray(d_gains, jnp.float32),
            default_dof_pos=self.default_dof_pos,
            torque_limits=jnp.asarray(m.dof_effort_limits, jnp.float32),
            action_scale=cfg.control.action_scale,
            control_type=cfg.control.control_type,
        )
        self.dof_limits = (
            jnp.asarray(m.dof_pos_limits[:, 0], jnp.float32),
            jnp.asarray(m.dof_pos_limits[:, 1], jnp.float32),
            jnp.asarray(m.dof_vel_limits, jnp.float32),
        )
        def _per_dof(spec):
            """Scalar or {name-substring: value} dict -> (ndof,) array or
            None if all-zero (matching control.stiffness name semantics)."""
            vals = np.zeros(m.num_dof)
            if isinstance(spec, dict):
                for i, dname in enumerate(m.dof_names):
                    for key_s, v in spec.items():
                        if key_s in dname:
                            vals[i] = v
            else:
                vals[:] = float(spec)
            if not np.any(vals):
                return None
            return jnp.asarray(vals, jnp.float32)

        self.sim_params = phys.SimParams(
            dt=cfg.sim.dt,
            decimation=cfg.control.decimation,
            substeps=cfg.sim.substeps,
            gravity=tuple(cfg.sim.gravity),
            contact=phys.ContactParams(
                stiffness=cfg.sim.contact_stiffness,
                damping=cfg.sim.contact_damping,
                friction_vel=cfg.sim.contact_friction_vel,
                terrain_friction=cfg.terrain.static_friction,
            ),
            joint_limit_stiffness=cfg.sim.joint_limit_stiffness,
            joint_limit_damping=cfg.sim.joint_limit_damping,
            dof_damping=_per_dof(getattr(cfg.sim, "joint_damping", 0.0)),
            dof_armature=_per_dof(getattr(cfg.sim, "joint_armature", 0.0)),
            dof_frictionloss=_per_dof(getattr(cfg.sim, "joint_frictionloss", 0.0)),
            frictionloss_implicit=bool(
                getattr(cfg.sim, "joint_frictionloss_implicit", False)
            ),
        )
        if (
            self.sim_params.frictionloss_implicit
            and self.sim_params.dof_frictionloss is not None
        ):
            meff = phys.effective_joint_inertia(
                self.ma,
                np.asarray(
                    [cfg.init_state.default_joint_angles[d] for d in m.dof_names],
                    np.float32,
                ),
                armature=self.sim_params.dof_armature,
            )
            self.sim_params = self.sim_params._replace(dof_meff=meff)

        # ---- link groups (name-substring matching, legged_robot.py:846-894) ----
        self.feet_ids = m.link_ids_matching(cfg.asset.foot_name)
        self.penalized_ids = m.link_ids_matching(cfg.asset.penalize_contacts_on)
        self.termination_ids = m.link_ids_matching(cfg.asset.terminate_after_contacts_on)
        self.calf_link_ids = m.link_ids_matching("calf")
        self.hip_joint_ids = m.dof_ids_matching("hip")
        self.thigh_joint_ids = m.dof_ids_matching("thigh")
        self.calf_joint_ids = m.dof_ids_matching("calf")
        self.n_feet = len(self.feet_ids)

        # ---- scandot grid (legged_robot.py:980-994) ----
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y),
                             indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=-1)
        self.height_points = jnp.asarray(pts, jnp.float32)   # (P, 3)
        self.num_height_points = pts.shape[0]
        # scandot patch size: worst-case yaw-rotated point radius + margin
        if not self.hf.is_plane:
            radius = float(np.linalg.norm(pts[:, :2], axis=1).max()) + 0.3
            k = int(round(2 * radius / cfg.terrain.horizontal_scale))
            self._scan_patch_K = -(-k // 8) * 8
        else:
            self._scan_patch_K = 0

        # ---- rewards (legged_robot.py:730-754) ----
        scales = {}
        for k in dir(cfg.rewards.scales):
            if k.startswith("_"):
                continue
            v = getattr(cfg.rewards.scales, k)
            if isinstance(v, (int, float)) and v != 0:
                scales[k] = v
        self.termination_scale = scales.pop("termination", None)
        self.reward_names = sorted(scales)
        self.reward_terms = [
            (nm, rew_lib.REWARD_REGISTRY[nm], float(scales[nm]) * self.dt)
            for nm in self.reward_names
        ]
        # episode-sum slots: regular terms (+ termination if scaled)
        self.episode_sum_names = list(self.reward_names)
        if self.termination_scale is not None:
            self.episode_sum_names.append("termination")

        r = cfg.rewards
        m_soft = (m.dof_pos_limits[:, 0] + m.dof_pos_limits[:, 1]) / 2
        rng_lim = m.dof_pos_limits[:, 1] - m.dof_pos_limits[:, 0]
        soft_limits = np.stack(
            [m_soft - 0.5 * rng_lim * r.soft_dof_pos_limit,
             m_soft + 0.5 * rng_lim * r.soft_dof_pos_limit], axis=-1
        )
        self.reward_statics = RewardStatics(
            dt=self.dt,
            tracking_sigma=r.tracking_sigma,
            base_height_target=r.base_height_target,
            max_contact_force=r.max_contact_force,
            pitch_deg_target=r.pitch_deg_target,
            roll_deg_target=r.roll_deg_target,
            max_foot_height=r.max_foot_height,
            percent_time_on_ground=r.percent_time_on_ground,
            soft_dof_pos_limits=jnp.asarray(soft_limits, jnp.float32),
            soft_dof_vel_limit=r.soft_dof_vel_limit,
            soft_torque_limit=r.soft_torque_limit,
            dof_vel_limits=jnp.asarray(m.dof_vel_limits, jnp.float32),
            torque_limits=jnp.asarray(m.dof_effort_limits, jnp.float32),
            default_dof_pos=self.default_dof_pos,
            feet_ids=self.feet_ids,
            penalized_ids=self.penalized_ids,
            termination_ids=self.termination_ids,
            calf_link_ids=self.calf_link_ids,
            hip_joint_ids=self.hip_joint_ids,
            thigh_joint_ids=self.thigh_joint_ids,
            calf_joint_ids=self.calf_joint_ids,
            heading_command=cfg.commands.heading_command,
            jump_zone_fwd_gate=getattr(r, "jump_zone_fwd_gate", 0.0),
        )

        # Progress-stall termination (no reference counterpart; round-5
        # escape from the gap-edge balk optimum — with an active velocity
        # command, `stall_time_s` seconds without gaining new course ground
        # ends the episode as a true death, so braking at a gap edge forfeits
        # the whole remaining horizon instead of farming alive-time).
        term_cfg = getattr(cfg, "termination", None)
        self.stall_time_s = float(getattr(term_cfg, "stall_time_s", 0.0) or 0.0)
        self.stall_min_vel = float(getattr(term_cfg, "stall_min_vel", 0.2))

        self.obs_scales = cfg.normalization.obs_scales
        self.commands_scale = jnp.asarray(
            [self.obs_scales.lin_vel, self.obs_scales.lin_vel, self.obs_scales.ang_vel],
            jnp.float32,
        )
        self.noise_scale_vec = self._noise_scale_vec()

        init = cfg.init_state
        # reference stores rot as xyzw (Isaac); convert to our wxyz
        rx, ry, rz, rw = init.rot
        self.base_init = dict(
            pos=jnp.asarray(init.pos, jnp.float32),
            quat=jnp.asarray([rw, rx, ry, rz], jnp.float32),
            lin_vel=jnp.asarray(init.lin_vel, jnp.float32),
            ang_vel=jnp.asarray(init.ang_vel, jnp.float32),
        )

        self._torque_fn = self._build_torque_fn()

    def _vstep(self, physics, actions, dr, actuator_state):
        """Run the natively-batched SoA engine from batch-leading env arrays.

        The env stores (B, ...) leaves (convenient for masked resets and obs);
        the engine wants component-major with batch trailing (physics/soa.py).
        The moveaxis transposes are negligible next to the physics itself.
        """
        to_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), t)
        from_soa = lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), t)
        st, info, acts = phys.control_step(
            self.ma, self.hf, self.sim_params, self.pd,
            to_soa(dr), self.dof_limits,
            to_soa(physics), jnp.moveaxis(actions, 0, -1),
            actuator_state=to_soa(actuator_state), torque_fn=self._torque_fn,
        )
        return from_soa(st), from_soa(info), from_soa(acts)

    # ------------------------------------------------------------------
    # Stateful actuator hooks (ANYmal SEA network overrides these)
    # ------------------------------------------------------------------
    def _build_torque_fn(self):
        return None

    def _init_actuator_state(self):
        """Per-env initial actuator state; () placeholder when stateless."""
        return jnp.zeros((self.num_envs,), jnp.float32)

    def _reset_actuator_state(self, act_state, reset_mask):
        return jax.tree.map(
            lambda x: jnp.where(
                reset_mask.reshape((self.num_envs,) + (1,) * (x.ndim - 1)), 0.0, x
            ),
            act_state,
        )

    # ------------------------------------------------------------------
    # Task-specific hooks (overridden by Go2Env etc.)
    # ------------------------------------------------------------------
    @property
    def num_proprio(self) -> int:
        return self.cfg.env.num_proprio

    def _noise_scale_vec(self) -> jnp.ndarray:
        """Base layout noise vector (legged_robot.py:594-622), alignment fixed
        to the actual obs layout (the reference version has an off-by-one)."""
        cfg = self.cfg
        n = np.zeros(cfg.env.num_proprio, np.float32)
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        osc = cfg.normalization.obs_scales
        n[0:3] = ns.lin_vel * lvl * osc.lin_vel
        n[3:6] = ns.ang_vel * lvl * osc.ang_vel
        n[6:9] = ns.gravity * lvl
        n[9:12] = 0.0  # commands
        a = self.num_actions
        n[12:12 + a] = ns.dof_pos * lvl * osc.dof_pos
        n[12 + a:12 + 2 * a] = ns.dof_vel * lvl * osc.dof_vel
        n[12 + 2 * a:12 + 3 * a] = 0.0  # previous actions
        if cfg.terrain.measure_heights:
            n[12 + 3 * a:] = ns.height_measurements * lvl * osc.height_measurements
        return jnp.asarray(n)

    def _proprio_obs(self, state: EnvState, derived: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Current-step proprio obs (legged_robot.py:240-256)."""
        ph = state.physics
        parts = [
            derived["base_lin_vel"] * self.obs_scales.lin_vel,
            derived["base_ang_vel"] * self.obs_scales.ang_vel,
            derived["projected_gravity"],
            state.commands[:, :3] * self.commands_scale,
            (ph.dof_pos - self.default_dof_pos) * self.obs_scales.dof_pos,
            ph.dof_vel * self.obs_scales.dof_vel,
            state.actions,
        ]
        if self.cfg.terrain.measure_heights:
            heights = jnp.clip(
                ph.base_pos[:, 2:3] - 0.5 - state.measured_heights, -1.0, 1.0
            ) * self.obs_scales.height_measurements
            parts.append(heights)
        return jnp.concatenate(parts, axis=-1)

    def _streams(self, state: EnvState, derived, obs_full) -> Obs:
        """Privileged / estimated / scan / critic streams.

        The reference base class allocates but never fills these
        (base_task.py:76-81); we fill critic with the concatenation so the
        5-stream trainer works for every task (documented deviation).
        """
        B = obs_full.shape[0]
        privileged = self._privileged_obs(state)
        estimated = derived["base_lin_vel"] * self.obs_scales.lin_vel
        estimated = estimated[:, : self.cfg.env.num_estimated_obs]
        if estimated.shape[1] < self.cfg.env.num_estimated_obs:
            estimated = jnp.pad(
                estimated, ((0, 0), (0, self.cfg.env.num_estimated_obs - estimated.shape[1]))
            )
        scan = self._scan_obs(state)
        critic = jnp.concatenate([obs_full, privileged, estimated, scan], axis=-1)
        return Obs(obs_full, privileged, critic, estimated, scan)

    def _privileged_obs(self, state: EnvState) -> jnp.ndarray:
        """Go2-style privileged stream (go2.py:528-532), truncated/padded to cfg."""
        n = self.cfg.env.num_privileged_obs
        full = jnp.concatenate(
            [
                state.dr.added_mass[:, None],
                state.dr.com_offset,
                state.dr.friction[:, None],
                state.dr.kp_mult - 1.0,
                state.dr.kd_mult - 1.0,
            ],
            axis=-1,
        )
        if full.shape[1] >= n:
            return full[:, :n]
        return jnp.pad(full, ((0, 0), (0, n - full.shape[1])))

    def _scan_obs(self, state: EnvState) -> jnp.ndarray:
        n = self.cfg.env.num_scan_obs
        if n == 0:
            return jnp.zeros((state.commands.shape[0], 0), jnp.float32)
        scan = jnp.clip(
            state.physics.base_pos[:, 2:3] - 0.3 - state.measured_heights, -1.0, 1.0
        )
        return scan[:, :n]

    def _phases(self, state: EnvState) -> jnp.ndarray:
        """Per-leg gait phases [fl, fr, bl, br] (go2.py:277-290)."""
        e = self.cfg.env
        phase = (state.episode_length.astype(jnp.float32) * self.dt) % e.period / e.period
        legs = jnp.stack(
            [
                (phase + e.fl_offset) % 1.0,
                (phase + e.fr_offset) % 1.0,
                (phase + e.bl_offset) % 1.0,
                (phase + e.br_offset) % 1.0,
            ],
            axis=-1,
        )
        small = jnp.linalg.norm(state.commands[:, :3], axis=1) < 0.2
        return jnp.where(small[:, None], 0.0, legs)

    def _check_termination(self, state: EnvState, derived):
        """legged_robot.py:141-154 (+ go2 parkour hole check, go2.py:200-204)."""
        f = derived["link_forces"]
        contact_term = jnp.any(
            jnp.linalg.norm(f[:, self.termination_ids, :], axis=-1) > 1.0, axis=1
        )
        time_out = state.episode_length > self.max_episode_length
        upside_down = derived["projected_gravity"][:, 2] > 0.0
        reset = contact_term | time_out | upside_down
        if getattr(self.cfg.terrain, "parkour", False):
            reset = reset | (state.physics.base_pos[:, 2] < -1.0)
        if self.stall_time_s > 0.0 and state.stall_time is not None:
            # Counted as a death (not a time_out), so PPO does not bootstrap
            # past it — loitering forfeits the remaining horizon's value.
            reset = reset | (state.stall_time > self.stall_time_s)
        return reset, time_out

    # ------------------------------------------------------------------
    # Env origins (legged_robot.py:897-930)
    # ------------------------------------------------------------------
    def _initial_origins(self, key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = self.num_envs
        cfg = self.cfg
        if self.custom_origins:
            max_init = cfg.terrain.max_init_terrain_level
            if not cfg.terrain.curriculum:
                max_init = cfg.terrain.num_rows - 1
            levels = jax.random.randint(key, (B,), 0, max_init + 1)
            types = (jnp.arange(B) // (B / cfg.terrain.num_cols)).astype(jnp.int32)
            origins = self.terrain_origins[levels, types]
            return levels.astype(jnp.int32), types, origins
        ncols = int(np.floor(np.sqrt(B)))
        nrows = int(np.ceil(B / ncols))
        xx, yy = np.meshgrid(np.arange(nrows), np.arange(ncols), indexing="ij")
        spacing = cfg.env.env_spacing
        origins = np.zeros((B, 3), np.float32)
        origins[:, 0] = spacing * xx.flatten()[:B]
        origins[:, 1] = spacing * yy.flatten()[:B]
        return (
            jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.asarray(origins),
        )

    # ------------------------------------------------------------------
    # Domain randomization (sampled once at env creation, like the
    # reference's asset-creation-time callbacks legged_robot.py:306-380)
    # ------------------------------------------------------------------
    def _sample_dr(self, key) -> DomainRandParams:
        B = self.num_envs
        cfg = self.cfg.domain_rand
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if cfg.randomize_friction:
            num_buckets = 64
            buckets = jax.random.uniform(
                k1, (num_buckets,), minval=cfg.friction_range[0], maxval=cfg.friction_range[1]
            )
            ids = jax.random.randint(k2, (B,), 0, num_buckets)
            friction = buckets[ids]
        else:
            friction = jnp.full((B,), self.cfg.terrain.dynamic_friction)
        added_mass = (
            jax.random.uniform(k3, (B,), minval=cfg.added_mass_range[0], maxval=cfg.added_mass_range[1])
            if cfg.randomize_base_mass else jnp.zeros(B)
        )
        com_offset = (
            jax.random.uniform(k4, (B, 3), minval=cfg.added_com_range[0], maxval=cfg.added_com_range[1])
            if cfg.randomize_center_of_mass else jnp.zeros((B, 3))
        )
        if cfg.randomize_kp_kd:
            mult = jax.random.uniform(
                k5, (2, B, self.num_actions), minval=cfg.kp_kd_range[0], maxval=cfg.kp_kd_range[1]
            )
            kp_mult, kd_mult = mult[0], mult[1]
        else:
            kp_mult = jnp.ones((B, self.num_actions))
            kd_mult = jnp.ones((B, self.num_actions))
        return DomainRandParams(friction, added_mass, com_offset, kp_mult, kd_mult)

    # ------------------------------------------------------------------
    # Resets (masked, branchless)
    # ------------------------------------------------------------------
    def _sample_reset_physics(self, state: EnvState, key, origins):
        """New dof/root states for (potentially) resetting envs
        (legged_robot.py:481-532).

        Optional spawn curriculum (off by default; used by the parkour
        consolidation stage): `init_state.rand_x_offsets` scatters spawns
        across course segments (one entry per flat segment start) with
        `rand_x_jitter` uniform slack, and `rand_vx_range` gives robots an
        initial forward velocity — so episodes begin in motion near the
        obstacles instead of rediscovering the approach from the start
        platform every time.
        """
        B = self.num_envs
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        dof_pos = self.default_dof_pos + jax.random.uniform(
            k1, (B, self.model.num_dof), minval=0.0, maxval=0.9
        )
        dof_vel = jnp.zeros((B, self.model.num_dof))
        pos = self.base_init["pos"] + origins
        if self.custom_origins:
            xy = jax.random.uniform(k2, (B, 2), minval=-1.0, maxval=1.0)
            pos = pos.at[:, :2].add(xy)
        init = self.cfg.init_state
        x_offsets = getattr(init, "rand_x_offsets", None)
        if x_offsets:
            seg = jax.random.choice(
                k4, jnp.asarray(x_offsets, jnp.float32), (B,)
            )
            jit_lo, jit_hi = getattr(init, "rand_x_jitter", (0.0, 0.0))
            seg = seg + jax.random.uniform(k5, (B,), minval=jit_lo, maxval=jit_hi)
            pos = pos.at[:, 0].add(seg)
        vel6 = jax.random.uniform(k3, (B, 6), minval=-0.5, maxval=0.5)
        lin_vel = vel6[:, 0:3]
        vx_range = getattr(init, "rand_vx_range", None)
        if vx_range is not None:
            vx0 = jax.random.uniform(
                k6, (B,), minval=vx_range[0], maxval=vx_range[1]
            )
            lin_vel = lin_vel.at[:, 0].set(vx0)
        quat = jnp.broadcast_to(self.base_init["quat"], (B, 4))
        return PhysicsState(
            base_pos=pos,
            base_quat=quat,
            lin_vel=lin_vel,
            ang_vel=vel6[:, 3:6],
            dof_pos=dof_pos,
            dof_vel=dof_vel,
        )

    def _resample_commands(self, state: EnvState, key, mask) -> jnp.ndarray:
        """Masked command resampling (go2.py:413-464)."""
        cfg = self.cfg.commands
        B = self.num_envs
        cr = state.command_ranges
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        cmds = state.commands
        if len(cfg.user_command) > 0:
            new = jnp.broadcast_to(jnp.asarray(cfg.user_command, jnp.float32), (B, 4))
            return jnp.where(mask[:, None], new, cmds)
        vx = jax.random.uniform(k1, (B,), minval=cr[0, 0], maxval=cr[0, 1])
        vy = jax.random.uniform(k2, (B,), minval=cr[1, 0], maxval=cr[1, 1])
        new = cmds
        new = new.at[:, 0].set(jnp.where(mask, vx, cmds[:, 0]))
        new = new.at[:, 1].set(jnp.where(mask, vy, cmds[:, 1]))
        if cfg.heading_command:
            hd = jax.random.uniform(k3, (B,), minval=cr[3, 0], maxval=cr[3, 1])
            new = new.at[:, 3].set(jnp.where(mask, hd, cmds[:, 3]))
        else:
            wz = jax.random.uniform(k3, (B,), minval=cr[2, 0], maxval=cr[2, 1])
            new = new.at[:, 2].set(jnp.where(mask, wz, cmds[:, 2]))
        # zero small xy commands
        small = jnp.linalg.norm(new[:, :2], axis=1) > 0.2
        new = new.at[:, :2].multiply(jnp.where(mask, small, 1.0)[:, None])
        if cfg.zero_command:
            zmask = (jax.random.uniform(k4, (B,)) < cfg.zero_command_prob) & mask
            new = new.at[:, 0:3].multiply(jnp.where(zmask, 0.0, 1.0)[:, None])
            if cfg.heading_command:
                # "zero" heading: target = current heading (go2.py:460-464)
                fwd = sp.quat_rotate(
                    state.physics.base_quat, jnp.array([1.0, 0.0, 0.0])
                )
                cur_heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
                new = new.at[:, 3].set(jnp.where(zmask, cur_heading, new[:, 3]))
        return new

    def _update_terrain_curriculum(self, state: EnvState, key, reset_mask):
        """Promote/demote terrain levels on reset (legged_robot.py:543-574)."""
        if not (self.cfg.terrain.curriculum and self.custom_origins):
            return state.terrain_levels, state.env_origins
        cfg = self.cfg.terrain
        dist = jnp.linalg.norm(
            state.physics.base_pos[:, :2] - state.env_origins[:, :2], axis=1
        )
        move_up = dist > self.terrain.env_length * cfg.promote_threshold
        expected = jnp.linalg.norm(state.commands[:, :2], axis=1) * self.max_episode_length_s
        move_down = dist < expected * cfg.demote_threshold
        levels = state.terrain_levels + jnp.where(move_up, 1, 0) - jnp.where(move_down, 1, 0)
        rand_levels = jax.random.randint(key, levels.shape, 0, cfg.num_rows)
        levels = jnp.where(levels >= cfg.num_rows, rand_levels, jnp.clip(levels, 0))
        levels = jnp.where(reset_mask, levels, state.terrain_levels)
        origins = self.terrain_origins[levels, state.terrain_types]
        origins = jnp.where(reset_mask[:, None], origins, state.env_origins)
        return levels, origins

    def _update_command_curriculum(self, state: EnvState, reset_mask):
        """Widen lin_vel_x range when tracking is good (go2.py:80-107),
        gated on common_step % max_episode_length == 0 (go2.py:222)."""
        cfg = self.cfg.commands
        if not cfg.curriculum:
            return state.command_ranges
        try:
            idx = self.episode_sum_names.index("tracking_lin_vel")
        except ValueError:
            return state.command_ranges
        gate = (state.common_step % self.max_episode_length) == 0
        cnt = jnp.maximum(jnp.sum(reset_mask), 1)
        mean_rew = jnp.sum(
            jnp.where(reset_mask, state.episode_sums[:, idx], 0.0)
        ) / cnt / self.max_episode_length
        term_scale = next(s for n, _, s in self.reward_terms if n == "tracking_lin_vel")
        good = mean_rew > 0.8 * term_scale
        delta = cfg.vel_increment
        cr = state.command_ranges
        lo = jnp.clip(cr[0, 0] - delta, cfg.max_reverse_vel, 0.0) \
            if cfg.max_reverse_vel < 0.0 else jnp.maximum(cr[0, 0] - delta, cfg.max_reverse_vel)
        hi = jnp.clip(cr[0, 1] + delta, 0.0, cfg.max_forward_vel)
        apply = gate & good & jnp.any(reset_mask)
        cr = cr.at[0, 0].set(jnp.where(apply, lo, cr[0, 0]))
        cr = cr.at[0, 1].set(jnp.where(apply, hi, cr[0, 1]))
        return cr

    # ------------------------------------------------------------------
    # Heights (legged_robot.py:997-1032)
    # ------------------------------------------------------------------
    def _get_heights(self, ph: PhysicsState) -> jnp.ndarray:
        if self.hf.is_plane:
            return jnp.zeros((ph.base_pos.shape[0], self.num_height_points), jnp.float32)
        pts = sp.quat_apply_yaw(
            ph.base_quat[:, None, :], self.height_points[None, :, :]
        ) + ph.base_pos[:, None, :]
        # per-env local window + one-hot-matmul min3 taps instead of 132x3
        # global-table gathers (physics/patch.py); the window covers the
        # scandot grid's worst-case yaw-rotated radius
        lp = phys.extract_patch(
            self.hf, ph.base_pos[:, 0], ph.base_pos[:, 1], self._scan_patch_K
        )
        return phys.patch_height_min3(lp, pts[..., 0], pts[..., 1])

    # ------------------------------------------------------------------
    # Reset-all / step
    # ------------------------------------------------------------------
    def reset_all(self, key, init_at_random_ep_len: bool = False
                  ) -> Tuple[EnvState, Obs]:
        B = self.num_envs
        keys = jax.random.split(key, 6)
        levels, types, origins = self._initial_origins(keys[0])
        dr = self._sample_dr(keys[1])
        cfg = self.cfg
        cr = jnp.asarray(
            [cfg.commands.ranges.lin_vel_x, cfg.commands.ranges.lin_vel_y,
             cfg.commands.ranges.ang_vel_yaw, cfg.commands.ranges.heading],
            jnp.float32,
        )
        nterms = len(self.episode_sum_names)
        state = EnvState(
            physics=None,  # filled below
            episode_length=jnp.zeros(B, jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            commands=jnp.zeros((B, 4)),
            actions=jnp.zeros((B, self.num_actions)),
            last_actions=jnp.zeros((B, self.num_actions)),
            last_dof_vel=jnp.zeros((B, self.model.num_dof)),
            last_torques=jnp.zeros((B, self.num_actions)),
            last_base_lin_vel=jnp.zeros((B, 3)),
            last_root_vel=jnp.zeros((B, 6)),
            obs_history=jnp.zeros(
                (B, cfg.env.history_buffer_length, cfg.env.num_proprio)
            ),
            measured_heights=jnp.zeros((B, self.num_height_points)),
            feet_air_time=jnp.zeros((B, self.n_feet)),
            last_contacts=jnp.zeros((B, self.n_feet), bool),
            last_contact_heights=jnp.zeros((B, self.n_feet)),
            jump_flags=jnp.zeros(B),
            terrain_levels=levels,
            terrain_types=types,
            env_origins=origins,
            episode_sums=jnp.zeros((B, nterms)),
            command_ranges=cr,
            dr=dr,
            rng=keys[2],
            actuator_state=self._init_actuator_state(),
            max_x=jnp.zeros(B),
            stall_time=jnp.zeros(B),
        )
        physics = self._sample_reset_physics(state, keys[3], origins)
        state = state.replace(physics=physics, max_x=physics.base_pos[:, 0])
        cmds = self._resample_commands(state, keys[4], jnp.ones(B, bool))
        state = state.replace(commands=cmds)
        if init_at_random_ep_len:
            state = state.replace(
                episode_length=jax.random.randint(
                    keys[5], (B,), 0, self.max_episode_length
                )
            )
        state, obs, _, _, _ = jax.jit(self.step)(
            state, jnp.zeros((B, self.num_actions))
        )
        return state, obs

    def step(self, state: EnvState, actions: jnp.ndarray
             ) -> Tuple[EnvState, Obs, jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        B = self.num_envs
        rng, k_cmd, k_push, k_reset_phys, k_reset_cmd, k_lvl, k_noise = jax.random.split(
            state.rng, 7
        )

        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        # ---- physics (decimated PD torque loop) ----
        ph, info, actuator_state = self._vstep(
            state.physics, actions, state.dr, state.actuator_state
        )
        episode_length = state.episode_length + 1
        common_step = state.common_step + 1

        # ---- derived quantities (go2.py:352-367) ----
        base_lin_vel = sp.quat_rotate_inverse(ph.base_quat, ph.lin_vel)
        base_ang_vel = sp.quat_rotate_inverse(ph.base_quat, ph.ang_vel)
        gvec = jnp.array([0.0, 0.0, -1.0])
        projected_gravity = sp.quat_rotate_inverse(ph.base_quat, jnp.broadcast_to(gvec, (B, 3)))
        roll, pitch, yaw = sp.quat_to_rpy(ph.base_quat)
        fwd = sp.quat_rotate(ph.base_quat, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (B, 3)))
        heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])

        # ---- feet states + gait phases (go2.py:266-328) ----
        state_pre = state.replace(
            physics=ph, episode_length=episode_length, common_step=common_step
        )
        phases = self._phases(state_pre)
        feet_pos = info.link_pos[:, self.feet_ids, :]
        feet_force = info.link_forces[:, self.feet_ids, :]
        cur_contact = feet_force[:, :, 2] > 1.0
        contact_filt = cur_contact | state.last_contacts
        last_contacts = cur_contact
        last_contact_heights = jnp.where(
            contact_filt, feet_pos[:, :, 2], state.last_contact_heights
        )
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt

        # ---- post-physics callback (go2.py:390-410) ----
        resample_mask = (episode_length % self.resample_interval) == 0
        commands = self._resample_commands(
            state_pre.replace(commands=state.commands), k_cmd, resample_mask
        )
        if cfg.commands.heading_command:
            gain = getattr(cfg.commands, "heading_error_gain", 0.5)
            err = sp.wrap_to_pi(commands[:, 3] - heading) * gain
            commands = commands.at[:, 2].set(jnp.clip(err, -1.0, 1.0))
        measured_heights = self._get_heights(ph)
        if cfg.domain_rand.push_robots:
            push_now = (common_step % self.push_interval) == 0
            push_vel = jax.random.uniform(
                k_push, (B, 2),
                minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy,
            )
            new_xy = jnp.where(push_now, push_vel, ph.lin_vel[:, :2])
            ph = ph._replace(lin_vel=ph.lin_vel.at[:, :2].set(new_xy))

        derived = dict(
            base_lin_vel=base_lin_vel,
            base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity,
            link_forces=info.link_forces,
        )

        # ---- course progress + stall tracking (round-5 commit stage) ----
        base_x = ph.base_pos[:, 0]
        prev_max_x = state.max_x if state.max_x is not None else base_x
        prev_stall = (
            state.stall_time if state.stall_time is not None else jnp.zeros(B)
        )
        progress = jnp.clip(base_x - prev_max_x, min=0.0) / self.dt  # m/s of new ground
        max_x = jnp.maximum(prev_max_x, base_x)
        moving_cmd = jnp.linalg.norm(commands[:, :3], axis=1) >= 0.2
        stalled = moving_cmd & (progress < self.stall_min_vel)
        stall_time = jnp.where(stalled, prev_stall + self.dt, 0.0)

        # ---- termination (go2.py:186-204) ----
        state_mid = state_pre.replace(
            physics=ph, commands=commands, measured_heights=measured_heights,
            max_x=max_x, stall_time=stall_time,
        )
        reset_buf, time_out_buf = self._check_termination(state_mid, derived)

        # ---- rewards (legged_robot.py:216-237) ----
        ctx = RewardCtx(
            base_pos=ph.base_pos,
            base_lin_vel=base_lin_vel,
            base_ang_vel=base_ang_vel,
            world_lin_vel=ph.lin_vel,
            projected_gravity=projected_gravity,
            roll=roll, pitch=pitch, yaw=yaw, heading=heading,
            commands=commands,
            dof_pos=ph.dof_pos,
            dof_vel=ph.dof_vel,
            last_dof_vel=state.last_dof_vel,
            torques=info.torques,
            last_torques=state.last_torques,
            actions=actions,
            last_actions=state.last_actions,
            link_forces=info.link_forces,
            feet_pos=feet_pos,
            feet_vel=info.link_vel[:, self.feet_ids, :],
            last_contact_heights=last_contact_heights,
            contact_filt=contact_filt,
            feet_air_time=feet_air_time,
            first_contact=first_contact,
            phases=phases,
            measured_heights=measured_heights,
            jump_flags=state.jump_flags,
            reset_buf=reset_buf,
            time_out_buf=time_out_buf,
            progress=progress,
        )
        rew_buf = jnp.zeros(B)
        episode_sums = state.episode_sums
        for i, (name, fn, scale) in enumerate(self.reward_terms):
            r = fn(ctx, self.reward_statics) * scale
            rew_buf = rew_buf + r
            episode_sums = episode_sums.at[:, i].add(r)
        if cfg.rewards.only_positive_rewards:
            rew_buf = jnp.clip(rew_buf, min=0.0)
        if self.termination_scale is not None:
            r = rew_lib.REWARD_REGISTRY["termination"](ctx, self.reward_statics) * (
                self.termination_scale * self.dt
            )
            rew_buf = rew_buf + r
            episode_sums = episode_sums.at[:, len(self.reward_terms)].add(r)

        # feet air time consumed on contact (go2.py:830)
        feet_air_time = feet_air_time * ~contact_filt

        # ---- masked reset (reset_idx, go2.py:207-263) ----
        levels, origins = self._update_terrain_curriculum(
            state_mid.replace(episode_sums=episode_sums), k_lvl, reset_buf
        )
        command_ranges = self._update_command_curriculum(
            state_mid.replace(episode_sums=episode_sums, command_ranges=state.command_ranges),
            reset_buf,
        )
        state_for_reset = state_mid.replace(command_ranges=command_ranges)
        reset_physics = self._sample_reset_physics(state_for_reset, k_reset_phys, origins)
        ph = jax.tree.map(
            lambda new, old: jnp.where(
                reset_buf.reshape((B,) + (1,) * (old.ndim - 1)), new, old
            ),
            reset_physics, ph,
        )
        commands = self._resample_commands(
            state_for_reset.replace(physics=ph), k_reset_cmd, reset_buf
        )
        rmask = reset_buf[:, None]
        actions_bufd = actions  # stored below as state.actions for obs
        last_actions = jnp.where(rmask, 0.0, actions)
        last_dof_vel = jnp.where(rmask, 0.0, ph.dof_vel)
        last_torques = jnp.where(rmask, 0.0, info.torques)
        last_base_lin_vel = jnp.where(rmask, 0.0, base_lin_vel)
        last_root_vel = jnp.where(
            rmask, 0.0, jnp.concatenate([ph.lin_vel, ph.ang_vel], axis=-1)
        )
        obs_history = jnp.where(reset_buf[:, None, None], 0.0, state.obs_history)
        episode_length = jnp.where(reset_buf, 0, episode_length)
        feet_air_time = jnp.where(rmask, 0.0, feet_air_time)
        last_contacts = jnp.where(rmask, False, last_contacts)
        last_contact_heights = jnp.where(rmask, 0.0, last_contact_heights)
        # reset envs restart progress tracking from their respawn position
        max_x = jnp.where(reset_buf, ph.base_pos[:, 0], max_x)
        stall_time = jnp.where(reset_buf, 0.0, stall_time)

        # Episode logging extras (go2.py:245-263) — returned as PER-ENV
        # contributions, NOT batch scalars: any jnp.sum over the sharded env
        # axis here would be an all-reduce inside the rollout scan (2
        # collectives x T steps per iteration on the compiled sharded HLO,
        # scripts/comm_budget.py).  The runner accumulates these in its scan
        # carry (elementwise, device-local) and reduces ONCE per iteration.
        episode_contrib = jnp.where(rmask, episode_sums, 0.0)  # (B, nterms)
        episode_sums = jnp.where(rmask, 0.0, episode_sums)

        info_out: Dict[str, Any] = {
            "time_outs": time_out_buf,
            "episode_contrib": episode_contrib,
        }

        # ---- observations ----
        new_state = EnvState(
            physics=ph,
            episode_length=episode_length,
            common_step=common_step,
            commands=commands,
            actions=actions,
            last_actions=last_actions,
            last_dof_vel=last_dof_vel,
            last_torques=last_torques,
            last_base_lin_vel=last_base_lin_vel,
            last_root_vel=last_root_vel,
            obs_history=obs_history,
            measured_heights=measured_heights,
            feet_air_time=feet_air_time,
            last_contacts=last_contacts,
            last_contact_heights=last_contact_heights,
            jump_flags=state.jump_flags,
            terrain_levels=levels,
            terrain_types=state.terrain_types,
            env_origins=origins,
            episode_sums=episode_sums,
            command_ranges=command_ranges,
            dr=state.dr,
            rng=rng,
            actuator_state=self._reset_actuator_state(actuator_state, reset_buf),
            max_x=max_x,
            stall_time=stall_time,
        )
        new_state, obs = self._compute_observations(new_state, derived, k_noise)

        # clip all streams except scan (legged_robot.py:91-97)
        c = cfg.normalization.clip_observations
        obs = Obs(
            obs=jnp.clip(obs.obs, -c, c),
            privileged=jnp.clip(obs.privileged, -c, c),
            critic=jnp.clip(obs.critic, -c, c),
            estimated=jnp.clip(obs.estimated, -c, c),
            scan=obs.scan,
        )
        return new_state, obs, rew_buf, reset_buf, info_out

    def _pre_obs_hook(self, state: EnvState) -> EnvState:
        """Task hook run before obs assembly (e.g. go2 jump flags)."""
        return state

    def _compute_observations(self, state: EnvState, derived, key):
        """Obs assembly + history FIFO (legged_robot.py:240-273)."""
        state = self._pre_obs_hook(state)
        # recompute derived for post-reset states
        ph = state.physics
        derived = dict(derived)
        derived["base_lin_vel"] = sp.quat_rotate_inverse(ph.base_quat, ph.lin_vel)
        derived["base_ang_vel"] = sp.quat_rotate_inverse(ph.base_quat, ph.ang_vel)
        B = self.num_envs
        derived["projected_gravity"] = sp.quat_rotate_inverse(
            ph.base_quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (B, 3))
        )
        cur = self._proprio_obs(state, derived)
        if self.cfg.noise.add_noise:
            noise = (2.0 * jax.random.uniform(key, cur.shape) - 1.0) * self.noise_scale_vec
            cur = cur + noise
        obs_full = jnp.concatenate(
            [state.obs_history.reshape(B, -1), cur], axis=-1
        )
        obs5 = self._streams(state, derived, obs_full)
        new_hist = jnp.where(
            (state.episode_length <= 1)[:, None, None],
            jnp.repeat(cur[:, None, :], self.cfg.env.history_buffer_length, axis=1),
            jnp.concatenate([state.obs_history[:, 1:], cur[:, None, :]], axis=1),
        )
        return state.replace(obs_history=new_hist), obs5
