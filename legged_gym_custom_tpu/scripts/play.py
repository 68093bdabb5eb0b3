"""Evaluation / export entry point (reference legged_gym/scripts/play.py).

Loads the latest checkpoint for a task, runs deterministic rollouts with
play-time overrides (1 small terrain, no randomization/noise, play.py:14-25),
exports the deploy bundle (policy + adaptation + estimator + scan encoder
params, the analog of export_policy_as_jit, helpers.py:180-214), and logs
states through utils/logger.py.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("legged_gym_custom_tpu play")
    p.add_argument("--task", default="go2")
    p.add_argument("--load_run", default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--num_envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--export", action="store_true", default=True)
    p.add_argument("--plot", action="store_true")
    p.add_argument(
        "--record_scan",
        default=None,
        metavar="PATH",
        help="record jump-flag-synced scandot frames of env 0 to PATH in the "
        "SCAN_*.txt deploy-replay format (reference play.py:61-104)",
    )
    return p.parse_args(argv)


class ScanCapture:
    """Record jump-flag-synced scandot frames for deploy fake-scan replay.

    The reference keeps this as a commented block in the env
    (go2.py:540-559, README.md:57-61): while env 0's jump flag is raised,
    write the gait-phase sync scalar once (`[phase]`) and then one
    132-float frame per control step; when the flag drops after having been
    raised, stop.  The output is exactly what
    `deploy.controller.parse_scan_trace` reads and the replay state machine
    feeds to the scan encoder (deploy_base.py:59-143, SCAN_v12_ft_iii.txt).
    """

    def __init__(self, path: str):
        self.path = path
        self.started = False
        self.complete = False
        open(path, "w").close()

    def update(self, jump_flag: bool, phase: float, scan: np.ndarray) -> None:
        if self.complete:
            return
        if jump_flag:
            with open(self.path, "a") as f:
                if not self.started:
                    f.write(f"[{float(phase)}]\n\n")
                    self.started = True
                f.write(
                    np.array2string(
                        np.asarray(scan, np.float32), threshold=10_000
                    )
                    + "\n\n"
                )
        elif self.started:
            self.complete = True
            print(
                f"SCAN LOGGING COMPLETE — trace written to {self.path}"
            )


def play(args):
    from legged_gym_custom_tpu import LEGGED_GYM_TPU_ROOT_DIR
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.utils.logger import Logger

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    # play-time overrides (reference play.py:13-25)
    env_cfg.env.num_envs = min(args.num_envs, 100)
    env_cfg.terrain.num_rows = 5
    env_cfg.terrain.num_cols = 5
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.randomize_center_of_mass = False
    env_cfg.domain_rand.randomize_kp_kd = False

    env, _ = task_registry.make_env(name=args.task, args=args, env_cfg=env_cfg)
    train_cfg.runner.resume = True
    if args.load_run:
        train_cfg.runner.load_run = args.load_run
    if args.checkpoint is not None:
        train_cfg.runner.checkpoint = args.checkpoint
    runner, train_cfg = task_registry.make_alg_runner(
        env=env, name=args.task, args=None, train_cfg=train_cfg
    )
    policy = runner.get_inference_policy()

    if args.export:
        from legged_gym_custom_tpu.deploy.export import export_policy_bundle

        export_dir = os.path.join(
            LEGGED_GYM_TPU_ROOT_DIR, "logs", train_cfg.runner.experiment_name,
            "exported", "policies",
        )
        export_policy_bundle(runner.nets, runner.train_state.params, export_dir)
        print(f"Exported policy bundle to: {export_dir}")

    logger = Logger(env.dt)
    capture = ScanCapture(args.record_scan) if args.record_scan else None
    period = getattr(env.cfg.env, "period", 0.45)
    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    step = jax.jit(env.step)
    for i in range(args.steps):
        actions = policy(obs, adaptation_mode=True)
        state, obs, rew, done, info = step(state, actions)
        if capture is not None:
            phase0 = (float(state.episode_length[0]) * env.dt % period) / period
            capture.update(
                bool(state.jump_flags[0] > 0.0), phase0, np.asarray(obs.scan[0])
            )
        logger.log_states(
            dict(
                dof_pos_target=float(actions[0, 2]) * env.cfg.control.action_scale,
                dof_pos=float(state.physics.dof_pos[0, 2]),
                dof_vel=float(state.physics.dof_vel[0, 2]),
                dof_torque=0.0,
                command_x=float(state.commands[0, 0]),
                command_y=float(state.commands[0, 1]),
                command_yaw=float(state.commands[0, 2]),
                base_vel_x=float(jnp.squeeze(obs.estimated[0, 0])) / 2.0,
                base_vel_y=float(jnp.squeeze(obs.estimated[0, 1])) / 2.0,
                base_vel_z=float(jnp.squeeze(obs.estimated[0, 2])) / 2.0,
                base_vel_yaw=0.0,
                contact_forces_z=np.zeros(4),
            )
        )
        if bool(done[0]):
            logger.reset()
    logger.print_rewards()
    if args.plot:
        logger.plot_states()


if __name__ == "__main__":
    play(get_args())
