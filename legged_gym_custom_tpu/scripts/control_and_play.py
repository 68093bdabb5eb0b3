"""Interactive play with live commands (reference scripts/control_and_play.py).

Drives a trained policy with gamepad commands (deploy/gamepad.py) or a
scripted command schedule when no gamepad is present; logs base/joint traces
through utils/logger.py.  Rendering, being Isaac-viewer-specific in the
reference, is replaced by the MuJoCo deploy loop for visual playback
(`--mujoco`) or headless trace logging.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("legged_gym_custom_tpu control_and_play")
    p.add_argument("--task", default="go2")
    p.add_argument("--load_run", default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--vx", type=float, default=0.8)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--wz", type=float, default=0.0)
    return p.parse_args(argv)


def play(args):
    from legged_gym_custom_tpu.deploy.gamepad import Gamepad
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.utils.logger import Logger

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = 1
    env_cfg.terrain.num_rows = 2
    env_cfg.terrain.num_cols = 2
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    env_cfg.domain_rand.push_robots = False
    env_cfg.domain_rand.randomize_friction = False
    env_cfg.domain_rand.randomize_base_mass = False
    env_cfg.domain_rand.randomize_center_of_mass = False
    env_cfg.domain_rand.randomize_kp_kd = False
    env_cfg.commands.user_command = [args.vx, args.vy, args.wz, 0.0]

    env, _ = task_registry.make_env(name=args.task, env_cfg=env_cfg)
    train_cfg.runner.resume = True
    runner, train_cfg = task_registry.make_alg_runner(
        env=env, name=args.task, train_cfg=train_cfg
    )
    policy = runner.get_inference_policy()

    pad = Gamepad(vel_scale_x=1.2, vel_scale_y=0.6, vel_scale_rot=1.0)
    logger = Logger(env.dt)
    state, obs = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(args.steps):
        cmd = pad.get_command()
        if pad._available:
            state = state.replace(
                commands=state.commands.at[0, :3].set(jnp.asarray(cmd))
            )
        if pad.estop_flagged:
            print("E-STOP")
            break
        actions = policy(obs, adaptation_mode=True)
        state, obs, rew, done, info = step(state, actions)
        logger.log_states(
            dict(
                base_vel_x=float(obs.estimated[0, 0]) / 2.0,
                command_x=float(state.commands[0, 0]),
                dof_pos=float(state.physics.dof_pos[0, 2]),
                dof_pos_target=float(actions[0, 2]) * env.cfg.control.action_scale,
            )
        )
        if i % 100 == 0:
            print(
                f"step {i}: vx={float(obs.estimated[0, 0]) / 2.0:+.2f} "
                f"cmd={float(state.commands[0, 0]):+.2f} z={float(state.physics.base_pos[0, 2]):.2f}"
            )
    logger.print_rewards()


if __name__ == "__main__":
    play(get_args())
