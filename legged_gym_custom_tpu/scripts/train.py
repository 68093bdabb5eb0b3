"""Training entry point (reference legged_gym/scripts/train.py).

Usage: python -m legged_gym_custom_tpu.scripts.train --task go2 [--num_envs N]
       [--max_iterations M] [--seed S] [--resume] [--load_run R] [--checkpoint C]
"""
from __future__ import annotations

import argparse

from legged_gym_custom_tpu.envs import task_registry


def get_args(argv=None):
    """CLI args (reference helpers.py:152-178; GPU/horovod flags dropped —
    device placement is JAX-native, the mesh comes from cfg.parallel)."""
    p = argparse.ArgumentParser("legged_gym_custom_tpu train")
    p.add_argument("--task", default="go2")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--run_name", default=None)
    p.add_argument("--load_run", default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--headless", action="store_true")  # accepted for parity
    return p.parse_args(argv)


def train(args):
    env, env_cfg = task_registry.make_env(name=args.task, args=args)
    runner, train_cfg = task_registry.make_alg_runner(env=env, name=args.task, args=args)
    runner.learn(
        num_learning_iterations=train_cfg.runner.max_iterations,
        init_at_random_ep_len=True,
    )


if __name__ == "__main__":
    train(get_args())
