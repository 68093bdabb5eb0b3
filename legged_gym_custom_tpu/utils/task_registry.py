"""Task registry (reference utils/task_registry.py:14-125).

Maps task name -> (env class, env cfg class, train cfg class) and builds
envs/runners with CLI overrides applied.
"""
from __future__ import annotations

from typing import Dict, Tuple, Type

from .config import set_seed, update_class_from_dict


class TaskRegistry:
    def __init__(self):
        self.task_classes: Dict[str, type] = {}
        self.env_cfgs: Dict[str, type] = {}
        self.train_cfgs: Dict[str, type] = {}

    def register(self, name: str, task_class, env_cfg, train_cfg) -> None:
        self.task_classes[name] = task_class
        self.env_cfgs[name] = env_cfg
        self.train_cfgs[name] = train_cfg

    def get_task_class(self, name: str):
        return self.task_classes[name]

    def get_cfgs(self, name: str):
        """Fresh instantiated cfg pair for the task."""
        return self.env_cfgs[name](), self.train_cfgs[name]()

    def make_env(self, name: str, args=None, env_cfg=None):
        """Build the (pure-functional) env object (reference :35-72)."""
        if name not in self.task_classes:
            raise ValueError(f"Task with name: {name} was not registered")
        task_class = self.get_task_class(name)
        if env_cfg is None:
            env_cfg, _ = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(env_cfg, None, args)
        seed = set_seed(getattr(args, "seed", None) if args else None)
        env = task_class(env_cfg, env_cfg.asset.file, name=name, terrain_seed=seed)
        return env, env_cfg

    def make_alg_runner(self, env, name=None, args=None, train_cfg=None,
                        log_root="default"):
        """Build the OnPolicyRunner (reference :74-125)."""
        import os
        from datetime import datetime

        from legged_gym_custom_tpu import LEGGED_GYM_TPU_ROOT_DIR
        from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

        if train_cfg is None:
            if name is None:
                raise ValueError("Either 'name' or 'train_cfg' must be not None")
            _, train_cfg = self.get_cfgs(name)
        if args is not None:
            update_cfg_from_args(None, train_cfg, args)
        if log_root == "default":
            log_root = os.path.join(
                LEGGED_GYM_TPU_ROOT_DIR, "logs", train_cfg.runner.experiment_name
            )
        log_dir = os.path.join(
            log_root,
            datetime.now().strftime("%b%d_%H-%M-%S") + "_" + train_cfg.runner.run_name,
        )
        runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir)
        if train_cfg.runner.resume:
            resume_path = get_load_path(
                log_root,
                load_run=train_cfg.runner.load_run,
                checkpoint=train_cfg.runner.checkpoint,
            )
            print(f"Loading model from: {resume_path}")
            runner.load(resume_path)
        return runner, train_cfg


def get_load_path(root, load_run=-1, checkpoint=-1):
    """Latest-run / latest-checkpoint resolution (reference helpers.py:103-125)."""
    import os

    try:
        runs = sorted(os.listdir(root))
        if "exported" in runs:
            runs.remove("exported")
        last_run = os.path.join(root, runs[-1])
    except Exception:
        raise ValueError(f"No runs in this directory: {root}")
    if load_run == -1:
        load_run = last_run
    else:
        load_run = os.path.join(root, load_run)
    if checkpoint == -1:
        models = [f for f in os.listdir(load_run) if "model" in f]
        models.sort(key=lambda m: f"{m:0>15}")
        model = models[-1]
    else:
        model = f"model_{checkpoint}.ckpt"
    return os.path.join(load_run, model)


def update_cfg_from_args(env_cfg, cfg_train, args):
    """CLI override whitelist (reference helpers.py:127-150)."""
    if env_cfg is not None:
        if getattr(args, "num_envs", None) is not None:
            env_cfg.env.num_envs = args.num_envs
    if cfg_train is not None:
        if getattr(args, "seed", None) is not None:
            cfg_train.seed = args.seed
        if getattr(args, "max_iterations", None) is not None:
            cfg_train.runner.max_iterations = args.max_iterations
        if getattr(args, "resume", False):
            cfg_train.runner.resume = args.resume
        if getattr(args, "experiment_name", None) is not None:
            cfg_train.runner.experiment_name = args.experiment_name
        if getattr(args, "run_name", None) is not None:
            cfg_train.runner.run_name = args.run_name
        if getattr(args, "load_run", None) is not None:
            cfg_train.runner.load_run = args.load_run
        if getattr(args, "checkpoint", None) is not None:
            cfg_train.runner.checkpoint = args.checkpoint


task_registry = TaskRegistry()
