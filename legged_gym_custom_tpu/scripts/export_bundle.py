"""Export a deploy bundle from a checkpoint WITHOUT rolling the env.

scripts/play.py exports as part of its eval loop, which jit-compiles the
env step (minutes on the tunneled chip for parkour terrains).  Packaging
only needs the network parameters, so this tool builds the env object (for
network dimensions), restores the checkpoint, and writes the .npz bundle.

Run: python -m legged_gym_custom_tpu.scripts.export_bundle \
        --task go2_parkour_cliff --load_run <run> [--checkpoint N] \
        --out trained/go2_parkour_tpu_r5/policy_bundle.npz
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--load_run", default=None)
    ap.add_argument("--checkpoint", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ.setdefault("LGC_FORCE_PLATFORM", "cpu")
    from legged_gym_custom_tpu import LEGGED_GYM_TPU_ROOT_DIR
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner
    from legged_gym_custom_tpu.utils.task_registry import get_load_path
    from legged_gym_custom_tpu.deploy.export import export_policy_bundle

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = 1
    env_cfg.terrain.num_rows = 1
    env_cfg.terrain.num_cols = 1
    env_cfg.terrain.curriculum = False
    env = task_registry.get_task_class(args.task)(
        env_cfg, env_cfg.asset.file, name=args.task
    )
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    log_root = os.path.join(
        LEGGED_GYM_TPU_ROOT_DIR, "logs", train_cfg.runner.experiment_name
    )
    path = get_load_path(
        log_root, load_run=args.load_run or -1,
        checkpoint=args.checkpoint if args.checkpoint is not None else -1,
    )
    runner.load(path)
    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    os.makedirs(out_dir, exist_ok=True)
    export_policy_bundle(runner.nets, runner.train_state.params, out_dir)
    # export_policy_bundle writes <dir>/policy_bundle.npz; rename if asked
    default = os.path.join(out_dir, "policy_bundle.npz")
    if os.path.abspath(args.out) != default and os.path.exists(default):
        os.replace(default, args.out)
    print(f"exported {path} -> {args.out}")


if __name__ == "__main__":
    main()
