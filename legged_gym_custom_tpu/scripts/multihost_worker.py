"""Multi-process (DCN-path) training worker: one JAX process per host.

This is the executable form of SURVEY §2.5 (c): every host runs this same
program; `jax.distributed` assembles one global mesh from all processes'
devices, each host constructs/owns its `B_global / num_hosts` env shard, the
PPO update runs under `shard_map` over the global 'data' axis (gradient
all-reduces ride ICI within a host and DCN across), and orbax checkpoints are
written collectively with host-sharded arrays.

On real multi-host TPU slices JAX populates coordinator/process env vars from
the TPU metadata, so plain `python -m ...multihost_worker --task go2` per host
suffices.  For a single-machine simulation (the verification mechanism SURVEY
§4 prescribes), launch N copies with --coordinator/--num_processes/
--process_id and CPU devices per process via
`XLA_FLAGS=--xla_force_host_platform_device_count=K` — exercised end-to-end
by tests/test_multiprocess.py, including a cross-process checkpoint
round-trip.

Emits one JSON result line (fps, losses, checkpoint path) from the primary
process.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser("legged_gym_custom_tpu multihost worker")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on real TPU slices)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--task", default="go2")
    p.add_argument("--num_envs", type=int, default=64, help="GLOBAL env count")
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--warmup", type=int, default=0,
                   help="untimed iterations first (compile excluded from fps)")
    p.add_argument("--ckpt_dir", default=None,
                   help="shared dir: save a collective checkpoint, reload it, "
                        "and verify the restored iteration counter")
    p.add_argument("--result_json", default=None)
    args = p.parse_args(argv)

    import legged_gym_custom_tpu  # noqa: F401  (platform escape hatch first)
    import jax

    # Cross-process CPU collectives for the local DCN simulation path.  Must
    # be set BEFORE the backend initializes (so no jax.devices() here); the
    # option only affects the CPU client, so it is safe on real TPU slices.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from legged_gym_custom_tpu.parallel import multihost

    multihost.init_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    import numpy as np

    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = args.num_envs
    train_cfg.runner.max_iterations = args.iterations
    env = task_registry.get_task_class(args.task)(
        env_cfg, env_cfg.asset.file, name=args.task
    )
    mesh = multihost.global_mesh()
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)

    if args.warmup:
        runner.learn(args.warmup)
    t0 = time.time()
    metrics = runner.learn(args.iterations)
    dt = time.time() - t0
    fps = args.iterations * runner.num_steps_per_env * args.num_envs / dt

    ckpt_path = None
    restored_iteration = None
    if args.ckpt_dir:
        ckpt_path = os.path.join(args.ckpt_dir, "multihost_model.ckpt")
        runner.save(ckpt_path)  # collective: every process participates
        runner.current_learning_iteration = 0  # clobber, then prove restore
        runner.load(ckpt_path)
        restored_iteration = int(runner.current_learning_iteration)

    if multihost.is_primary():
        result = {
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "num_envs": args.num_envs,
            "iterations": args.iterations,
            "fps": round(float(fps), 1),
            # last-iteration phase split, for the comm-budget breakdown
            # (collection = env scan + GAE; learning = minibatched update
            # with the cross-process gradient pmean)
            "collection_s": round(float(runner._collection_time), 3),
            "learning_s": round(float(runner._learn_time), 3),
            "value_loss": float(np.asarray(metrics.get("value_loss", np.nan))),
            "ckpt": ckpt_path,
            "restored_iteration": restored_iteration,
        }
        line = json.dumps(result)
        print(line, flush=True)
        if args.result_json:
            with open(args.result_json, "w") as f:
                f.write(line)


if __name__ == "__main__":
    main()
    sys.exit(0)
