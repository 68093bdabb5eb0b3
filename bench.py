"""Benchmark: Go2 PPO training throughput (env steps/s through full
rollout+update iterations, the reference's `Perf/total_fps` metric,
on_policy_runner.py:219,230) at the reference scale: 4096 envs x 24 steps.

Baseline: the reference publishes no numbers (BASELINE.md); 100k steps/s is
the typical single-GPU Isaac Gym figure for 4096-env Go2 rough-terrain
training, used as the comparison denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import numpy as np

BASELINE_FPS = 100_000.0


def main():
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    num_envs = 4096 if on_accel else 64
    iters = 5 if on_accel else 2

    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    env_cfg, train_cfg = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = num_envs
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=on_accel)

    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    state = runner._shard_state(state)

    ts = runner.train_state
    t_compile = time.time()
    ts, state, obs, metrics, logs = runner._train_it[False](ts, state, obs, key)
    jax.block_until_ready(metrics)
    print(f"# compile+first-iter: {time.time() - t_compile:.1f}s", file=sys.stderr)

    t0 = time.time()
    for i in range(iters):
        key, k = jax.random.split(key)
        ts, state, obs, metrics, logs = runner._train_it[False](ts, state, obs, k)
    jax.block_until_ready(metrics)
    dt = time.time() - t0

    steps = iters * runner.num_steps_per_env * num_envs
    fps = steps / dt
    print(
        f"# {platform}: {num_envs} envs, {iters} iters, {dt:.2f}s -> {fps:,.0f} steps/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "go2_train_total_fps",
                "value": round(fps, 1),
                "unit": "env_steps/s (4096 envs, rollout+PPO update)",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
