"""Mesh-sharding overhead benchmark (BASELINE.md north-star: >=80%
multi-device scaling efficiency).

True weak scaling (fixed per-device batch, growing mesh) needs real chips:
on a VIRTUAL mesh all "devices" share the same silicon, so an 8-device run
does 8x the compute on constant hardware and the ratio measures core
oversubscription, not scaling. What a virtual mesh CAN measure honestly is
the *sharding overhead*: run the SAME total env batch on 1 device vs sharded
across 8 virtual devices (shard_map collection + per-device minibatching +
psum gradient reduction). Efficiency = fps(8 dev) / fps(1 dev) — the
fraction of throughput surviving the full multi-chip code path, an upper
bound on what the communication machinery costs at ICI-free latencies.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m legged_gym_custom_tpu.scripts.bench_scaling --devices 8 \
            --total_envs 512

`bench.py` at the repo root orchestrates the 1-vs-8 pair in subprocesses and
emits the combined efficiency line.
"""
from __future__ import annotations

import argparse
import json
import time

import jax


def run(devices: int, total_envs: int, iters: int) -> dict:
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.parallel.mesh import make_mesh
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    avail = jax.devices()
    assert len(avail) >= devices, f"need {devices} devices, have {len(avail)}"
    num_envs = total_envs

    env_cfg, train_cfg = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = num_envs
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    mesh = make_mesh(env_cfg.parallel, devices=avail[:devices])
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, mesh=mesh)

    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    state = runner._shard_state(state)

    ts = runner.train_state
    ts, state, obs, metrics, _ = runner._train_it[False](ts, state, obs, key)
    jax.block_until_ready(metrics)

    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, state, obs, metrics, _ = runner._train_it[False](ts, state, obs, k)
    jax.block_until_ready(metrics)
    dt = time.time() - t0

    fps = iters * runner.num_steps_per_env * num_envs / dt
    return {
        "devices": devices,
        "num_envs": num_envs,
        "iters": iters,
        "fps": round(fps, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--total_envs", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    print(json.dumps(run(args.devices, args.total_envs, args.iters)))


if __name__ == "__main__":
    main()
