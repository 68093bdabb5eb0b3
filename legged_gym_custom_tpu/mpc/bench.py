"""MPC benchmark: batched solves/s and p99 solve latency vs the 50 Hz budget
(BASELINE.md north-star metrics: >=4096 solves/s/host, p99 < 20 ms).

Run: python -m legged_gym_custom_tpu.mpc.bench [--batch 512] [--samples 32]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_bench(batch=512, samples=32, horizon=12, iters=20, warmup=3):
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.mpc import MPPI, MPPIConfig

    env_cfg, _ = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = batch
    env_cfg.noise.add_noise = False
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    state, obs = env.reset_all(jax.random.PRNGKey(0))

    mpc = MPPI(env, MPPIConfig(horizon=horizon, num_samples=samples))
    ms = mpc.init_state(batch)
    solve = jax.jit(mpc.solve)
    key = jax.random.PRNGKey(1)

    for _ in range(warmup):
        a, ms, cost = solve(ms, state.physics, state.dr, state.commands, key)
    jax.block_until_ready(cost)

    lat = []
    for i in range(iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        a, ms, cost = solve(ms, state.physics, state.dr, state.commands, k)
        jax.block_until_ready(a)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    solves_per_s = batch / lat.mean()

    # Device-side solve latency, excluding the host<->device round trip: on
    # this host the TPU is tunneled and a TRIVIAL dispatch (x+1) costs
    # ~25 ms wall p50, so wall latency measures the tunnel, not the solver.
    # Amortize a chain of solves inside ONE dispatch (lax.scan): wall/N is
    # the true per-solve device time — what a locally-attached deploy chip
    # (the BASELINE target hardware) would see, plus its own ~us dispatch.
    n_chain = 50

    @jax.jit
    def chained(ms0, key0):
        def body(carry, _):
            ms_c, k_c = carry
            k_c, k_it = jax.random.split(k_c)
            a, ms_c, cost = mpc.solve(
                ms_c, state.physics, state.dr, state.commands, k_it
            )
            return (ms_c, k_c), a

        (_, _), acts = jax.lax.scan(body, (ms0, key0), None, length=n_chain)
        return acts

    jax.block_until_ready(chained(ms, key))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(chained(ms, key))
    per_solve_device_ms = (time.perf_counter() - t0) / n_chain * 1e3

    # measure the tunnel floor for the caveat
    x = jnp.ones(8)
    jax.block_until_ready(x + 1)
    t0 = time.perf_counter()
    jax.block_until_ready(x + 1)
    trivial_rtt_ms = (time.perf_counter() - t0) * 1e3

    return {
        "metric": "go2_mpc_solves_per_s",
        "value": round(float(solves_per_s), 1),
        "unit": f"MPPI solves/s (B={batch}, K={samples}, H={horizon})",
        "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "p99_latency_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "device_solve_ms": round(per_solve_device_ms, 3),
        "trivial_dispatch_rtt_ms": round(trivial_rtt_ms, 2),
        "within_50hz_budget": bool(np.percentile(lat, 99) < 0.020),
        "device_within_50hz_budget": bool(per_solve_device_ms < 20.0),
        "rollouts_per_s": round(float(batch * samples / lat.mean()), 1),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--horizon", type=int, default=12)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    print(json.dumps(run_bench(args.batch, args.samples, args.horizon, args.iters)))
