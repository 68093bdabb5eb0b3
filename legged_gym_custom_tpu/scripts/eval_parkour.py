"""Deterministic parkour capability evaluation (round-5 acceptance tool).

Rolls the deterministic inference policy over a parkour course and reports,
per env: course-x reached (the env's `max_x` progress tracker), gaps/
composites crossed, flight-phase statistics, and termination causes.  Used
for the VERDICT r4 "Done" bar: deterministic policy crosses >=3 gaps of
>=0.25 m with flight phases (reference ships this capability as
deploy/networks/go2/parkour_v12_ft_iii).

Modes:
  --course finetune   the jump-finetune composite course (default)
  --course gaps --gap_width 0.3   a plain-gap course: 6 gaps of the given
                      width at x = 5, 8.5, ... (the generator's gap layout)

Run: python -m legged_gym_custom_tpu.scripts.eval_parkour \
        --task go2_parkour_commit --load_run <run> --checkpoint N \
        [--num_envs 128] [--steps 600] [--course gaps --gap_width 0.3]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("eval_parkour")
    p.add_argument("--task", default="go2_parkour_commit")
    p.add_argument("--load_run", default=None)
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--num_envs", type=int, default=128)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--course", choices=["finetune", "gaps"], default="finetune")
    p.add_argument("--gap_width", type=float, default=0.3)
    p.add_argument("--n_gaps", type=int, default=6)
    p.add_argument("--command_vx", type=float, default=1.2)
    p.add_argument("--stochastic", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--ckpt_path", default=None,
                   help="load this checkpoint path directly (bypasses the "
                        "logs-dir run/checkpoint resolution)")
    return p.parse_args(argv)


def main(args):
    import jax
    import jax.numpy as jnp

    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = args.num_envs
    env_cfg.terrain.num_rows = 1
    env_cfg.terrain.num_cols = 1
    env_cfg.terrain.curriculum = False
    env_cfg.noise.add_noise = False
    for k in [
        "randomize_friction", "push_robots", "randomize_base_mass",
        "randomize_center_of_mass", "randomize_kp_kd",
    ]:
        setattr(env_cfg.domain_rand, k, False)
    # honest evaluation: spawn at the course start, not the bootcamp slots
    env_cfg.init_state.rand_x_offsets = None
    env_cfg.init_state.rand_vx_range = None
    # no stall termination at eval: measure balking, don't hide it
    if hasattr(env_cfg, "termination"):
        env_cfg.termination.stall_time_s = 0.0

    if args.course == "gaps":
        xs = [5.0 + 3.5 * k for k in range(args.n_gaps)]
        env_cfg.terrain.parkour_kwargs = dict(
            env_cfg.terrain.parkour_kwargs,
            x_positions=xs,
            y_positions=[0.0] * args.n_gaps,
            obstacle_heights=[-2.0] * args.n_gaps,
            obstacle_lengths=[args.gap_width] * args.n_gaps,
        )

    pk = env_cfg.terrain.parkour_kwargs
    far_edges = np.asarray(pk["x_positions"]) + np.asarray(pk["obstacle_lengths"])
    is_gap = np.asarray(pk["obstacle_heights"]) < 0.0

    env, _ = task_registry.make_env(name=args.task, args=None, env_cfg=env_cfg)
    train_cfg.runner.resume = True
    if args.load_run:
        train_cfg.runner.load_run = args.load_run
    if args.checkpoint is not None:
        train_cfg.runner.checkpoint = args.checkpoint
    from legged_gym_custom_tpu.utils.task_registry import get_load_path
    import os

    from legged_gym_custom_tpu import LEGGED_GYM_TPU_ROOT_DIR

    if args.ckpt_path:
        path = args.ckpt_path
    else:
        log_root = os.path.join(
            LEGGED_GYM_TPU_ROOT_DIR, "logs", train_cfg.runner.experiment_name
        )
        path = get_load_path(
            log_root, load_run=train_cfg.runner.load_run or -1,
            checkpoint=train_cfg.runner.checkpoint
            if train_cfg.runner.checkpoint is not None else -1,
        )
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    runner.load(path)
    print(f"loaded {path}")
    if args.stochastic:
        policy = runner.get_inference_policy(stochastic=True)
    else:
        policy = runner.get_inference_policy()

    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    B = args.num_envs
    step = jax.jit(env.step)
    cmd = jnp.tile(
        jnp.array([args.command_vx, 0.0, 0.0, 0.0], jnp.float32), (B, 1)
    )

    alive = np.ones(B, bool)
    best_x = np.full(B, -np.inf)
    air_run = np.zeros(B, int)
    max_air = np.zeros(B, int)
    flight_count = np.zeros(B, int)  # airborne runs >= 3 steps
    skey = jax.random.PRNGKey(7)
    for i in range(args.steps):
        state = state.replace(commands=cmd)
        if args.stochastic:
            skey, k = jax.random.split(skey)
            actions = policy(obs, adaptation_mode=True, key=k)
        else:
            actions = policy(obs, adaptation_mode=True)
        state, obs, rew, done, info = step(state, actions)
        d = np.asarray(done)
        rel = np.asarray(state.max_x - state.env_origins[:, 0])
        best_x = np.where(alive, np.maximum(best_x, rel), best_x)
        contact = np.asarray(state.last_contacts).any(axis=1)
        airborne = (~contact) & alive
        ended_flight = (air_run >= 3) & ~airborne
        flight_count += ended_flight.astype(int)
        air_run = np.where(airborne, air_run + 1, 0)
        max_air = np.maximum(max_air, air_run)
        alive &= ~d
        if not alive.any():
            break

    gaps_crossed = (best_x[:, None] > far_edges[None, is_gap] + 0.05).sum(axis=1)
    n_obstacle_groups = None
    if args.course == "finetune":
        comp_far = far_edges[2::3]  # last gap of each composite
        n_obstacle_groups = (best_x[:, None] > comp_far[None, :] + 0.05).sum(axis=1)

    result = {
        "task": args.task,
        "checkpoint": path,
        "course": args.course,
        "gap_width": args.gap_width if args.course == "gaps" else None,
        "num_envs": B,
        "steps": args.steps,
        "stochastic": bool(args.stochastic),
        "survived_frac": round(float(alive.mean()), 3),
        "best_x_p50": round(float(np.percentile(best_x, 50)), 2),
        "best_x_p90": round(float(np.percentile(best_x, 90)), 2),
        "best_x_max": round(float(best_x.max()), 2),
        "gaps_crossed_p50": float(np.percentile(gaps_crossed, 50)),
        "gaps_crossed_p90": float(np.percentile(gaps_crossed, 90)),
        "gaps_crossed_max": int(gaps_crossed.max()),
        "frac_crossed_3plus": round(float((gaps_crossed >= 3).mean()), 3),
        "flight_runs_p50": float(np.percentile(flight_count, 50)),
        "max_airborne_steps": int(max_air.max()),
    }
    if n_obstacle_groups is not None:
        result["composites_crossed_p50"] = float(np.percentile(n_obstacle_groups, 50))
        result["composites_crossed_max"] = int(n_obstacle_groups.max())
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main(get_args())
