"""Behavior-clone teacher-assisted jump trajectories into the policy mean.

Second half of the jump-teacher pipeline (`jump_teacher.py` collects the
dataset): regress the deterministic actor mean (the full inference path —
actor MLP + adaptation-latent encoder + scan encoder + estimator input,
exactly `OnPolicyRunner.get_inference_policy`) onto the executed actions of
assisted rollouts that successfully crossed >=0.2 m gaps.  Non-teacher
steps carry the policy's own actions, so they act as a trust region: the
only behavior that moves is the jump window.  This is the reference's
scan-replay-distillation idea (its SCAN_v12 traces exist because
perception-driven jumping needed scripted injection, reference
deploy/README.md) recast as a batched supervised problem on TPU.

The distilled checkpoint keeps the optimizer states of the source
checkpoint, so a subsequent PPO stage (`--task go2_parkour_cliff --resume`)
amplifies the now-nonzero success prior.

Run:
  python -m legged_gym_custom_tpu.scripts.jump_distill \
      --dataset logs/jump_dataset.npz \
      --ckpt trained/go2_parkour_tpu_r5/model_final.ckpt \
      --out logs/go2_parkour/distill_r5/model_0.ckpt
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser("jump_distill")
    ap.add_argument("--dataset", default="logs/jump_dataset.npz")
    ap.add_argument("--ckpt", default="trained/go2_parkour_tpu_r5/model_final.ckpt")
    ap.add_argument("--task", default="go2_parkour_cliff")
    ap.add_argument("--out", default="logs/go2_parkour/distill_r5/model_0.ckpt")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--teach_weight", type=float, default=4.0,
                    help="loss weight on teacher-override steps")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    ds = np.load(args.dataset)
    N = ds["obs"].shape[0]
    print(f"dataset: {N} samples, {int(ds['teach'].sum())} teacher steps, "
          f"widths {sorted(set(ds['width'].tolist()))}")

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    env_cfg.env.num_envs = 8
    env_cfg.terrain.num_rows = 1
    env_cfg.terrain.num_cols = 1
    env_cfg.terrain.curriculum = False
    env, _ = task_registry.make_env(name=args.task, args=None, env_cfg=env_cfg)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    runner.load(args.ckpt)
    nets = runner.nets
    params0 = runner.train_state.params

    obs_a = jnp.asarray(ds["obs"])
    priv_a = jnp.asarray(ds["priv"])
    scan_a = jnp.asarray(ds["scan"])
    act_a = jnp.asarray(ds["act"])
    w_a = jnp.where(jnp.asarray(ds["teach"]), args.teach_weight, 1.0)
    w_a = w_a / w_a.mean()

    tx = optax.adam(args.lr)
    opt_state = tx.init(params0)

    def loss_fn(params, idx):
        obs, priv, scan = obs_a[idx], priv_a[idx], scan_a[idx]
        est = nets.estimate(params, obs)
        mean = nets.action_mean(params, obs, priv, est, scan, True)
        per = jnp.mean((mean - act_a[idx]) ** 2, axis=-1)
        return jnp.mean(per * w_a[idx])

    @jax.jit
    def train_step(params, opt_state, key):
        idx = jax.random.randint(key, (args.batch,), 0, N)
        loss, grads = jax.value_and_grad(loss_fn)(params, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = params0
    key = jax.random.PRNGKey(args.seed)
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i}: bc_loss {float(loss):.5f}")

    runner.train_state = runner.train_state.replace(params=params)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    runner.save(args.out)
    print(f"saved distilled checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
