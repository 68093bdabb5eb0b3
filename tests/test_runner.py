"""Runner-level tests: checkpoint save/load/resume, inference policy, CLI."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_runner(tmp_path_factory):
    from legged_gym_custom_tpu.envs import task_registry
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    env_cfg, train_cfg = task_registry.get_cfgs("go2")
    env_cfg.env.num_envs = 4
    train_cfg.runner.num_steps_per_env = 4
    train_cfg.runner.save_interval = 1
    env = task_registry.get_task_class("go2")(env_cfg, env_cfg.asset.file, name="go2")
    log_dir = str(tmp_path_factory.mktemp("logs"))
    runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir, use_mesh=False)
    return runner, env, train_cfg, log_dir


def test_learn_saves_and_resumes(tiny_runner):
    runner, env, train_cfg, log_dir = tiny_runner
    runner.learn(2)
    files = sorted(os.listdir(log_dir))
    assert any(f.startswith("model_") for f in files), files
    ckpt = os.path.join(log_dir, "model_2.ckpt")
    assert os.path.exists(ckpt)

    # fresh runner loads the checkpoint: params identical, iteration restored
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    runner2 = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    before = jax.tree.leaves(runner2.train_state.params["actor"])[0]
    runner2.load(ckpt)
    after = runner2.train_state.params["actor"]
    want = runner.train_state.params["actor"]
    for a, b in zip(jax.tree.leaves(after), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner2.current_learning_iteration == 2
    # MID-RUN checkpoints must carry the live iteration too (a stale counter
    # once made every mid-run ckpt claim iter=0 and resume from scratch):
    # model_1.ckpt is written right after iteration 1 completes
    runner3 = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    runner3.load(os.path.join(log_dir, "model_1.ckpt"))
    assert runner3.current_learning_iteration == 2
    # optimizer state restored too (fixes reference quirk)
    a_leaves = jax.tree.leaves(runner2.train_state.opt_state_est)
    b_leaves = jax.tree.leaves(runner.train_state.opt_state_est)
    assert len(a_leaves) == len(b_leaves)
    # training continues from the checkpoint without error
    runner2.learn(1)


def test_inference_policy_deterministic(tiny_runner):
    runner, env, train_cfg, log_dir = tiny_runner
    policy = runner.get_inference_policy()
    key = jax.random.PRNGKey(0)
    state, obs = env.reset_all(key)
    a1 = policy(obs, adaptation_mode=True)
    a2 = policy(obs, adaptation_mode=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (4, 12)
    a3 = policy(obs, adaptation_mode=False)
    assert np.isfinite(np.asarray(a3)).all()


def test_get_load_path_resolution(tmp_path):
    from legged_gym_custom_tpu.utils.task_registry import get_load_path

    root = tmp_path / "exp"
    (root / "Jan01_00-00-00_run1").mkdir(parents=True)
    (root / "Jan02_00-00-00_run2").mkdir()
    for it in (0, 50, 100):
        (root / "Jan02_00-00-00_run2" / f"model_{it}.ckpt").write_bytes(b"x")
    path = get_load_path(str(root))
    assert path.endswith("Jan02_00-00-00_run2/model_100.ckpt")
    path = get_load_path(str(root), checkpoint=50)
    assert path.endswith("model_50.ckpt")


def test_cli_args_parse():
    from legged_gym_custom_tpu.scripts.train import get_args

    args = get_args(["--task", "go2", "--num_envs", "8", "--max_iterations", "3",
                     "--seed", "7"])
    assert args.task == "go2" and args.num_envs == 8
    from legged_gym_custom_tpu.utils.task_registry import update_cfg_from_args
    from legged_gym_custom_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs("go2")
    update_cfg_from_args(env_cfg, train_cfg, args)
    assert env_cfg.env.num_envs == 8
    assert train_cfg.runner.max_iterations == 3
    assert train_cfg.seed == 7
