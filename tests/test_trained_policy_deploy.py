"""Proof-of-work: a policy trained END-TO-END BY THIS FRAMEWORK (PPO+ROA on
the TPU physics engine, task `go2`, 3000 iterations at ~145k steps/s on one
TPU v5e chip) walks in the MuJoCo deploy oracle through the numpy controller.

This is the full reference pipeline (train.py -> export -> deploy_mujoco.py,
reference scripts/train.py:41-48 + deploy/deploy_mujoco/deploy_mujoco.py:86-127)
executed with OUR training stack instead of Isaac Gym + rsl_rl.  The companion
test (test_mujoco_deploy.py) runs the *reference's* trained network through the
same controller; this one closes the loop on our own training.

Artifacts under trained/go2_tpu_r2/:
  policy_bundle.npz  — exported via deploy/export.py from model_3000.ckpt
  model_3000.ckpt    — the orbax checkpoint (params + all 3 optimizer states)
  reward_curve.json  — TB scalars: mean reward 0 -> 41.9, episode length
                       23 -> 991/1000, rew_tracking_lin_vel 0.03 -> 1.23
                       (scale ceiling 1.5), phase_contact_match 0 -> 0.84

The deploy config is deploy_configs/go2_tpu.yaml: identical to the reference
go2.yaml except the gait-phase block (period 0.45, trot pairing FR+BL / FL+BR)
which must match the *training* config (envs/go2_config.py:18-22) — the
reference's own yaml carries the different 0.35-period phase block its older
shipped policies were trained with (reference go2_config.py:18-22 vs
deploy/configs/go2.yaml:21-25 drift, noted in SURVEY §5 Config).
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLE = os.path.join(REPO, "trained", "go2_tpu_r2", "policy_bundle.npz")
SCENE = "/root/reference/resources/robots/go2/mujoco/scene_flat.xml"


@pytest.mark.skipif(
    not (os.path.exists(BUNDLE) and os.path.exists(SCENE)),
    reason="trained bundle or reference MuJoCo scene unavailable",
)
def test_tpu_trained_policy_walks_in_mujoco():
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy import mujoco_runner

    cfg = ConfigParser(os.path.join(REPO, "deploy_configs", "go2_tpu.yaml"))
    cfg.xml_path = SCENE

    cmd = np.array([0.8, 0.0, 0.0], np.float32)  # forward command
    traj = mujoco_runner.run(
        cfg, BUNDLE, duration_s=8.0, viewer=False, realtime=False,
        command_source=lambda: cmd,
    )
    qpos = traj["qpos"]
    # stayed upright the whole 8 s (default standing height is ~0.3 m)
    assert qpos[:, 2].min() > 0.15, f"fell: min z={qpos[:, 2].min():.3f}"
    # walked a meaningful distance forward (measured 1.98 m at commit time;
    # generous floor so contact-model tweaks don't flake the test)
    dx = qpos[-1, 0] - qpos[0, 0]
    assert dx > 1.2, f"only advanced {dx:.2f} m in 8 s"
    # steady-state progress in the second half too (not a lunge-and-stand)
    half = len(qpos) // 2
    dx_late = qpos[-1, 0] - qpos[half, 0]
    assert dx_late > 0.5, f"stalled after startup: late dx={dx_late:.2f} m"
    # bounded lateral drift
    assert abs(qpos[-1, 1] - qpos[0, 1]) < 1.5


@pytest.mark.skipif(
    not os.path.exists(BUNDLE), reason="trained bundle unavailable"
)
def test_trained_bundle_loads_and_reward_curve_improved():
    import json

    from legged_gym_custom_tpu.deploy.export import load_policy_bundle

    bundle = load_policy_bundle(BUNDLE)
    for mod in ("policy", "adaptation_module", "estimator", "scan_encoder"):
        assert mod in bundle and len(bundle[mod]) >= 2
    # actor input: 572 obs + 20 latent + 32 scan latent + 3 estimated = 627
    assert bundle["policy"][0]["kernel"].shape[0] == 627

    with open(os.path.join(REPO, "trained", "go2_tpu_r2", "reward_curve.json")) as f:
        curve = json.load(f)
    rew = curve["Train/mean_reward"]
    track = curve["Episode/rew_tracking_lin_vel"]
    assert rew[-1][1] > 35.0 and rew[-1][1] > 50 * max(rew[0][1], 0.01)
    assert track[-1][1] > 1.0  # ceiling is the 1.5 reward scale
