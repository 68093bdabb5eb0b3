"""Proof-of-work: training THROUGH the fused Pallas control-step kernel.

Round 2 shipped the kernel with an 826k steps/s bench but nothing had ever
been trained through it. trained/go2_tpu_r3_fused/ is a full `go2` training
run (3000 iterations, ~300M env steps) executed with the kernel active
(LGC_FUSED_KERNEL=auto on TPU): it reaches the same reward ceiling as the
round-2 XLA-path run (41.3 vs 41.9, peak 43.3) while training at
550k-976k steps/s (vs ~145k) — the end-to-end evidence that the kernel's
numerics learn, complementing the hardware parity receipt
(docs/fused_kernel_receipt_r3.json).
"""
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "trained", "go2_tpu_r3_fused")
BUNDLE = os.path.join(ART, "policy_bundle.npz")
CURVE = os.path.join(ART, "reward_curve.json")

needs_artifacts = pytest.mark.skipif(
    not os.path.exists(BUNDLE), reason="fused-trained artifacts unavailable"
)


@needs_artifacts
def test_fused_training_reaches_ceiling_at_kernel_speed():
    with open(CURVE) as f:
        curves = json.load(f)
    rew = curves["Train/mean_reward"]
    assert rew[-1][1] > 38.0, f"fused-path training fell short: {rew[-1]}"

    fps = [v for it, v in curves["Perf/total_fps"] if it > 100]
    med = sorted(fps)[len(fps) // 2]
    # the XLA-path run trained at ~145k; the kernel path must be >3x that
    assert med > 400_000, f"median training fps {med} — kernel path inactive?"


@needs_artifacts
def test_fused_trained_policy_walks_in_mujoco():
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy import mujoco_runner

    cfg = ConfigParser(
        os.path.join(REPO, "deploy_configs", "go2_tpu.yaml"), root_dir=REPO
    )
    cmd = np.array([0.8, 0.0, 0.0], np.float32)
    traj = mujoco_runner.run(
        cfg, BUNDLE, duration_s=8.0, viewer=False, realtime=False,
        command_source=lambda: cmd,
    )
    qpos = traj["qpos"]
    assert qpos[:, 2].min() > 0.15, f"fell: min z={qpos[:, 2].min():.3f}"
    # measured 3.94 m at commit time (2x the round-2 XLA-trained policy)
    dx = qpos[-1, 0] - qpos[0, 0]
    assert dx > 1.5, f"only advanced {dx:.2f} m in 8 s"
