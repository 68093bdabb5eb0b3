"""Proof-of-work: the parkour flagship, end-to-end by THIS framework.

A go2_parkour policy trained on the TPU (PPO+ROA+scan encoder over the gap
curriculum, 5000 iterations — the reference's signature capability,
go2_parkour_config.py:7,257) must:

  1. show learning receipts: terrain curriculum promoted (Episode/terrain_level
     rose) and jump-zone rewards fired (reward_curve.json),
  2. clear real gaps in the MuJoCo oracle: deployed through the numpy
     controller over a scene exported from OUR terrain generator
     (deploy/scene_gen.py) with the fake-scan replay trace the policy itself
     recorded (play.py --record_scan), the robot advances past multiple gap
     obstacles without falling in (reference deploy flow
     deploy_base.py:59-143 + deploy_mujoco.py:86-127).

Artifacts under trained/go2_parkour_tpu_r3/ (committed):
  policy_bundle.npz   exported deploy bundle
  model_*.ckpt        orbax checkpoint
  reward_curve.json   TB scalars from the training run
  SCAN_r3.txt         self-captured jump-synced scandot replay trace
  parkour_scene.xml   generated MuJoCo gap-course scene (+ .hfield.npy)
"""
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "trained", "go2_parkour_tpu_r3")
BUNDLE = os.path.join(ART, "policy_bundle.npz")
SCENE = os.path.join(ART, "parkour_scene.xml")
SCAN = os.path.join(ART, "SCAN_r3.txt")
CURVE = os.path.join(ART, "reward_curve.json")

needs_artifacts = pytest.mark.skipif(
    not os.path.exists(BUNDLE), reason="parkour trained artifacts unavailable"
)


@needs_artifacts
def test_parkour_training_receipts():
    """Curriculum promoted and jump rewards fired during training."""
    with open(CURVE) as f:
        curves = json.load(f)

    lvl = curves["Episode/terrain_level"]
    # starts near 0 after the initial demotion wave; must end meaningfully up
    assert lvl[-1][1] > 1.0, f"terrain_level never rose: final {lvl[-1]}"
    assert lvl[-1][1] > lvl[0][1], f"terrain_level fell: {lvl[0]} -> {lvl[-1]}"

    rew = curves["Train/mean_reward"]
    assert rew[-1][1] > 10.0, f"mean reward plateaued low: {rew[-1]}"

    jz = curves["Episode/rew_jump_zone_forward_vel"]
    assert max(v for _, v in jz) > 0.01, "jump-zone reward never fired"


@needs_artifacts
def test_parkour_policy_clears_gaps_in_mujoco():
    """Deploy over the generated gap course with self-captured scan replay."""
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy import mujoco_runner

    cfg = ConfigParser(
        os.path.join(REPO, "deploy_configs", "go2_parkour_tpu.yaml"), root_dir=REPO
    )

    cmd = np.array([1.0, 0.0, 0.0], np.float32)

    # scripted operator: arm the fake-scan replay as the robot approaches the
    # first gap (the human presses RB in the reference deploy loop)
    def operator(controller, mj_data):
        if mj_data.qpos[0] > 1.0:
            controller.jump_button_pressed = True

    traj = mujoco_runner.run(
        cfg,
        BUNDLE,
        duration_s=10.0,
        viewer=False,
        realtime=False,
        command_source=lambda: cmd,
        scan_trace_path=SCAN if os.path.exists(SCAN) else None,
        on_control_step=operator,
    )
    qpos = traj["qpos"]
    # never fell into a gap (bottoms at -2 m; base below -0.5 means it's in)
    assert qpos[:, 2].min() > -0.5, f"fell into a gap: min z={qpos[:, 2].min():.3f}"
    # crossed the first gap: course x_positions[0]=5 with spawn at course
    # x=2 -> the far edge of gap 1 is ~3.2 m of world-frame progress
    dx = qpos[-1, 0] - qpos[0, 0]
    assert dx > 3.5, f"did not cross the first gap: advanced {dx:.2f} m"
