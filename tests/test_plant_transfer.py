"""Sim-to-sim transfer acceptance for the round-4 plant (VERDICT r3 #1).

trained/go2_tpu_r4/ is a go2 flat run trained on the full-fidelity plant
(joint damping/armature/frictionloss from go2.xml:9 + stiff overdamped
contact, go2_config.sim) through the fused kernel.  The round-3 policies
walked ~0.25 m/s in MuJoCo vs ~1 m/s in-engine because the training plant
was too compliant; with the fixed plant the exported policy must run in the
MuJoCo oracle at commanded speed — the same bar the reference's shipped
networks meet through this stack (0.75 m/s, docs/architecture.md).

Measured at commit time: 0.767 m/s under a 0.8 m/s command (96% of command;
the round-3 policy managed ~31%).
"""
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "trained", "go2_tpu_r4")
BUNDLE = os.path.join(ART, "policy_bundle.npz")
CURVE = os.path.join(ART, "reward_curve.json")

needs_artifacts = pytest.mark.skipif(
    not os.path.exists(BUNDLE), reason="round-4 artifacts unavailable"
)


@needs_artifacts
def test_full_plant_training_receipt():
    """The run reached the task ceiling at kernel speed ON the full plant
    (armature/damping/frictionloss + stiff contact + substeps=4)."""
    with open(CURVE) as f:
        curves = json.load(f)
    rew = curves["Train/mean_reward"]
    assert rew[-1][1] > 38.0, f"full-plant training fell short: {rew[-1]}"
    fps = [v for it, v in curves["Perf/total_fps"] if it > 100]
    med = sorted(fps)[len(fps) // 2]
    assert med > 300_000, f"median training fps {med} — kernel path inactive?"


@needs_artifacts
def test_policy_transfers_at_speed_to_mujoco():
    """THE round-4 acceptance: MuJoCo forward speed within 30% of the
    commanded/in-engine speed (VERDICT r3 next-round #1)."""
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
    speed = (qpos[-1, 0] - qpos[0, 0]) / 8.0
    # >= 70% of the commanded 0.8 m/s (measured 0.767 at commit time)
    assert speed > 0.56, f"transfer gap: {speed:.3f} m/s vs 0.8 commanded"
    # heading discipline: lateral drift stays small
    assert abs(qpos[-1, 1] - qpos[0, 1]) < 1.0


STICTION_ART = os.path.join(REPO, "trained", "go2_stiction_r5")
STICTION_BUNDLE = os.path.join(STICTION_ART, "policy_bundle.npz")


@pytest.mark.skipif(
    not os.path.exists(STICTION_BUNDLE),
    reason="stiction artifacts unavailable",
)
def test_stiction_policy_transfers_to_mujoco():
    """Round-5: the flat policy retrained on the IMPLICIT-STICTION plant
    (true Coulomb holding torque — engine frictionloss_implicit; MuJoCo
    parity in tests/test_sim_parity.py) keeps command transfer through the
    oracle.  Measured at commit time: 0.666 m/s on a 0.8 m/s command (83%;
    the tanh-plant r4 policy measures 96% — the stiction plant's gain is
    rest-state physics fidelity, not top-speed transfer).  Bar: the same
    >=70% the r4 acceptance uses."""
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy import mujoco_runner

    cfg = ConfigParser(
        os.path.join(REPO, "deploy_configs", "go2_tpu.yaml"), root_dir=REPO
    )
    cmd = np.array([0.8, 0.0, 0.0], np.float32)
    traj = mujoco_runner.run(
        cfg, STICTION_BUNDLE, duration_s=8.0, viewer=False, realtime=False,
        command_source=lambda: cmd,
    )
    qpos = traj["qpos"]
    assert qpos[:, 2].min() > 0.15, f"fell: min z={qpos[:, 2].min():.3f}"
    speed = (qpos[-1, 0] - qpos[0, 0]) / 8.0
    assert speed > 0.56, f"transfer gap: {speed:.3f} m/s vs 0.8 commanded"
    assert abs(qpos[-1, 1] - qpos[0, 1]) < 1.0
