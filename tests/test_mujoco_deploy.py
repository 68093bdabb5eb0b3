"""End-to-end sim-to-sim: the reference's *trained* parkour policy, imported
into our bundle format, drives the MuJoCo Go2 through our numpy controller —
the parity-oracle pipeline of SURVEY §3.4 / BASELINE.md.
"""
import os

import numpy as np
import pytest

MODEL_DIR = "/root/reference/deploy/networks/go2/parkour_v12_ft_iii"
SCENE = "/root/reference/resources/robots/go2/mujoco/scene_flat.xml"


@pytest.mark.skipif(
    not (os.path.isdir(MODEL_DIR) and os.path.exists(SCENE)),
    reason="reference assets unavailable",
)
def test_reference_policy_walks_in_mujoco(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy.import_torchscript import import_torchscript_policy
    from legged_gym_custom_tpu.deploy import mujoco_runner

    bundle = import_torchscript_policy(MODEL_DIR, str(tmp_path / "ref.npz"))
    cfg = ConfigParser(
        os.path.join(os.path.dirname(__file__), "..", "deploy_configs", "go2.yaml")
    )
    cfg.xml_path = SCENE

    cmd = np.array([0.8, 0.0, 0.0], np.float32)  # forward command
    traj = mujoco_runner.run(
        cfg, bundle, duration_s=4.0, viewer=False, realtime=False,
        command_source=lambda: cmd,
    )
    qpos = traj["qpos"]
    # stayed upright the whole run
    assert qpos[:, 2].min() > 0.12, f"fell: min z={qpos[:, 2].min():.3f}"
    # walked forward a meaningful distance under a 0.8*1.2 m/s command
    dx = qpos[-1, 0] - qpos[0, 0]
    assert dx > 1.0, f"only advanced {dx:.2f} m in 4 s"
    # limited lateral drift
    assert abs(qpos[-1, 1] - qpos[0, 1]) < 1.0
