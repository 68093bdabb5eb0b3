"""Proof-of-work: the parkour flagship, end-to-end by THIS framework.

A go2_parkour policy trained on the TPU by this framework — 4,600+ iterations
(~450M env steps) of the reference's two-stage recipe: the gap-curriculum base
task (go2_parkour_config.py:7,257) followed by the jump-finetune stage
(go2_parkour_finetune_config.py) — with committed receipts:

  1. Training receipts (reward_curve.json): the terrain curriculum demotes
     everyone to level 0 in the first ~100 iterations, then re-promotes under
     learning pressure; jump-zone rewards fire and grow through the finetune
     stage.
  2. In-engine crossing: the exported policy, restored from the committed
     checkpoint, crosses multiple real gaps (0.15 m wide, 2 m deep) at speed
     in this framework's own physics engine — the flagship capability run
     entirely on our stack (train -> checkpoint -> restore -> rollout).
  3. Sim-to-sim transfer (MuJoCo oracle): the deploy bundle drives the robot
     upright on the same generated gap course through the numpy controller.
     KNOWN LIMITATION (documented in docs/architecture.md): policies trained
     against our compliant penalty contact walk markedly slower in MuJoCo's
     hard contact than in-engine; the reference's own shipped policy through
     the SAME controller/scene pipeline does 0.75 m/s, isolating the gap to
     training-plant dynamics (contact stiffness + unmodeled joint
     friction/armature), not the deploy stack. Closing it is tracked as
     round-4 work.

Artifacts under trained/go2_parkour_tpu_r3/ (committed):
  policy_bundle.npz    exported deploy bundle (finetune iteration 1050)
  model_final.ckpt     orbax checkpoint (params + all 3 optimizer states)
  reward_curve.json    TB scalars merged across base + finetune runs on a
                       global-iteration axis
  SCAN_r3.txt          self-captured jump-synced scandot replay trace
                       (play.py --record_scan on the finetune course)
  parkour_scene.xml    generated MuJoCo gap-course scene (+ .hfield.npy)
  finetune_scene.xml   generated MuJoCo jump-finetune course scene
"""
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "trained", "go2_parkour_tpu_r3")
BUNDLE = os.path.join(ART, "policy_bundle.npz")
CKPT = os.path.join(ART, "model_final.ckpt")
SCENE = os.path.join(ART, "parkour_scene.xml")
SCAN = os.path.join(ART, "SCAN_r3.txt")
CURVE = os.path.join(ART, "reward_curve.json")

needs_artifacts = pytest.mark.skipif(
    not os.path.exists(BUNDLE), reason="parkour trained artifacts unavailable"
)


@needs_artifacts
def test_parkour_training_receipts():
    """Curriculum re-promoted after the demotion trough; jump rewards fired."""
    with open(CURVE) as f:
        curves = json.load(f)

    lvl = curves["Episode/terrain_level"]
    trough = min(v for it, v in lvl if 50 <= it <= 500)
    assert trough < 0.1, f"no demotion trough (curriculum inactive?): {trough}"
    assert lvl[-1][1] > 0.3, (
        f"terrain_level never re-promoted: trough {trough} -> final {lvl[-1]}"
    )

    rew = curves["Train/mean_reward"]
    assert rew[-1][1] > 30.0, f"mean reward plateaued low: {rew[-1]}"

    assert max(v for _, v in curves["Episode/rew_jump_zone_forward_vel"]) > 0.05
    assert max(v for _, v in curves["Episode/rew_jump_zone_upward_vel"]) > 0.2


@needs_artifacts
def test_parkour_policy_crosses_gaps_in_engine():
    """The committed checkpoint crosses 4+ real gaps in our own engine.

    Course: the parkour generator's gap course at the difficulty band the
    curriculum trained (0.15 m gaps at x = 5, 8.5, 12, 15.5, ... with 2 m
    drops, reference terrain.py:194-245). Restores the checkpoint, rolls the
    deterministic inference policy, and requires the base to pass the fourth
    gap without a termination.
    """
    import jax

    from legged_gym_custom_tpu.envs import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs("go2_parkour")
    env_cfg.env.num_envs = 1
    env_cfg.terrain.num_rows = 1
    env_cfg.terrain.num_cols = 1
    env_cfg.terrain.curriculum = False
    env_cfg.terrain.parkour_kwargs["obstacle_lengths"] = [0.15] * 7
    env_cfg.noise.add_noise = False
    for k in [
        "randomize_friction", "push_robots", "randomize_base_mass",
        "randomize_center_of_mass", "randomize_kp_kd",
    ]:
        setattr(env_cfg.domain_rand, k, False)
    from legged_gym_custom_tpu.rl.runner import OnPolicyRunner

    env, _ = task_registry.make_env(
        name="go2_parkour", args=None, env_cfg=env_cfg
    )
    runner = OnPolicyRunner(env, train_cfg, log_dir=None, use_mesh=False)
    runner.load(CKPT)
    policy = runner.get_inference_policy()

    state, obs = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    max_x, died = 0.0, False
    for i in range(550):
        actions = policy(obs, adaptation_mode=True)
        state, obs, rew, done, info = step(state, actions)
        max_x = max(max_x, float(state.physics.base_pos[0, 0]))
        if bool(done[0]):
            died = True
            break
    # gap 4 is at course x = 15.5; spawn at x = 2 (measured 16.8+ at commit)
    assert not died, f"terminated at x={max_x:.2f}"
    assert max_x > 16.0, f"did not cross the course: max x={max_x:.2f}"


@needs_artifacts
def test_parkour_policy_upright_in_mujoco_oracle():
    """Deploy bundle over the generated gap scene: upright, no gap falls.

    See the module docstring for the known in-engine->MuJoCo speed gap; this
    asserts transfer of balance/stance (and documents forward progress),
    not course completion.
    """
    pytest.importorskip("mujoco")
    from legged_gym_custom_tpu.deploy.config_parser import ConfigParser
    from legged_gym_custom_tpu.deploy import mujoco_runner

    cfg = ConfigParser(
        os.path.join(REPO, "deploy_configs", "go2_parkour_tpu.yaml"), root_dir=REPO
    )
    cmd = np.array([1.2, 0.0, 0.0], np.float32)
    traj = mujoco_runner.run(
        cfg, BUNDLE, duration_s=8.0, viewer=False, realtime=False,
        command_source=lambda: cmd,
    )
    qpos = traj["qpos"]
    assert qpos[:, 2].min() > -0.5, f"fell into a gap: {qpos[:, 2].min():.3f}"
    assert qpos[-1, 2] > 0.15, f"not upright at end: z={qpos[-1, 2]:.3f}"


@needs_artifacts
def test_scan_trace_artifact_replays():
    """The committed self-captured scan trace parses and feeds the replay
    state machine (same format as the reference's SCAN_v12_* traces)."""
    from legged_gym_custom_tpu.deploy.controller import parse_scan_trace

    sync, frames = parse_scan_trace(SCAN)
    assert 0.0 <= sync <= 1.0
    assert len(frames) >= 100
    f = np.asarray(frames)
    assert f.shape[1] == 132
    # gap frames: deep-drop scandots must be present (clip ceiling 1.0)
    assert f.max() > 0.9, "trace contains no deep-gap scandots"
