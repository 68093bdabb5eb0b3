"""Scene generation: training terrain -> MuJoCo deploy scene.

Verifies that the hfield scene written by deploy/scene_gen.py reproduces the
terrain generator's height grid exactly in MuJoCo world coordinates (ray-cast
probes vs the int16 grid), including the spawn-centering shift that puts an
env origin at the MuJoCo world origin where the go2.xml home keyframe spawns
the robot.
"""
import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")


def _probe_height(m, d, x, y):
    """Ray-cast straight down from 5 m; returns hit z (excluding the robot
    by casting far from it or accepting terrain geom only)."""
    pnt = np.array([x, y, 5.0])
    vec = np.array([0.0, 0.0, -1.0])
    geomid = np.zeros(1, np.int32)
    dist = mujoco.mj_ray(m, d, pnt, vec, None, 1, -1, geomid)
    assert dist >= 0, f"no terrain hit at ({x}, {y})"
    return 5.0 - dist


def test_parkour_scene_heights_match_grid(tmp_path):
    from legged_gym_custom_tpu.deploy import scene_gen
    from legged_gym_custom_tpu.deploy.mujoco_runner import load_scene
    from legged_gym_custom_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("go2_parkour")
    terrain, origin = scene_gen.build_parkour_play_terrain(env_cfg, rng_seed=0)
    hf = terrain.height_field_raw
    hs, vs, border = (
        terrain.cfg.horizontal_scale,
        terrain.cfg.vertical_scale,
        terrain.cfg.border_size,
    )

    out = scene_gen.write_heightfield_scene(
        hf, hs, vs, (origin[0], origin[1]),
        str(tmp_path / "scene.xml"), border_size=border,
    )
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "scene.hfield.npy"))

    m = load_scene(out)
    assert m.nhfield == 1
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)

    # probe away from the robot (it sits at the world origin): run-up
    # platform, first gap (x_positions[0]=5, depth -2), and ground after it
    for wx in [1.0, 2.0, 5.0, 6.0, 8.5]:
        ix = int(round((wx + origin[0] + border) / hs))
        iy = int(round((0.0 + origin[1] + border) / hs))
        z_grid = hf[ix, iy] * vs
        z_mj = _probe_height(m, d, wx, 0.0)
        assert abs(z_mj - z_grid) < 1e-3, f"x={wx}: mj {z_mj} vs grid {z_grid}"

    # the course must actually contain a gap (depth < -1 m) ahead of the robot
    assert min(
        hf[int(round((5.0 + origin[0] + border) / hs)),
           int(round((origin[1] + border) / hs))] * vs,
        0.0,
    ) < -1.0


def test_scene_robot_spawns_on_platform(tmp_path):
    """The home keyframe + generated scene must place the robot standing on
    solid ground (start platform), not over a gap."""
    from legged_gym_custom_tpu.deploy import scene_gen
    from legged_gym_custom_tpu.deploy.mujoco_runner import load_scene
    from legged_gym_custom_tpu.envs import task_registry

    env_cfg, _ = task_registry.get_cfgs("go2_parkour")
    terrain, origin = scene_gen.build_parkour_play_terrain(env_cfg, rng_seed=0)
    # spawn where training spawns: init_state.pos x-offset from the origin
    spawn = (origin[0] + env_cfg.init_state.pos[0], origin[1])
    out = scene_gen.write_heightfield_scene(
        terrain.height_field_raw,
        terrain.cfg.horizontal_scale,
        terrain.cfg.vertical_scale,
        spawn,
        str(tmp_path / "scene.xml"),
        border_size=terrain.cfg.border_size,
    )
    m = load_scene(out)
    d = mujoco.MjData(m)
    mujoco.mj_resetDataKeyframe(m, d, 0)
    # settle 200 steps unactuated: the legs fold (motor ctrl is zero), but the
    # body must come to rest ON the start platform (z ~ 0.09), not fall into
    # a gap (bottom at -2 m) or through the heightfield
    for _ in range(200):
        mujoco.mj_step(m, d)
    assert d.qpos[2] > 0.03, f"robot fell through terrain: z={d.qpos[2]:.3f}"
