"""Generate MuJoCo deploy scenes from this framework's terrain generator.

The reference ships hand-made MuJoCo scenes (scene_flat / scene_terrain /
scene_stairs_*, resources/robots/go2/mujoco/) for its sim-to-sim oracle; it
has no way to carry a *training* terrain into the deploy loop.  Here the
terrain composer (terrain/terrain.py) is the single source of truth: any
generated course — in particular the parkour gap/hurdle courses — is exported
as a MuJoCo heightfield scene, so a TPU-trained parkour policy can be
evaluated in the oracle over the exact ground it trained (and recorded its
scan replay trace) on.

The scene XML declares an empty `<hfield nrow ncol>` asset; the exact float
elevation grid is stored in a sibling `<name>.hfield.npy` that
`mujoco_runner.load_scene` pours into `model.hfield_data` after load (no
8-bit PNG quantization of gap/hurdle edges).
"""
from __future__ import annotations

import os

import numpy as np

# Committed scenes carry this placeholder instead of an absolute checkout
# path; mujoco_runner.load_scene expands it from $LGC_REFERENCE_DIR
# (default /root/reference) at load time (ADVICE r3).
GO2_XML = "{REFERENCE_DIR}/resources/robots/go2/mujoco/go2.xml"

_SCENE_TEMPLATE = """<mujoco model="{name}">
  <include file="{robot_xml}"/>

  <statistic center="0 0 0.1" extent="0.8"/>

  <visual>
    <headlight diffuse="0.6 0.6 0.6" ambient="0.3 0.3 0.3" specular="0 0 0"/>
    <rgba haze="0.15 0.25 0.35 1"/>
    <global azimuth="-130" elevation="-20"/>
  </visual>

  <asset>
    <texture type="skybox" builtin="gradient" rgb1="0.3 0.5 0.7" rgb2="0 0 0" width="512" height="3072"/>
    <hfield name="terrain" nrow="{nrow}" ncol="{ncol}" size="{rx} {ry} {ztop} {zbot}"/>
  </asset>

  <worldbody>
    <light pos="0 0 1.5" dir="0 0 -1" directional="true"/>
    <geom name="terrain" type="hfield" hfield="terrain" pos="{px} {py} {pz}"
          friction="0.8 0.02 0.01"/>
  </worldbody>
</mujoco>
"""


def write_heightfield_scene(
    height_field_raw: np.ndarray,
    horizontal_scale: float,
    vertical_scale: float,
    spawn_xy: tuple,
    out_path: str,
    robot_xml: str = GO2_XML,
    name: str = "lgc_generated_scene",
    border_size: float = 0.0,
) -> str:
    """Write a MuJoCo scene whose heightfield reproduces `height_field_raw`.

    height_field_raw: (nx, ny) int16 grid, heights = raw * vertical_scale,
        world x = ix * horizontal_scale - border_size (the Terrain/Heightfield
        convention, reference legged_robot.py:1020-1021).
    spawn_xy: world-frame (x, y) (e.g. an env origin) that should land at
        MuJoCo world (0, 0) — the go2.xml home keyframe spawns the robot at
        the world origin, so the terrain is shifted under it rather than
        moving the robot.

    Returns out_path.  The elevation grid is written to
    `<out_path minus .xml>.hfield.npy` for load_scene's runtime fill.
    """
    h = np.asarray(height_field_raw, np.float64) * vertical_scale
    nx, ny = h.shape
    hmin, hmax = float(h.min()), float(h.max())
    ztop = max(hmax - hmin, 1e-3)

    # MuJoCo hfield layout: data[row, col] with col → x, row → y, normalized
    # to [0, 1]; heights span [0, ztop] above the geom frame.
    data = ((h - hmin) / ztop).T.astype(np.float32)  # (nrow=ny, ncol=nx)

    rx = (nx - 1) * horizontal_scale / 2.0
    ry = (ny - 1) * horizontal_scale / 2.0
    # world position of the grid center (pixel (nx-1)/2, (ny-1)/2)
    cx, cy = rx - border_size, ry - border_size
    sx, sy = spawn_xy
    px, py, pz = cx - sx, cy - sy, hmin

    base = out_path[:-4] if out_path.endswith(".xml") else out_path
    np.save(base + ".hfield.npy", data)
    xml = _SCENE_TEMPLATE.format(
        name=name,
        robot_xml=robot_xml
        if (os.path.isabs(robot_xml) or robot_xml.startswith("{REFERENCE_DIR}"))
        else os.path.relpath(robot_xml, os.path.dirname(os.path.abspath(out_path))),
        nrow=ny,
        ncol=nx,
        rx=rx,
        ry=ry,
        ztop=ztop,
        zbot=2.0,
        px=px,
        py=py,
        pz=pz,
    )
    with open(out_path, "w") as f:
        f.write(xml)
    return out_path


def build_parkour_play_terrain(env_cfg, rng_seed: int = 0):
    """Build the 1x1 parkour course used for play/record/deploy.

    Shrinks the config to a single sub-terrain (the play.py override spirit,
    reference play.py:13-25) and returns (Terrain, spawn_xyz) where spawn is
    the course's env origin (start platform).
    """
    from ..terrain.terrain import Terrain

    cfg = env_cfg.terrain
    cfg.num_rows = 1
    cfg.num_cols = 1
    cfg.curriculum = False
    cfg.border_size = 5.0
    terrain = Terrain(cfg, num_robots=1, rng=np.random.default_rng(rng_seed))
    origin = terrain.env_origins[0, 0]
    return terrain, origin
