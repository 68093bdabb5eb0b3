"""Terrain generator tests: structural properties of each primitive and the
composer (golden-property style, SURVEY §4 implication)."""
import numpy as np
import pytest

from legged_gym_custom_tpu.terrain import (
    SubTerrain,
    Terrain,
    convert_heightfield_to_trimesh,
    gap_terrain,
    parkour_terrain,
    pit_terrain,
    pyramid_sloped_terrain,
    pyramid_stairs_terrain,
    random_uniform_terrain,
    stairs_terrain,
    stepping_stones_terrain,
    wave_terrain,
)


def _sub(n=80):
    return SubTerrain("t", width=n, length=n, vertical_scale=0.005, horizontal_scale=0.1)


def test_random_uniform_range(rng):
    t = _sub()
    random_uniform_terrain(t, -0.05, 0.05, step=0.005, downsampled_scale=0.3,
                           rng=np.random.default_rng(0))
    h = t.height_field_raw * t.vertical_scale
    assert h.min() >= -0.051 and h.max() <= 0.051
    assert h.std() > 0.005  # actually rough


def test_pyramid_sloped_center_platform():
    t = _sub()
    pyramid_sloped_terrain(t, slope=0.5, platform_size=3.0)
    c = t.height_field_raw[40, 40]
    # slope 0.5 over 4 m -> up to 2 m, clipped at the platform height
    assert c > 0
    # platform flat: 3 m = 30 cells around center all equal
    patch = t.height_field_raw[30:50, 30:50]
    assert patch.max() == patch.min() == c


def test_stairs_monotonic():
    t = _sub()
    stairs_terrain(t, step_width=0.5, step_height=0.1)
    col = t.height_field_raw[:, 40]
    assert (np.diff(col.astype(int)) >= 0).all()
    assert col[-1] > col[0]


def test_pyramid_stairs():
    t = _sub()
    pyramid_stairs_terrain(t, step_width=0.25, step_height=0.1, platform_size=2.0)
    assert t.height_field_raw[40, 40] == t.height_field_raw.max()
    assert t.height_field_raw[0, 0] == 0


def test_gap_and_pit():
    t = _sub()
    gap_terrain(t, gap_size=1.0, platform_size=3.0)
    assert t.height_field_raw.min() == -1000  # hole of death
    assert t.height_field_raw[40, 40] == 0    # center platform safe
    t2 = _sub()
    pit_terrain(t2, depth=0.5, platform_size=2.0)
    assert t2.height_field_raw[40, 40] == -int(0.5 / t2.vertical_scale)


def test_stepping_stones():
    t = _sub()
    stepping_stones_terrain(t, stone_size=0.6, stone_distance=0.4, max_height=0.0,
                            platform_size=2.0, depth=-5.0,
                            rng=np.random.default_rng(0))
    pit = int(-5.0 / t.vertical_scale)
    assert (t.height_field_raw == pit).any()      # holes exist
    assert t.height_field_raw[40, 40] == 0        # center platform


def test_parkour_hurdles_exact_positions():
    """Hurdles at exact x positions with a corridor (terrain_utils.py:318-399)."""
    t = SubTerrain("t", width=100, length=280, vertical_scale=0.005, horizontal_scale=0.1)
    parkour_terrain(
        t,
        start_platform_length=3.0,
        start_platform_height=0.0,
        x_positions=[5.0, 10.0],
        y_positions=[0.0, 0.0],
        obstacle_lengths=[0.4, 0.4],
        obstacle_heights=[0.2, 0.3],
        half_valid_width=4.0,
        border_width=0.25,
        border_height=1.0,
    )
    # hurdle 1 at x=5m -> row 50, height 0.2/0.005 = 40 within corridor
    assert t.height_field_raw[50, 50] == 40
    assert t.height_field_raw[100, 50] == 60
    # outside the corridor (half_valid_width 4 m from mid 5 m): cleared
    assert t.height_field_raw[50, 5] == 0
    # border wall occupies the first border_width cells
    assert t.height_field_raw[50, 1] == int(1.0 / 0.005)
    # between hurdles: flat ground
    assert t.height_field_raw[75, 50] == 0


def test_parkour_gaps():
    t = SubTerrain("t", width=100, length=280, vertical_scale=0.005, horizontal_scale=0.1)
    parkour_terrain(
        t, start_platform_length=3.0, start_platform_height=0.0,
        x_positions=[8.0], y_positions=[0.0], obstacle_lengths=[1.0],
        obstacle_heights=[-2.0], half_valid_width=5.0, border_width=0.5,
        border_height=-2.0,
    )
    assert t.height_field_raw[80, 50] == int(-2.0 / 0.005)


class _TCfg:
    mesh_type = "trimesh"
    horizontal_scale = 0.1
    vertical_scale = 0.005
    border_size = 5
    curriculum = True
    terrain_length = 8.0
    terrain_width = 8.0
    num_rows = 4
    num_cols = 3
    terrain_proportions = [0.1, 0.1, 0.35, 0.25, 0.2, 0.0, 0.0]
    slope_treshold = 0.75
    selected = False
    parkour = False
    add_roughness_to_selected_terrain = False


def test_composer_curriculum_origins():
    terrain = Terrain(_TCfg(), 16, np.random.default_rng(0))
    assert terrain.height_field_raw.shape == (
        4 * 80 + 2 * 50, 3 * 80 + 2 * 50
    )
    # origins at patch centers (terrain.py:267-268)
    np.testing.assert_allclose(terrain.env_origins[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(terrain.env_origins[2, 1, :2], [20.0, 12.0])
    # rows increase in difficulty: stairs get taller
    assert terrain.env_origins.shape == (4, 3, 3)


def test_trimesh_conversion():
    t = _sub(20)
    stairs_terrain(t, step_width=0.5, step_height=0.1)
    v, tri = convert_heightfield_to_trimesh(
        t.height_field_raw, 0.1, 0.005, slope_threshold=0.75
    )
    assert v.shape == (400, 3)
    assert tri.shape == (2 * 19 * 19, 3)
    assert tri.max() < 400
