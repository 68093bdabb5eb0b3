"""Heightfield terrain representation + on-device sampling.

Grid semantics match the reference exactly: world (x, y) maps to grid index
``(x + border_size) / horizontal_scale`` (legged_robot.py:1020-1021), row axis
is x / terrain length, col axis is y / terrain width (terrain.py:29-31).

Two samplers:
  * ``height_min3`` — the reference's scandot sampler: integer floor index,
    min over {(px,py),(px+1,py),(px,py+1)} (legged_robot.py:1027-1031).  Used
    for measured heights so observation semantics are bit-compatible.
  * ``height_bilinear`` / ``surface`` — smooth bilinear height + normal for
    the contact solver (a penalty contact needs a continuous surface; PhysX
    got this from its own heightfield collider).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Heightfield(NamedTuple):
    data: jnp.ndarray          # (rows, cols) float32 heights in meters
    horizontal_scale: float    # meters per cell
    border_offset: float       # meters added to world xy before indexing
    is_plane: bool = False     # static: z=0 plane everywhere


def plane() -> Heightfield:
    return Heightfield(
        data=jnp.zeros((2, 2), jnp.float32),
        horizontal_scale=1.0,
        border_offset=0.0,
        is_plane=True,
    )


def from_raw(height_field_raw: np.ndarray, horizontal_scale: float,
             vertical_scale: float, border_size: float) -> Heightfield:
    return Heightfield(
        data=jnp.asarray(height_field_raw.astype(np.float32) * vertical_scale),
        horizontal_scale=float(horizontal_scale),
        border_offset=float(border_size),
        is_plane=False,
    )


def _grid_coords(hf: Heightfield, x, y):
    gx = (x + hf.border_offset) / hf.horizontal_scale
    gy = (y + hf.border_offset) / hf.horizontal_scale
    return gx, gy


def height_min3(hf: Heightfield, x, y):
    """Reference scandot sampling: floor index, min of 3 taps (see module doc)."""
    if hf.is_plane:
        return jnp.zeros_like(x)
    gx, gy = _grid_coords(hf, x, y)
    px = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, hf.data.shape[0] - 2)
    py = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hf.data.shape[1] - 2)
    h1 = hf.data[px, py]
    h2 = hf.data[px + 1, py]
    h3 = hf.data[px, py + 1]
    return jnp.minimum(jnp.minimum(h1, h2), h3)


def height_bilinear(hf: Heightfield, x, y):
    if hf.is_plane:
        return jnp.zeros_like(x)
    gx, gy = _grid_coords(hf, x, y)
    gx = jnp.clip(gx, 0.0, hf.data.shape[0] - 1.001)
    gy = jnp.clip(gy, 0.0, hf.data.shape[1] - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    h00 = hf.data[x0, y0]
    h10 = hf.data[x0 + 1, y0]
    h01 = hf.data[x0, y0 + 1]
    h11 = hf.data[x0 + 1, y0 + 1]
    return (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )


def surface(hf: Heightfield, x, y):
    """Bilinear height and (approximate) outward unit normal at (x, y).

    Returns (h, (nx, ny, nz)) with the normal as a component tuple so callers
    control the axis layout (the SoA contact solver wants components leading).
    The normal comes from the bilinear patch gradient; steep hurdle faces in
    parkour terrain become near-horizontal normals over one cell, which is how
    the penalty solver "sees" vertical walls.
    """
    if hf.is_plane:
        z = jnp.zeros_like(x)
        return z, (z, z, jnp.ones_like(x))
    gx, gy = _grid_coords(hf, x, y)
    gx = jnp.clip(gx, 0.0, hf.data.shape[0] - 1.001)
    gy = jnp.clip(gy, 0.0, hf.data.shape[1] - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    h00 = hf.data[x0, y0]
    h10 = hf.data[x0 + 1, y0]
    h01 = hf.data[x0, y0 + 1]
    h11 = hf.data[x0 + 1, y0 + 1]
    h = (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )
    s = hf.horizontal_scale
    dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / s
    dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / s
    inv_norm = 1.0 / jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    return h, (-dhdx * inv_norm, -dhdy * inv_norm, inv_norm)
