"""Per-env local heightfield patches: TPU-native terrain sampling.

The naive heightfield path gathers 53 geoms x 4 bilinear taps from the global
(rows, cols) height table inside every integrator substep — random scalar
gathers that the TPU has no lane-parallel primitive for; they dominated the
rough-terrain step (~80 of 102 ms at 4096 envs, see docs/architecture.md).

The TPU-native formulation (VERDICT r2 #5): ONCE per 50 Hz control step,
extract a per-env (K, K) window of the global table around each base position
(one batched contiguous-row gather).  Every subsequent sample — contact
heights/normals in all decimation x substeps, and the 132 scandots — becomes
interpolation-weight construction (pure elementwise VPU code) followed by a
small batched matmul against the resident patch, which XLA tiles onto the
MXU.  No gathers anywhere in the hot loop.

Semantics match physics/heightfield.py exactly (same reference grid mapping,
legged_robot.py:1020-1031): `surface` is the bilinear height + normal the
penalty contact uses, `height_min3` the reference's floor-index min-of-3-taps
scandot sampler.  Parity asserted in tests/test_patch.py.

Validity: a patch covers +/- K/2 cells around the base position *at extraction
time*; callers must pick K so that every query lands inside (geom reach +
base drift within one control step; scandot radius).  Queries outside the
patch clamp to its edge — the same clamp-to-border behavior the global
samplers have at the terrain boundary.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .heightfield import Heightfield


class LocalPatch(NamedTuple):
    data: jnp.ndarray          # (B, K, K) f32 local heights (batch LEADING)
    x0: jnp.ndarray            # (B,) int32 global row index of data[:, 0, 0]
    y0: jnp.ndarray            # (B,) int32 global col index
    horizontal_scale: float
    border_offset: float


def extract(hf: Heightfield, cx: jnp.ndarray, cy: jnp.ndarray, K: int
            ) -> LocalPatch:
    """Cut (K, K) windows centered at world (cx, cy), one per env.

    cx/cy: (B,) world coordinates (any layout flattens to (B,)).
    The window is clamped inside the table, so border clamping matches the
    global samplers'.
    """
    cx = cx.reshape(-1)
    cy = cy.reshape(-1)
    R, C = hf.data.shape
    gx = (cx + hf.border_offset) / hf.horizontal_scale
    gy = (cy + hf.border_offset) / hf.horizontal_scale
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32) - K // 2, 0, R - K)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32) - K // 2, 0, C - K)
    data = jax.vmap(
        lambda a, b: jax.lax.dynamic_slice(hf.data, (a, b), (K, K))
    )(x0, y0)
    return LocalPatch(data, x0, y0, hf.horizontal_scale, hf.border_offset)


def _local_coords(lp: LocalPatch, x, y):
    """World (x, y) of shape (B, G) -> fractional patch-grid coordinates."""
    gx = (x + lp.border_offset) / lp.horizontal_scale - lp.x0[:, None]
    gy = (y + lp.border_offset) / lp.horizontal_scale - lp.y0[:, None]
    return gx, gy


def _interp_weights(g, K: int):
    """Two-hot linear interpolation weights W (B, G, K) and their derivative
    dW (units: per-cell) for fractional coords g (B, G); clamped to the patch
    interior like the global bilinear sampler clamps to the table."""
    g = jnp.clip(g, 0.0, K - 1.001)
    i0 = jnp.floor(g).astype(jnp.int32)          # (B, G)
    f = g - i0
    k = jnp.arange(K, dtype=jnp.int32)
    at0 = (k == i0[..., None]).astype(g.dtype)   # (B, G, K)
    at1 = (k == (i0 + 1)[..., None]).astype(g.dtype)
    W = at0 * (1.0 - f)[..., None] + at1 * f[..., None]
    dW = at1 - at0
    return W, dW


def surface(lp: LocalPatch, x, y):
    """Bilinear height + outward unit normal, batch-leading (B, G) in/out.

    Mirrors heightfield.surface() term for term:
        h    = sum_kl Wx_k Wy_l patch_kl
        dhdx = sum_kl dWx_k Wy_l patch_kl / s
        dhdy = sum_kl Wx_k dWy_l patch_kl / s
    Two batched (G, K) @ (K, K) matmuls share the patch; everything else is
    elementwise.
    """
    K = lp.data.shape[-1]
    gx, gy = _local_coords(lp, x, y)
    Wx, dWx = _interp_weights(gx, K)
    Wy, dWy = _interp_weights(gy, K)
    t = jnp.einsum("bgk,bkl->bgl", Wx, lp.data)    # (B, G, K)
    tdx = jnp.einsum("bgk,bkl->bgl", dWx, lp.data)
    h = jnp.sum(t * Wy, axis=-1)
    s = lp.horizontal_scale
    dhdx = jnp.sum(tdx * Wy, axis=-1) / s
    dhdy = jnp.sum(t * dWy, axis=-1) / s
    inv_norm = 1.0 / jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    return h, (-dhdx * inv_norm, -dhdy * inv_norm, inv_norm)


def surface_cm(lp: LocalPatch, x, y):
    """Component-major wrapper: x/y (G,)+ (B,) trailing -> (G, B) outputs,
    the layout physics/contact.py works in."""
    h, (nx, ny, nz) = surface(lp, x.T, y.T)
    return h.T, (nx.T, ny.T, nz.T)


def height_min3(lp: LocalPatch, x, y):
    """Reference scandot sampler (legged_robot.py:1027-1031) from the patch:
    floor index, min over {(px,py), (px+1,py), (px,py+1)}.  Batch-leading
    (B, P) in/out.  One-hot taps -> two shared matmuls + elementwise min."""
    K = lp.data.shape[-1]
    gx, gy = _local_coords(lp, x, y)
    px = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, K - 2)
    py = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, K - 2)
    k = jnp.arange(K, dtype=jnp.int32)
    X0 = (k == px[..., None]).astype(lp.data.dtype)        # (B, P, K)
    X1 = (k == (px + 1)[..., None]).astype(lp.data.dtype)
    Y0 = (k == py[..., None]).astype(lp.data.dtype)
    Y1 = (k == (py + 1)[..., None]).astype(lp.data.dtype)
    t0 = jnp.einsum("bpk,bkl->bpl", X0, lp.data)
    t1 = jnp.einsum("bpk,bkl->bpl", X1, lp.data)
    h1 = jnp.sum(t0 * Y0, axis=-1)
    h2 = jnp.sum(t1 * Y0, axis=-1)
    h3 = jnp.sum(t0 * Y1, axis=-1)
    return jnp.minimum(jnp.minimum(h1, h2), h3)
