"""Grid SDF samplers: snap / trilinear (dual grid) / tetrahedral.

Behavioral parity with the reference raymarch shader's samplers
(`mesh_to_sdf_client/shaders/draw_raymarching.wgsl:118-200,585-640`):

- ``snap``: nearest cell (floor on the primal grid, clamped);
- ``trilinear``: interpolation on the *dual* grid whose vertices are the cell
  centers (`draw_raymarching.wgsl:137-176`) — so fractional coordinates are
  measured from the first cell *center*;
- ``tetrahedral``: the dual cell is split into 6 tetrahedra keyed by the
  ordering of the fractional coordinates; barycentric interpolation of the 4
  tetrahedron corners (`draw_raymarching.wgsl:177-195,585-640`).

All samplers are pure jnp, vmap/jit-safe, differentiable w.r.t. both the
distance grid and the sample positions (snap's gradient w.r.t. position is
zero almost everywhere, as in the stepped reference).

Out-of-bounds positions return ``OUT_OF_BOUNDS_DISTANCE`` (the shader's 100.0
sentinel, `draw_raymarching.wgsl:121-123`).
"""
from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp

from ..grid import Grid

#: `draw_raymarching.wgsl:122` — returned outside the grid bbox.
OUT_OF_BOUNDS_DISTANCE = 100.0


class RaymarchMode(enum.Enum):
    """Mirrors the client's raymarch mode enum (`sdf_program.rs:48-53`)."""

    SNAP = "snap"
    TRILINEAR = "trilinear"
    TETRAHEDRAL = "tetrahedral"
    SNAP_STYLIZED = "snap_stylized"


def _clamped_fetch(dist: jax.Array, cell: jax.Array) -> jax.Array:
    """``get_distance`` (`draw_raymarching.wgsl:92-98`): clamp integer cell
    coords to the grid then gather. dist: (nx,ny,nz); cell: (..., 3) int32."""
    nx, ny, nz = dist.shape
    cx = jnp.clip(cell[..., 0], 0, nx - 1)
    cy = jnp.clip(cell[..., 1], 0, ny - 1)
    cz = jnp.clip(cell[..., 2], 0, nz - 1)
    return dist[cx, cy, cz]


def _dual_coords(grid: Grid, position: jax.Array):
    """Continuous coords on the dual grid (origin = first cell center)."""
    rel = (position - grid.first_cell) / grid.cell_size
    idx = jnp.floor(rel).astype(jnp.int32)
    frac = rel - jnp.floor(rel)
    return idx, frac


def _in_bounds(grid: Grid, position: jax.Array) -> jax.Array:
    """Inside [start, end] — `draw_raymarching.wgsl:121-123` (uniforms.start /
    end are the first/last cell centers)."""
    start = grid.first_cell
    counts = jnp.asarray(grid.cell_count, jnp.float32)
    end = grid.first_cell + (counts - 1.0) * grid.cell_size
    lo = jnp.minimum(start, end)
    hi = jnp.maximum(start, end)
    return jnp.all((position >= lo) & (position <= hi), axis=-1)


def sample_snap(dist: jax.Array, grid: Grid, position: jax.Array) -> jax.Array:
    """Nearest-cell sample (`draw_raymarching.wgsl:128-136`)."""
    bmin, _ = grid.bounding_box()
    cell = jnp.floor((position - bmin) / grid.cell_size).astype(jnp.int32)
    val = _clamped_fetch(dist, cell)
    return jnp.where(_in_bounds(grid, position), val, OUT_OF_BOUNDS_DISTANCE)


def sample_trilinear(dist: jax.Array, grid: Grid, position: jax.Array) -> jax.Array:
    """Dual-grid trilinear sample (`draw_raymarching.wgsl:137-176`)."""
    idx, f = _dual_coords(grid, position)
    fx = f[..., 0]
    fy = f[..., 1]
    fz = f[..., 2]

    def at(dx, dy, dz):
        off = jnp.asarray([dx, dy, dz], jnp.int32)
        return _clamped_fetch(dist, idx + off)

    c_x00 = at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx
    c_x01 = at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx
    c_x10 = at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx
    c_x11 = at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx
    c_xy0 = c_x00 * (1 - fy) + c_x10 * fy
    c_xy1 = c_x01 * (1 - fy) + c_x11 * fy
    val = c_xy0 * (1 - fz) + c_xy1 * fz
    return jnp.where(_in_bounds(grid, position), val, OUT_OF_BOUNDS_DISTANCE)


def sample_tetrahedral(dist: jax.Array, grid: Grid, position: jax.Array) -> jax.Array:
    """Dual-grid tetrahedral barycentric sample
    (`draw_raymarching.wgsl:177-195` + `compute_tetrahedral_barycenter`
    `:585-640`). The dual cell splits into 6 tetrahedra selected by the sort
    order of the fractional coords (fx, fy, fz) ≙ (fR, fG, fB)."""
    idx, f = _dual_coords(grid, position)
    fx = f[..., 0]
    fy = f[..., 1]
    fz = f[..., 2]

    # The 6 cases, exactly as the shader orders them (last-true-wins there is
    # irrelevant: cases are mutually exclusive and cover all orderings).
    #   case:   condition                 bary                    v2         v3
    #   1: fy >= fz >= fx   (1-fy, fy-fz, fz-fx, fx)   (0,1,0)  (0,1,1)
    #   2: fz >  fx >  fy   (1-fz, fz-fx, fx-fy, fy)   (0,0,1)  (1,0,1)
    #   3: fz >  fy >= fx   (1-fz, fz-fy, fy-fx, fx)   (0,0,1)  (0,1,1)
    #   4: fx >= fy >  fz   (1-fx, fx-fy, fy-fz, fz)   (1,0,0)  (1,1,0)
    #   5: fy >  fx >= fz   (1-fy, fy-fx, fx-fz, fz)   (0,1,0)  (1,1,0)
    #   6: fx >= fz >= fy   (1-fx, fx-fz, fz-fy, fy)   (1,0,0)  (1,0,1)
    conds = [
        (fy >= fz) & (fz >= fx),
        (fz > fx) & (fx > fy),
        (fz > fy) & (fy >= fx),
        (fx >= fy) & (fy > fz),
        (fy > fx) & (fx >= fz),
        (fx >= fz) & (fz >= fy),
    ]
    barys = [
        (1 - fy, fy - fz, fz - fx, fx),
        (1 - fz, fz - fx, fx - fy, fy),
        (1 - fz, fz - fy, fy - fx, fx),
        (1 - fx, fx - fy, fy - fz, fz),
        (1 - fy, fy - fx, fx - fz, fz),
        (1 - fx, fx - fz, fz - fy, fy),
    ]
    v2s = [(0, 1, 0), (0, 0, 1), (0, 0, 1), (1, 0, 0), (0, 1, 0), (1, 0, 0)]
    v3s = [(0, 1, 1), (1, 0, 1), (0, 1, 1), (1, 1, 0), (1, 1, 0), (1, 0, 1)]

    zero = jnp.zeros_like(fx)
    b = [zero, zero, zero, zero]
    v2 = [jnp.zeros_like(fx, jnp.int32) for _ in range(3)]
    v3 = [jnp.zeros_like(fx, jnp.int32) for _ in range(3)]
    for cond, bary, vv2, vv3 in zip(conds, barys, v2s, v3s):
        for k in range(4):
            b[k] = jnp.where(cond, bary[k], b[k])
        for k in range(3):
            v2[k] = jnp.where(cond, vv2[k], v2[k])
            v3[k] = jnp.where(cond, vv3[k], v3[k])

    s0 = _clamped_fetch(dist, idx)
    s1 = _clamped_fetch(dist, idx + jnp.stack(v2, axis=-1))
    s2 = _clamped_fetch(dist, idx + jnp.stack(v3, axis=-1))
    s3 = _clamped_fetch(dist, idx + jnp.asarray([1, 1, 1], jnp.int32))
    val = b[0] * s0 + b[1] * s1 + b[2] * s2 + b[3] * s3
    return jnp.where(_in_bounds(grid, position), val, OUT_OF_BOUNDS_DISTANCE)


_SAMPLERS = {
    RaymarchMode.SNAP: sample_snap,
    RaymarchMode.SNAP_STYLIZED: sample_snap,
    RaymarchMode.TRILINEAR: sample_trilinear,
    RaymarchMode.TETRAHEDRAL: sample_tetrahedral,
}


def sample(dist, grid, position, mode: RaymarchMode = RaymarchMode.TRILINEAR):
    """Dispatch over :class:`RaymarchMode` (`draw_raymarching.wgsl:126-199`)."""
    return _SAMPLERS[mode](dist, grid, position)
