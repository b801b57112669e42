"""Isosurface extraction by ordered cell indices + voxel/point-cloud views.

Parity with the client's `Sdf` GPU wrapper (`mesh_to_sdf_client/src/sdf.rs`):
- `ordered_indices` (`sdf.rs:63-68`): cell indices sorted by distance, so any
  iso-band is a contiguous slice;
- the voxel pass slices `ordered_indices[from..to]` with a binary search
  around `iso ± cell_width` (`passes/voxel_render_pass.rs:280-310`);
- `iso_limits = (min, max)` over the data (`sdf.rs:123`), bounding the UI's
  iso slider (`ui.rs:501-650`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid


def ordered_indices(distances: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort flat cell indices by distance (`sdf.rs:63-68`).

    Returns (order (N,) int32, sorted_distances (N,) f32).
    """
    flat = distances.reshape(-1)
    order = jnp.argsort(flat)
    return order.astype(jnp.int32), flat[order]


def iso_limits(distances: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(min, max) distance — the UI's iso slider bounds (`sdf.rs:123`)."""
    flat = distances.reshape(-1)
    return jnp.min(flat), jnp.max(flat)


def voxel_band(sorted_distances: jax.Array, iso: float, cell_width: float):
    """(lo, hi) slice bounds of the iso band in the ordered list — the voxel
    pass's binary search (`voxel_render_pass.rs:280-310`): cells whose
    distance lies in [iso - cell_width, iso + cell_width]."""
    lo = jnp.searchsorted(sorted_distances, iso - cell_width, side="left")
    hi = jnp.searchsorted(sorted_distances, iso + cell_width, side="right")
    return lo, hi


def surface_cells(grid: Grid, distances, iso: float = 0.0,
                  width_scale: float = 1.0) -> np.ndarray:
    """Integer coords (K, 3) of cells within one cell-width of the iso level —
    what the voxel pass instances as cubes."""
    d = np.asarray(distances).reshape(-1)
    cell_width = float(np.max(np.abs(np.asarray(grid.cell_size)))) * width_scale
    order = np.argsort(d)
    sd = d[order]
    lo = np.searchsorted(sd, iso - cell_width, side="left")
    hi = np.searchsorted(sd, iso + cell_width, side="right")
    idx = order[lo:hi]
    return np.asarray(grid.cell_coordinates(idx))


def point_cloud(grid: Grid, distances, iso: float = 0.0,
                width_scale: float = 1.0) -> np.ndarray:
    """World-space centers (K, 3) of the iso-band cells — the point-cloud
    render mode's data (`sdf_render_pass.rs`)."""
    cells = surface_cells(grid, distances, iso, width_scale)
    return np.asarray(grid.cell_center(cells))
