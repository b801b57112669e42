"""`generate_grid_sdf` — signed distance field on a regular grid.

Capability parity with the reference flagship (`mesh_to_sdf/src/generate/grid.rs:265-378`),
re-designed TPU-first. The reference's three CPU phases map as:

=====================================  =========================================
reference (grid.rs)                    TPU-native
=====================================  =========================================
preheap: per-triangle AABB rasterize   (subsumed) dense/tiled min over triangle
  + RwLock min (`grid.rs:383-456`)       blocks — exact by construction
propagation: split-heap parallel BFS   (not replicated — a sparse-CPU
  (`grid.rs:495-558`)                    optimization; exactness comes from the
                                         full reduction; see SURVEY §7)
raycast sign: BVH rays + atomic        per-axis line-parity sweep
  prefix counters (`grid.rs:568-641`)    (:mod:`mesh_to_sdf_tpu.ops.raycast`)
=====================================  =========================================

The reference asserts its grid output equals brute-force `generate_sdf` at the
cell centers (`grid.rs:692-724`), which is exactly what this computes.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .topology import Topology
from .types import AccelerationMethod, SignMethod, Strategy
from .ops import brute, raycast
from .query import prepare_triangles, _resolve


def generate_grid_sdf(
    vertices,
    topology: Optional[Topology],
    grid: Grid,
    sign_method: SignMethod = SignMethod.RAYCAST,
    *,
    strategy: Union[Strategy, AccelerationMethod, None] = None,
    raycast_axes: int = 3,
    tri_block: int = brute.DEFAULT_TRI_BLOCK,
    query_chunk: int = brute.DEFAULT_QUERY_CHUNK,
    flat: bool = True,
) -> jax.Array:
    """SDF at every cell center of ``grid``.

    Returns float32 distances, flattened in the reference's x-major/z-fastest
    layout (`grid.rs:122-124`) when ``flat=True``, else shaped (nx, ny, nz).
    Positive outside, negative inside (`grid.rs:199-232`).
    """
    from .query import _auto_strategy

    strategy, sign = _resolve(
        strategy if strategy is not None else Strategy.AUTO, sign_method
    )
    if strategy == Strategy.AUTO:
        strategy = _auto_strategy()

    ta, tb, tc, valid, n_tris = prepare_triangles(vertices, topology, tri_block)

    if strategy == Strategy.PALLAS and n_tris > 0:
        import jax as _jax

        from .ops.kernels import pallas_sdf

        interp = _jax.default_backend() != "tpu"
        centers = grid.all_cell_centers().reshape(-1, 3)
        ra, rb, rc = ta[:n_tris], tb[:n_tris], tc[:n_tris]
        if sign == SignMethod.NORMAL:
            dist3 = pallas_sdf.sdf_normal_pallas(
                centers, ra, rb, rc, interpret=interp
            )[: centers.shape[0]].reshape(grid.cell_count)
        else:
            # Unsigned distance only; sign comes from the line-parity kernel.
            dist3 = pallas_sdf.sdf_raycast_pallas(
                centers, ra, rb, rc, raycast_axes=0, interpret=interp
            )[: centers.shape[0]].reshape(grid.cell_count)
    elif strategy == Strategy.CULLED and n_tris > 0:
        from .ops import culling

        dist3 = culling.grid_distance_culled(grid, ta, tb, tc, valid, sign=sign)
    else:
        centers = grid.all_cell_centers().reshape(-1, 3)
        N = centers.shape[0]
        chunk = min(query_chunk, N)
        pad = (-N) % chunk
        if pad:
            centers = jnp.pad(centers, ((0, pad), (0, 0)))
        dist = brute.sdf_brute(
            centers, ta, tb, tc, valid,
            sign_method=sign,
            # Grid raycast sign comes from the line-parity kernel below, not
            # from per-cell rays — ask the brute pass for unsigned min only.
            raycast_axes=0,
            tri_block=tri_block,
            query_chunk=chunk,
        )[:N]
        dist3 = dist.reshape(grid.cell_count)

    if sign == SignMethod.RAYCAST:
        inside = raycast.grid_inside_mask(
            grid, ta, tb, tc, valid, tri_block=min(tri_block, 256)
        )
        dist3 = jnp.where(inside, -dist3, dist3)

    return dist3.reshape(-1) if flat else dist3
