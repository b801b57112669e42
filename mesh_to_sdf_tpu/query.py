"""`generate_sdf` — signed distances at arbitrary query points.

Capability parity with the reference entry point (`mesh_to_sdf/src/lib.rs:291-311`),
re-designed TPU-first: the acceleration-structure dispatch becomes kernel
strategy selection (see :class:`mesh_to_sdf_tpu.types.Strategy`).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology, as_points, gather_triangle_vertices
from .types import AccelerationMethod, SignMethod, Strategy
from .ops import brute


def _resolve(acceleration, sign_method):
    if isinstance(acceleration, AccelerationMethod):
        return acceleration.strategy, acceleration.sign_method
    if acceleration is None:
        acceleration = Strategy.AUTO
    if sign_method is None:
        sign_method = SignMethod.RAYCAST
    return acceleration, sign_method


def _auto_strategy() -> Strategy:
    """AUTO → the Pallas kernel on TPU (the XLA brute path materializes pair
    temporaries to HBM and is ~30-60x slower there); fused-XLA elsewhere."""
    import jax

    return Strategy.PALLAS if jax.default_backend() == "tpu" else Strategy.XLA


def prepare_triangles(vertices, topology: Optional[Topology], tri_block: int):
    """Expand topology → padded (T', 3) triangle vertex device arrays + mask."""
    v = as_points(vertices)
    if topology is None:
        topology = Topology.triangle_list(None)
    ta, tb, tc = gather_triangle_vertices(v, topology)
    T = ta.shape[0]
    pad = (-T) % tri_block if T > 0 else tri_block
    valid = np.ones((T,), bool)
    if pad:
        zeros = np.zeros((pad, 3), np.float32)
        ta = np.concatenate([ta, zeros])
        tb = np.concatenate([tb, zeros])
        tc = np.concatenate([tc, zeros])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])
    return (
        jnp.asarray(ta),
        jnp.asarray(tb),
        jnp.asarray(tc),
        jnp.asarray(valid),
        T,
    )


#: Content-hashed cache of CULLED sign grids (one per mesh; queries vary).
_SIGN_GRID_CACHE: dict = {}
_SIGN_GRID_CACHE_MAX = 4
#: Below this many queries the O(Q·T) parity sweep beats building a grid
#: (the grid is cached per mesh, so the bar is low).
SIGN_GRID_MIN_QUERIES = 4096


def _sign_grid_cached(ta, tb, tc, valid, n_tris: int):
    import zlib

    from .ops import culling

    # Key over the FULL soup (a, b, c): meshes that differ only in second/
    # third-corner vertices must not collide (deformation workflows re-call
    # generate_sdf with corner-0 fixed).
    key = (
        zlib.adler32(np.asarray(ta[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tb[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tc[:n_tris]).tobytes()),
        int(n_tris),
    )
    sg = _SIGN_GRID_CACHE.get(key)
    if sg is None:
        sg = culling.build_sign_grid(ta, tb, tc, valid)
        if len(_SIGN_GRID_CACHE) >= _SIGN_GRID_CACHE_MAX:
            _SIGN_GRID_CACHE.pop(next(iter(_SIGN_GRID_CACHE)))
        _SIGN_GRID_CACHE[key] = sg
    return sg


#: Content-hashed cache of Morton block indexes (the culled kernel's
#: per-mesh spatial structure, ≙ the reference's R-tree bulk_load).
_BLOCK_INDEX_CACHE: dict = {}
_BLOCK_INDEX_CACHE_MAX = 4

#: Content-hashed cache of per-axis 2-D parity bins (exact raycast sign
#: without the O(Q·T) sweep, ≙ the BVH the reference builds once per mesh).
_PARITY_BINS_CACHE: dict = {}
_PARITY_BINS_CACHE_MAX = 4


def _parity_bins_cached(ta, tb, tc, n_tris: int):
    import zlib

    from .ops import culling

    key = (
        zlib.adler32(np.asarray(ta[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tb[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tc[:n_tris]).tobytes()),
        int(n_tris),
        "pb",
    )
    pb = _PARITY_BINS_CACHE.get(key)
    if pb is None:
        pb = tuple(
            culling.build_parity_bins(ta, tb, tc, axis, n_valid=n_tris)
            for axis in range(3)
        )
        # Upload once: reuse across calls without re-staging the tables.
        pb = tuple(
            culling.ParityBins(
                jnp.asarray(b.table), jnp.asarray(b.lo2),
                jnp.asarray(b.inv_ts), b.g,
            )
            for b in pb
        )
        if len(_PARITY_BINS_CACHE) >= _PARITY_BINS_CACHE_MAX:
            _PARITY_BINS_CACHE.pop(next(iter(_PARITY_BINS_CACHE)))
        _PARITY_BINS_CACHE[key] = pb
    return pb


def _block_index_cached(ta, tb, tc, n_tris: int):
    import zlib

    from .ops.kernels import pallas_culled

    key = (
        zlib.adler32(np.asarray(ta[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tb[:n_tris]).tobytes()),
        zlib.adler32(np.asarray(tc[:n_tris]).tobytes()),
        int(n_tris),
        "bi",
    )
    bi = _BLOCK_INDEX_CACHE.get(key)
    if bi is None:
        bi = pallas_culled.build_block_index(
            np.asarray(ta[:n_tris]), np.asarray(tb[:n_tris]),
            np.asarray(tc[:n_tris]),
        )
        if len(_BLOCK_INDEX_CACHE) >= _BLOCK_INDEX_CACHE_MAX:
            _BLOCK_INDEX_CACHE.pop(next(iter(_BLOCK_INDEX_CACHE)))
        _BLOCK_INDEX_CACHE[key] = bi
    return bi


def generate_sdf(
    vertices,
    topology: Optional[Topology],
    query_points,
    acceleration: Union[AccelerationMethod, Strategy, None] = None,
    *,
    sign_method: Optional[SignMethod] = None,
    raycast_axes: int = 3,
    tri_block: int = brute.DEFAULT_TRI_BLOCK,
    query_chunk: int = brute.DEFAULT_QUERY_CHUNK,
) -> jax.Array:
    """Signed distance at each query point (positive outside, negative inside).

    Mirrors `mesh_to_sdf/src/lib.rs:291-311`. ``raycast_axes``: 3 (default)
    votes best-of-3 like the reference Bvh/RtreeBvh backends
    (`bvh.rs:133-139`); 1 casts only +X like the ``None`` backend
    (`default.rs:36`).

    Returns a (Q,) float32 JAX array in the same order as ``query_points``.
    """
    strategy, sign = _resolve(acceleration, sign_method)
    q = as_points(query_points)
    Q = q.shape[0]
    if Q == 0:
        return jnp.zeros((0,), jnp.float32)

    ta, tb, tc, valid, n_tris = prepare_triangles(vertices, topology, tri_block)

    if strategy == Strategy.AUTO:
        strategy = _auto_strategy()
        if (strategy == Strategy.PALLAS and sign == SignMethod.RAYCAST
                and Q >= SIGN_GRID_MIN_QUERIES and n_tris >= 32768):
            # Large batches on big meshes: the culled engine (block kernel +
            # sign-grid transfer) beats the O(Q·T) fused sweep — measured
            # 2.4 s vs 3.9 s at 1M queries × 95k tris (BENCH.md); at small
            # triangle counts the fused sweep's O(Q·T) is already cheap.
            strategy = Strategy.CULLED

    if strategy == Strategy.PALLAS and n_tris > 0:
        from .ops.kernels import pallas_sdf

        qj = jnp.asarray(q)
        # The kernel does its own tail padding (PAD_COORD sentinel); strip the
        # zero-triangle padding added for the XLA path. Off-TPU, run the
        # kernel through the Pallas interpreter (slow but correct).
        interp = jax.default_backend() != "tpu"
        ra, rb, rc = ta[:n_tris], tb[:n_tris], tc[:n_tris]
        if sign == SignMethod.NORMAL:
            return pallas_sdf.sdf_normal_pallas(
                qj, ra, rb, rc, interpret=interp
            )[:Q]
        return pallas_sdf.sdf_raycast_pallas(
            qj, ra, rb, rc, raycast_axes=raycast_axes, interpret=interp
        )[:Q]

    if strategy == Strategy.CULLED and n_tris > 0:
        from .ops import culling

        sign_grid = None
        block_index = None
        parity_bins = None
        if (sign == SignMethod.RAYCAST and n_tris > 2 * culling.DEFAULT_K
                and Q >= SIGN_GRID_MIN_QUERIES):
            # Per-mesh cached sign structures (≙ the reference's BVH build
            # phase, `rtree_bvh.rs:108-119`): the coarse sign grid anchors
            # every query's sign (transfer for far queries; fused anchor-
            # segment parity in the block kernel for the shell). Small
            # batches keep the per-query sweep (the builds wouldn't
            # amortize).
            sign_grid = _sign_grid_cached(ta, tb, tc, valid, n_tris)
            # Exact tile-binned parity tables (cached per mesh): used as the
            # whole-batch sign pass for small batches (≤ PARITY_ALL_MAX) and
            # as the near-shell fallback of the sign-grid transfer otherwise
            # (culling.query_sdf_culled / signs_from_grid).
            parity_bins = _parity_bins_cached(ta, tb, tc, n_tris)
            if jax.default_backend() == "tpu":
                # Morton block index (≙ R-tree bulk_load) feeding the
                # scalar-prefetch distance kernel.
                block_index = _block_index_cached(ta, tb, tc, n_tris)
        return culling.query_sdf_culled(
            jnp.asarray(q), ta, tb, tc, valid,
            sign_method=sign, raycast_axes=raycast_axes,
            n_valid_tris=n_tris, sign_grid=sign_grid,
            block_index=block_index, parity_bins=parity_bins,
        )[:Q]

    chunk = min(query_chunk, max(Q, 1))
    qpad = (-Q) % chunk
    if qpad:
        q = np.concatenate([q, np.zeros((qpad, 3), np.float32)])

    out = brute.sdf_brute(
        jnp.asarray(q), ta, tb, tc, valid,
        sign_method=sign,
        raycast_axes=raycast_axes if sign == SignMethod.RAYCAST else 0,
        tri_block=tri_block,
        query_chunk=chunk,
    )
    return out[:Q]
