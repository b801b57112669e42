"""Slab-streamed grid SDF: very large grids on one chip, bounded memory.

The CPT engine's full per-cell state (2 triangles × 9 vertex coords + ids)
is ~88 B/cell — a 512³ grid would need ~12 GB of state plus transposes,
beyond one chip's HBM. This pipeline streams x-slabs through the device the
way the distributed version shards them (parallel/grid_sharded.py):

- pass 1, left→right: CPT per slab, merging the previous slab's outgoing
  boundary slice; record each slab's right-edge state and its +x ray hit
  totals (per transverse line);
- pass 2, right→left: CPT per slab again (recompute beats storing 88 B/cell),
  merging the stored left-edge and the successor's outgoing right-edge; sign
  with y/z parity locally and +x parity from in-slab suffix counts plus the
  pass-1 totals of all later slabs (exact);
- distances stream to a host numpy array slab by slab.

One compiled program per pass shape serves every slab (the slab grid differs
only in its ``first_cell``, which is traced data).

Tunnel discipline (measured on the remote-TPU environment, ~10 MB/s
steady host↔device): ALL host prep — subdivision, per-slab seed bins,
per-slab parity line bins — is content-cached per (mesh, grid, slab_nx)
as DEVICE-resident arrays (``_STREAM_PREP_CACHE``), boundary-edge states
stay on device between the passes, and the per-slab output fetch runs one
slab BEHIND the compute so the D2H transfer overlaps the next slab's
passes. The round-4 measurement (scripts/exp_streamed_profile.py): of the
155 s warm 512³ run, ~134 s was host seed-bin rebuild, ~1 GB was per-slab
seed re-upload, and the 512 MB output fetch was serialized after compute.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .types import F32_MAX, SignMethod
from .ops import cpt as cpt_mod
from .ops import geometry, raycast as raycast_mod
from .ops.brute import pad_tri_blocks


def _empty_edge(ny, nz):
    return cpt_mod.CptState(
        jnp.full((ny, nz), F32_MAX, jnp.float32),
        jnp.full((ny, nz, 9), cpt_mod.PAD_COORD, jnp.float32),
        jnp.full((ny, nz), -1, jnp.int32),
        jnp.full((ny, nz), F32_MAX, jnp.float32),
        jnp.full((ny, nz, 9), cpt_mod.PAD_COORD, jnp.float32),
        jnp.full((ny, nz), -1, jnp.int32),
    )


def _state_from(dist, idx, ta, tb, tc):
    T = ta.shape[0]
    tv = jnp.concatenate([ta, tb, tc], axis=-1)
    tv = jnp.concatenate(
        [tv, jnp.full((1, 9), cpt_mod.PAD_COORD, jnp.float32)], axis=0
    )
    verts = tv[jnp.where(idx < 0, T, idx)]
    return cpt_mod.CptState(
        dist, verts, idx,
        jnp.full_like(dist, F32_MAX),
        jnp.full_like(verts, cpt_mod.PAD_COORD),
        jnp.full_like(idx, -1),
    )


def _x_sweeps(state, centers):
    out = cpt_mod._sweep_axis0(state, centers)
    rev = cpt_mod.CptState(*[getattr(out, n)[::-1] for n in out._fields])
    rev = cpt_mod._sweep_axis0(rev, centers[::-1])
    return cpt_mod.CptState(*[getattr(rev, n)[::-1] for n in rev._fields])


def _merge_edge(state, edge, position, centers_row):
    row = cpt_mod.CptState(*[getattr(state, n)[position] for n in state._fields])
    row = cpt_mod._merge_eval(row, edge.v1, edge.i1, centers_row)
    row = cpt_mod._merge_eval(row, edge.v2, edge.i2, centers_row)
    return cpt_mod.CptState(
        *[getattr(state, n).at[position].set(getattr(row, n))
          for n in state._fields]
    )


@functools.partial(
    jax.jit, static_argnames=("cell_count", "seed_rounds", "use_pallas")
)
def _slab_pass(first_cell, cell_size, cell_count, tris, left_edge, right_edge,
               seed_entry, seed_rows, seed_cellrow, seed_rounds: int,
               use_pallas: bool):
    """CPT on one slab with optional incoming boundary states (pass INF edges
    for "none"). Seeds come from host-binned gather lists (exact AABB±1
    coverage, ≙ gridgen._cpt_grid_signed); the Pallas VMEM-carry sweep
    kernel runs on TPU. Returns (state slab, right edge, left edge)."""
    slab = Grid(first_cell=first_cell, cell_size=cell_size,
                cell_count=cell_count)
    ta, tb, tc = tris[0], tris[1], tris[2]
    seed = cpt_mod.seed_from_bins(
        slab, ta, tb, tc,
        cpt_mod.SeedBins(seed_entry, seed_rows, seed_cellrow, seed_rounds),
    )
    if use_pallas:
        dist, idx = cpt_mod.closest_point_grid_pallas(
            slab, ta, tb, tc, seed=seed
        )
    else:
        dist, idx = cpt_mod.closest_point_grid(slab, ta, tb, tc, seed=seed)
    state = _state_from(dist, idx, ta, tb, tc)
    centers = slab.all_cell_centers()
    state = _merge_edge(state, left_edge, 0, centers[0])
    state = _merge_edge(state, right_edge, -1, centers[-1])
    if use_pallas:
        from .parallel.grid_sharded import _x_sweeps_pallas

        state = _x_sweeps_pallas(state, slab)
    else:
        state = _x_sweeps(state, centers)
    lo = cpt_mod.CptState(*[getattr(state, n)[0] for n in state._fields])
    hi = cpt_mod.CptState(*[getattr(state, n)[-1] for n in state._fields])
    return state, hi, lo


def build_slab_line_bins(grid: Grid, slab_nx: int, n_slabs: int,
                         oa_np, ob_np, oc_np):
    """Per-slab parity candidate tables (host-side, numpy in).

    Axis 0 (x rays): the (y, z) transverse lattice is identical for every
    slab — ONE table serves all. Axes 1/2 include the slab's x-range:
    per-slab tables, padded to a common width so one compiled program
    serves every slab. Returns a list of per-slab 3-tuples of LineBins.
    """
    from .ops.kernels import pallas_parity

    cell_count = (slab_nx,) + tuple(grid.cell_count[1:])

    def _host_slab(i):
        fc = np.asarray(grid.first_cell, np.float32) + np.asarray(
            [i * slab_nx, 0, 0], np.float32
        ) * np.asarray(grid.cell_size, np.float32)
        return Grid(first_cell=tuple(fc.tolist()),
                    cell_size=grid.cell_size, cell_count=cell_count)

    bins0 = pallas_parity.build_line_bins(
        _host_slab(0), 0, oa_np, ob_np, oc_np
    )
    per_axis = {1: [], 2: []}
    for i in range(n_slabs):
        hs = _host_slab(i)
        for ax in (1, 2):
            per_axis[ax].append(
                pallas_parity.build_line_bins(hs, ax, oa_np, ob_np, oc_np)
            )

    def _pad_common(bl):
        width = max(b.tbl.shape[1] for b in bl)
        out = []
        for b in bl:
            tbl = np.asarray(b.tbl)
            if tbl.shape[1] < width:
                tbl = np.concatenate(
                    [tbl, np.full((tbl.shape[0], width - tbl.shape[1]),
                                  b.n_blocks, np.int32)], axis=1
                )
            out.append(pallas_parity.LineBins(
                rows=b.rows, tbl=jnp.asarray(tbl), n_blocks=b.n_blocks,
                tb=b.tb, tile=b.tile, t1=b.t1, t2=b.t2,
            ))
        return out

    a1 = _pad_common(per_axis[1])
    a2 = _pad_common(per_axis[2])
    return [(bins0, a1[i], a2[i]) for i in range(n_slabs)]


@functools.partial(jax.jit, static_argnames=("cell_count", "use_pallas"))
def _slab_sign_raycast(first_cell, cell_size, cell_count, dist, orig,
                       use_pallas: bool = False, line_bins=None):
    """Sign one slab. All three parities are slab-local: rays cast from this
    slab's faces see the whole (replicated) mesh, so per-cell suffix counts
    are complete without any cross-slab bookkeeping. ``line_bins``: optional
    per-axis candidate-block tables (pallas_parity.build_line_bins) — at
    512³ a slab's x-parity alone is 512×512 lines, where the dense
    every-tile×every-block sweep dominates."""
    slab = Grid(first_cell=first_cell, cell_size=cell_size,
                cell_count=cell_count)
    if use_pallas:
        from .ops.kernels import pallas_parity

        inside, ovf = pallas_parity.grid_inside_mask_pallas(
            slab, orig[0], orig[1], orig[2], line_bins=line_bins,
            interpret=jax.default_backend() != "tpu",
        )
        return jnp.where(inside, -dist, dist), ovf
    oa, ob, oc = orig[0], orig[1], orig[2]
    valid = jnp.ones((oa.shape[0],), bool)
    oa_p, ob_p, oc_p, valid_p, blk = pad_tri_blocks(oa, ob, oc, valid, 256)
    odd_y = raycast_mod._axis_parity(slab, 1, oa_p, ob_p, oc_p, valid_p, blk, 1024)
    odd_z = raycast_mod._axis_parity(slab, 2, oa_p, ob_p, oc_p, valid_p, blk, 1024)

    slab_nx = cell_count[0]
    origins, lshape = raycast_mod.face_origins(slab, 0)
    inside2d, t = geometry.ray_triangle_aligned_2d(
        origins[:, None, :], oa_p[None], ob_p[None], oc_p[None], 0
    )
    hit = inside2d & (t > 0.0) & valid_p[None, :]
    csx = slab.cell_size[0]
    bucket = jnp.where(hit, jnp.floor(t / csx), jnp.inf)
    cell_f = jnp.arange(slab_nx, dtype=jnp.float32)
    srt = jnp.sort(bucket, axis=1)
    n_hits = jnp.sum(hit, axis=1).astype(jnp.int32)
    below = jax.vmap(
        lambda row: jnp.searchsorted(row, cell_f, side="left")
    )(srt).astype(jnp.int32)
    counts = n_hits[:, None] - below  # full suffix, complete per slab
    odd_x = raycast_mod.unrotate_axis(counts % 2 == 1, 0, lshape, slab_nx)
    votes = (
        odd_x.astype(jnp.int32) + odd_y.astype(jnp.int32) + odd_z.astype(jnp.int32)
    )
    return jnp.where(votes >= 2, -dist, dist), jnp.zeros((), jnp.int32)


class _StreamPrep(NamedTuple):
    """Device-resident per-(mesh, grid, slab_nx) prep for the streamed run.

    tris: (3, Ts, 3) subdivided soup; orig: (3, T, 3) original soup;
    seeds: per-slab (entry (K, R), rows_cell (R,), cell_row (N_slab,))
    device tuples, all padded to one common R so ONE compiled program
    serves every slab; n_shift_rounds: shared merge-round count;
    line_bins: per-slab parity candidate tables (TPU raycast only).
    """

    tris: object
    orig: object
    seeds: list
    n_shift_rounds: int
    line_bins: Optional[list]


#: Content-keyed prep cache (≙ gridgen._CPT_PREP_CACHE): the host binning
#: at 512³ measures ~2 min and its upload ~1 GB — once per (mesh, grid).
_STREAM_PREP_CACHE: dict = {}
_STREAM_PREP_CACHE_MAX = 2


def _stream_prep(grid: Grid, slab_nx: int, v_np, f_np,
                 want_line_bins: bool) -> _StreamPrep:
    import zlib

    nx, ny, nz = grid.cell_count
    n_slabs = nx // slab_nx
    key = (
        zlib.adler32(v_np.tobytes()),
        zlib.adler32(f_np.tobytes()),
        tuple(np.asarray(grid.first_cell, np.float32).tolist()),
        tuple(np.asarray(grid.cell_size, np.float32).tolist()),
        tuple(int(c) for c in grid.cell_count),
        slab_nx,
        want_line_bins,
    )
    hit = _STREAM_PREP_CACHE.get(key)
    if hit is not None:
        return hit

    cs = float(np.max(np.abs(np.asarray(grid.cell_size))))
    # Binned seeds have exact AABB±1 coverage for any triangle size; the
    # loose 8-cell cap only bounds the rasterized seed volume.
    ra, rb, rc = cpt_mod.subdivide_to_span(v_np, f_np, max_edge=8.0 * cs)
    tris = jnp.asarray(np.stack([ra, rb, rc]))
    oa_np = v_np[f_np[:, 0]]
    ob_np = v_np[f_np[:, 1]]
    oc_np = v_np[f_np[:, 2]]
    orig = jnp.asarray(np.stack([oa_np, ob_np, oc_np]))

    line_bins = None
    if want_line_bins:
        line_bins = build_slab_line_bins(
            grid, slab_nx, n_slabs, oa_np, ob_np, oc_np
        )

    # Per-slab seed bins, padded to a common row count and uploaded slab by
    # slab (NOT host-stacked like cpt.build_slab_seed_bins — at 512³ the
    # (n_slabs, …) assembly alone copies ~1 GB twice, measured ~58 s).
    fc = np.asarray(grid.first_cell, np.float32)
    csv = np.asarray(grid.cell_size, np.float32)
    host_bins = []
    for i in range(n_slabs):
        slab = Grid(
            first_cell=fc + np.asarray([i * slab_nx, 0, 0], np.float32) * csv,
            cell_size=csv,
            cell_count=(slab_nx, ny, nz),
        )
        host_bins.append(cpt_mod.build_seed_bins(
            slab, ra, rb, rc, k=8, pad=cpt_mod.seed_pad_for(grid)
        ))
    T = ra.shape[0]
    N_slab = slab_nx * ny * nz
    R_max = max(b.entry_tri.shape[1] for b in host_bins)
    n_rounds = max(b.n_shift_rounds for b in host_bins)
    seeds = []
    while host_bins:
        b = host_bins.pop(0)  # free host memory as we upload
        r = b.entry_tri.shape[1]
        if r < R_max:
            entry = np.full((b.entry_tri.shape[0], R_max), T, np.int32)
            entry[:, :r] = b.entry_tri
            rows = np.full((R_max,), N_slab, np.int32)
            rows[:r] = b.rows_cell
        else:
            entry, rows = b.entry_tri, b.rows_cell
        seeds.append((
            jax.block_until_ready(jnp.asarray(entry)),
            jax.block_until_ready(jnp.asarray(rows)),
            jax.block_until_ready(jnp.asarray(b.cell_row)),
        ))

    prep = _StreamPrep(tris, orig, seeds, n_rounds, line_bins)
    if len(_STREAM_PREP_CACHE) >= _STREAM_PREP_CACHE_MAX:
        _STREAM_PREP_CACHE.pop(next(iter(_STREAM_PREP_CACHE)))
    _STREAM_PREP_CACHE[key] = prep
    return prep


def generate_grid_sdf_streamed(
    vertices,
    faces,
    grid: Grid,
    sign_method: SignMethod = SignMethod.RAYCAST,
    *,
    slab_nx: Optional[int] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """`generate_grid_sdf` for grids too large for one resident CPT state.

    Returns a host numpy array, flat reference layout. ``slab_nx`` defaults
    to ≤64 slices per slab. ``out``: optional preallocated (nx·ny·nz,) or
    (nx, ny, nz) float32 array to stream into (avoids one allocation).
    """
    nx, ny, nz = grid.cell_count
    if slab_nx is None:
        slab_nx = min(64, nx)
    if nx % slab_nx:
        raise ValueError(f"nx={nx} must be a multiple of slab_nx={slab_nx}")
    n_slabs = nx // slab_nx
    cell_count = (slab_nx, ny, nz)

    v_np = np.asarray(vertices, np.float32)
    f_np = np.asarray(faces, np.int64)
    use_pallas = jax.default_backend() == "tpu"
    prep = _stream_prep(
        grid, slab_nx, v_np, f_np,
        want_line_bins=use_pallas and sign_method == SignMethod.RAYCAST,
    )
    tris, orig, slab_line_bins = prep.tris, prep.orig, prep.line_bins

    def slab_first(i):
        return grid.first_cell + jnp.asarray(
            [i * slab_nx, 0, 0], jnp.float32
        ) * grid.cell_size

    empty = _empty_edge(ny, nz)

    # Pass 1 (left→right): propagate boundary state; the right-edge states
    # stay ON DEVICE (n_slabs × ~6·(ny, nz) slices — ~20 MB each at 512³;
    # the old host round-trip cost 2 tunnel crossings per slab).
    right_edges = []
    carry = empty
    for i in range(n_slabs):
        _, hi, _lo = _slab_pass(
            slab_first(i), grid.cell_size, cell_count, tris, carry, empty,
            *prep.seeds[i], prep.n_shift_rounds, use_pallas,
        )
        right_edges.append(hi)
        carry = hi

    # Pass 2 (right→left): final state per slab; sign IN the loop. The
    # fetch runs ONE SLAB BEHIND the compute: while slab i's passes
    # execute, the (i+1)-th signed slab streams to the host — on the
    # remote-TPU tunnel the D2H transfer is the dominant cost and fully
    # overlaps the device work this way.
    out = (np.empty((nx, ny, nz), np.float32) if out is None
           else out.reshape(nx, ny, nz))
    carry = empty
    pending = None  # (slab index, signed device array, overflow scalar)

    def _drain(p):
        i, signed, ovf = p
        if ovf is not None and int(ovf) > 0:
            # Parity kernel dropped crossings — exact XLA re-sign.
            signed, _ = _slab_sign_raycast(
                slab_first(i), grid.cell_size, cell_count,
                jnp.abs(signed), orig, False,
            )
        out[i * slab_nx : (i + 1) * slab_nx] = np.asarray(signed)

    for i in reversed(range(n_slabs)):
        left = right_edges[i - 1] if i > 0 else empty
        state, _hi, lo = _slab_pass(
            slab_first(i), grid.cell_size, cell_count, tris, left, carry,
            *prep.seeds[i], prep.n_shift_rounds, use_pallas,
        )
        carry = lo

        if sign_method == SignMethod.RAYCAST:
            signed, ovf = _slab_sign_raycast(
                slab_first(i), grid.cell_size, cell_count, state.d1, orig,
                use_pallas,
                line_bins=slab_line_bins[i] if slab_line_bins else None,
            )
            ovf = ovf if use_pallas else None
        else:
            signed = cpt_mod.normal_sign_from_idx(
                Grid(first_cell=slab_first(i), cell_size=grid.cell_size,
                     cell_count=cell_count),
                tris[0], tris[1], tris[2], state.d1, state.i1,
            )
            ovf = None
        if pending is not None:
            _drain(pending)
        pending = (i, signed, ovf)
    if pending is not None:
        _drain(pending)

    return out.reshape(-1)
