"""Scalar-prefetch Pallas kernel: block-culled distances for query tiles.

The TPU-native completion of the reference's R-tree branch-and-bound
(`bvh_ext.rs:59-168`, `rtree.rs:96-126`): triangles are Morton-sorted into
spatially-coherent BLOCKS of ``TB`` (default 256); an XLA phase selects, per
SUB-TILE of ``st`` Morton-sorted queries (default 128), the ``nb_sub``
candidate blocks with the smallest EXACT min triangle distance from the
sub-tile center (one fused (sub-tiles × T) closest-point sweep — 1/st of
the brute work); the per-kernel-
tile (``qt`` = 1024 queries) UNION of its sub-tiles' candidates is deduped
(duplicates → the pad block, sorted last so consecutive identical block
indices skip both the DMA and, via ``pl.when``, the compute). The kernel
walks ``grid=(tile, slot)`` with the triangle-block row coming from a
scalar-prefetched table — each candidate block is DMA'd to VMEM once per
TILE and shared by all 1024 queries, instead of per-query gathers (the XLA
formulation's bandwidth wall, see BENCH.md).

Sub-tile granularity + exact bounds are the round-3 fix for the
certificate pass rate: the round-2 kernel selected candidates per
1024-query tile by BOX distance, whose excluded bound collapses to zero
wherever Morton-block AABBs overlap the tile (measured 70-88% failures →
the dense-recompute tail dominated, BENCH_r02). With 128-query sub-tiles
the center distance shrinks ~2×, the bound uses exact triangle distances
(strictly positive off-surface), and it is measured against the TILE union
(strictly larger excluded set ⇒ strictly tighter bound).

Exactness is certified POST-HOC per query: every triangle in an excluded
block satisfies ``d(q, tri) ≥ d(c_s, tri) − |q − c_s| ≥ lb_excluded(s) −
|q − c_s|`` (``lb_excluded(s)`` = the smallest box-distance lower bound from
sub-tile center ``c_s`` among blocks NOT in the tile's union), so a computed
``d_q`` at or below that certificate cannot be beaten; queries failing it
are recomputed densely by the caller.
"""
from __future__ import annotations

import functools
import os
import zlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import F32_MAX
from .pallas_sdf import PAD_COORD, _closest_point_vw, _dist2

#: Queries per kernel tile. 1-D Pallas blocks must be 1024-multiples
#: (Mosaic T(1024) layout).
DEFAULT_QT = 1024
#: Queries per phase-A sub-tile (must divide DEFAULT_QT).
DEFAULT_ST = 128
#: Candidate-block CAPACITY per sub-tile (slots actually filled =
#: min(n_within, this) — see select_blocks).
DEFAULT_NB_SUB = 48
#: Cap on distinct union slots per kernel tile (bounds the scalar-prefetch
#: table in SMEM); overflowing tiles keep their nearest blocks and rely on
#: the per-query certificate for the rest.
DEFAULT_NB_TABLE = 256
#: Triangles per Morton block. Lane-dim slices must be 128-multiples.
TB = 256

#: Phase-A block bound: "csphere" (per-triangle centroid−circumradius
#: lower bound, ~6× cheaper) or "exact" (closest-point ladder). Read at
#: import; certificates keep either choice exact-or-flagged.
PHASE_A = os.environ.get("M2S_PHASE_A", "csphere")

#: Hierarchical phase A (coarse block-AABB pruning → fine per-triangle
#: csphere bounds on the nearest HIER_C blocks only) kicks in at or above
#: this block count — i.e. meshes over ~128k triangles. Below it the flat
#: O(n_sub·T) sweep is already a small fraction of kernel time.
HIER_MIN_BLOCKS = 512
#: Fine-level candidate window per sub-tile. Must be ≥ nb_sub; blocks the
#: coarse level prunes contribute their (coarse) AABB bound to the
#: certificate, so exactness never depends on the window size.
HIER_C = 96


@dataclass(frozen=True)
class BlockIndex:
    """Per-mesh spatial block structure (host-built, device-resident).

    rows: (B+1, 9·tb/128, 128) f32 — Morton-ordered triangle planes packed
    one row per block: [ax | ay | az | abx | aby | abz | acx | acy | acz],
    each segment ``tb`` wide; one extra all-PAD row at index B (so a single
    row-DMA fetches a whole block). planes9: (9, B·tb) f32 vertex
    coordinate planes (ax ay az bx by bz cx cy cz, PAD_COORD tail) — phase
    A computes EXACT per-block min distances from them (box-distance
    bounds are useless here: Morton block AABBs overlap so heavily near
    the surface that the excluded-block bound saturates at zero, measured
    70-88%% certificate failures; and component planes avoid the (·,·,3)
    minor-dim tile-padding blowup, memory `tpu-layout-rules`).
    lo/hi: (B, 3) block AABBs over REAL triangles; n_blocks: B; tb:
    triangles per block.
    """

    rows: object
    planes9: object
    lo: object
    hi: object
    n_blocks: int
    tb: int
    #: Cheap mesh-content hash (adler32 of the block AABBs) — distinguishes
    #: meshes with equal block counts in host-side caches (route cache).
    content_key: int = 0


def build_block_index(ta, tb, tc, *, block: int = TB) -> BlockIndex:
    """Morton-sort triangles, pack ``block``-sized rows (host numpy in →
    device arrays out). ≙ the reference's `RTree::bulk_load`
    (`rtree.rs:96-126`) — a spatial index built once per mesh."""
    ta = np.asarray(ta, np.float32)
    tb = np.asarray(tb, np.float32)
    tc = np.asarray(tc, np.float32)
    T = len(ta)
    cent = (ta + tb + tc) / 3.0
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    scale = np.where(hi > lo, 1024.0 / (hi - lo), 0.0)
    q = np.clip((cent - lo) * scale, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    order = np.argsort(code, kind="stable")
    ta, tb, tc = ta[order], tb[order], tc[order]

    # Edge planes (ab, ac) come from REAL vertices; pad rows get a=PAD with
    # ZERO edges (a far degenerate point — the same convention as
    # pallas_sdf._prep; computing edges from padded vertices makes ±1e18
    # edge vectors whose products overflow to inf/nan in the kernel).
    ab_r = tb - ta
    ac_r = tc - ta
    pad = (-T) % block
    if pad:
        ta_p = np.concatenate([ta, np.full((pad, 3), PAD_COORD, np.float32)])
        ab_p = np.concatenate([ab_r, np.zeros((pad, 3), np.float32)])
        ac_p = np.concatenate([ac_r, np.zeros((pad, 3), np.float32)])
    else:
        ta_p, ab_p, ac_p = ta, ab_r, ac_r
    B = len(ta_p) // block

    # Block AABBs over REAL triangles only.
    tri_lo = np.minimum(np.minimum(ta, tb), tc)
    tri_hi = np.maximum(np.maximum(ta, tb), tc)
    blk_of = np.arange(T) // block
    lo_b = np.full((B, 3), np.inf, np.float32)
    hi_b = np.full((B, 3), -np.inf, np.float32)
    np.minimum.at(lo_b, blk_of, tri_lo)
    np.maximum.at(hi_b, blk_of, tri_hi)

    # Pack plane rows: (B+1, 9·block/128, 128) — Mosaic block specs require
    # the last two dims be (divisible by 8, divisible by 128) OR equal to
    # the array dims, so a (1, row, lane) block covering the FULL trailing
    # dims is the one legal single-row shape. One extra all-pad row at
    # index B. Plane k occupies sub-rows [k·block/128, (k+1)·block/128).
    if block % 128:
        raise ValueError(f"block={block} must be a multiple of 128")
    rows = np.empty((B + 1, 9 * block), np.float32)
    for k, (arr, padval) in enumerate(
        [(ta_p[:, 0], PAD_COORD), (ta_p[:, 1], PAD_COORD),
         (ta_p[:, 2], PAD_COORD), (ab_p[:, 0], 0.0), (ab_p[:, 1], 0.0),
         (ab_p[:, 2], 0.0), (ac_p[:, 0], 0.0), (ac_p[:, 1], 0.0),
         (ac_p[:, 2], 0.0)]
    ):
        rows[:B, k * block:(k + 1) * block] = arr.reshape(B, block)
        rows[B, k * block:(k + 1) * block] = padval
    tb_p = ta_p + ab_p
    tc_p = ta_p + ac_p
    planes9 = np.stack([
        ta_p[:, 0], ta_p[:, 1], ta_p[:, 2],
        tb_p[:, 0], tb_p[:, 1], tb_p[:, 2],
        tc_p[:, 0], tc_p[:, 1], tc_p[:, 2],
    ])
    return BlockIndex(
        rows=jnp.asarray(rows.reshape(B + 1, 9 * block // 128, 128)),
        planes9=jnp.asarray(planes9),
        lo=jnp.asarray(lo_b),
        hi=jnp.asarray(hi_b),
        n_blocks=B,
        tb=block,
        content_key=zlib.adler32(lo_b.tobytes() + hi_b.tobytes()),
    )


def _phase_a_hier(centers, bi: BlockIndex, *, c: int):
    """Coarse→fine phase A for large meshes (≥ ``HIER_MIN_BLOCKS`` blocks).

    Coarse level: box distance from each sub-tile center to every block
    AABB — O(n_sub·B), the Morton-block analog of descending the R-tree's
    upper levels (`bvh_ext.rs:102-168`) — keeps only the ``c`` nearest
    blocks per center. Fine level: per-triangle centroid−circumradius
    bounds over ONLY the windowed blocks' triangles — O(n_sub·c·tb)
    instead of the flat path's O(n_sub·T), a T/(c·tb) reduction (≈40× at
    1M triangles with c=96, tb=256).

    Returns ``(lb_c, idx_c, lb_rest)``: fine bounds sorted ascending
    (n_sub, c); the block ids in that order; and the coarse bound on the
    nearest block OUTSIDE the window (n_sub,). Both bound kinds are true
    lower bounds on d(center, any triangle of the block) — every triangle
    lies inside its block AABB and inside its circumsphere — so the
    caller's certificate stays sound; near-surface centers where more
    than ``c`` block AABBs overlap merely degrade ``lb_rest`` toward 0
    (raising recompute-flag rates, never breaking exactness).
    """
    B = bi.n_blocks
    n_sub = centers.shape[0]
    tb = bi.tb
    cc = min(c, B - 1)

    # Coarse: center→AABB box distances, all blocks at once ((n_sub, B)
    # fits easily: 1M queries → 7.8k sub-tiles × 4k blocks = 125 MB f32).
    gap = jnp.maximum(
        jnp.maximum(bi.lo[None] - centers[:, None],
                    centers[:, None] - bi.hi[None]),
        0.0,
    )
    dbox = jnp.sqrt(jnp.sum(gap * gap, axis=-1))  # (n_sub, B)
    neg, idx = jax.lax.top_k(-dbox, cc + 1)
    lb_rest = -neg[:, cc]
    idx_c = idx[:, :cc]

    # Fine: csphere bounds over the windowed blocks' triangles. Row-gather
    # whole (tb,)-rows per candidate block (scalar gathers are the measured
    # TPU anti-pattern, memory `tpu-layout-rules`), chunked over sub-tiles
    # to bound the (chunk, cc, tb) intermediate.
    p9 = bi.planes9
    cen = ((p9[0:3] + p9[3:6] + p9[6:9]) * (1.0 / 3.0)).reshape(3, B, tb)
    rad = jnp.sqrt(
        jnp.maximum(
            jnp.sum((p9[0:3].reshape(3, B, tb) - cen) ** 2, axis=0),
            jnp.maximum(
                jnp.sum((p9[3:6].reshape(3, B, tb) - cen) ** 2, axis=0),
                jnp.sum((p9[6:9].reshape(3, B, tb) - cen) ** 2, axis=0),
            ),
        )
    )  # (B, tb)

    chunk = max(1, min(256, n_sub))
    pad_rows = (-n_sub) % chunk
    c_pad = jnp.pad(centers, ((0, pad_rows), (0, 0)), mode="edge")
    i_pad = jnp.pad(idx_c, ((0, pad_rows), (0, 0)), mode="edge")

    def body(arg):
        cs, ix = arg  # (chunk, 3), (chunk, cc)
        dx = cs[:, 0][:, None, None] - cen[0][ix]
        dy = cs[:, 1][:, None, None] - cen[1][ix]
        dz = cs[:, 2][:, None, None] - cen[2][ix]
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - rad[ix]
        return jnp.min(jnp.maximum(d, 0.0), axis=2)  # (chunk, cc)

    lbf = jax.lax.map(
        body,
        (c_pad.reshape(-1, chunk, 3), i_pad.reshape(-1, chunk, cc)),
    ).reshape(-1, cc)[:n_sub]

    ord_ = jnp.argsort(lbf, axis=1)
    lb_c = jnp.take_along_axis(lbf, ord_, axis=1)
    idx_sorted = jnp.take_along_axis(idx_c, ord_, axis=1)
    return lb_c, idx_sorted, lb_rest


def _phase_a_flat_lb(centers, bi: BlockIndex):
    """Per-block csphere lower bounds from each center — (n_sub, B).

    One fused (chunk × T) centroid−circumradius sweep segment-min'd per
    block (the flat phase A of :func:`select_blocks`, factored out)."""
    B = bi.n_blocks
    Tp = bi.planes9.shape[1]
    n_sub = centers.shape[0]
    chunk = min(256, n_sub)
    pad_rows = (-n_sub) % chunk
    c_pad = jnp.pad(centers, ((0, pad_rows), (0, 0)), mode="edge")
    p9 = bi.planes9
    cen = (p9[0:3] + p9[3:6] + p9[6:9]) * (1.0 / 3.0)
    rad = jnp.sqrt(
        jnp.maximum(
            jnp.sum((p9[0:3] - cen) ** 2, axis=0),
            jnp.maximum(
                jnp.sum((p9[3:6] - cen) ** 2, axis=0),
                jnp.sum((p9[6:9] - cen) ** 2, axis=0),
            ),
        )
    )

    def body(c_chunk):
        dx = c_chunk[:, 0][:, None] - cen[0][None, :]
        dy = c_chunk[:, 1][:, None] - cen[1][None, :]
        dz = c_chunk[:, 2][:, None] - cen[2][None, :]
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - rad[None, :]
        d = jnp.maximum(d, 0.0)
        return jnp.min(d.reshape(chunk, B, Tp // B), axis=2)

    return jax.lax.map(body, c_pad.reshape(-1, chunk, 3)).reshape(-1, B)[
        :n_sub
    ]


def _phase_a_topk(centers, r_s, bi: BlockIndex, *, kg: int):
    """Per-sub-tile ``kg`` nearest blocks + excluded lower bound.

    The phase-A front end of the gathered dense engine
    (culling._culled_gather_signed_impl). Returns (idx (n_sub, kg) int32;
    lb_excl (n_sub,) f32 — a true lower bound on d(center, tri) over every
    triangle of every NON-selected block). Small meshes rank all blocks by
    the fine csphere bound; large ones go coarse (block-AABB box distance)
    → fine over a ``max(kg+1, HIER_C)`` window (≙ R-tree descent,
    `bvh_ext.rs:102-168`).

    The window is always FILLED: all ``kg`` nearest blocks are kept, not
    just those within ``dmin + 2·r_s``. The dense body's cost is static
    (kg·tb pairs per query either way — unused slots would evaluate the
    pad block), so keeping fewer blocks can only weaken BOTH the distance
    (fewer candidates) and the certificate (``lb_excl`` collapses to the
    bound edge — measured 27% round-1 flag rate on scattered_1M, r_s-slack
    marginal exactly where block distances cluster within the Morton-tile
    radius). ``r_s`` is unused now but kept in the signature: the
    certificate slack it describes is applied by the CALLER per query
    (``cert = lb_excl − |q − c_s|``).
    """
    del r_s
    B = bi.n_blocks
    n_sub = centers.shape[0]
    if B <= kg:
        idx = jnp.broadcast_to(
            jnp.arange(kg, dtype=jnp.int32)[None, :], (n_sub, kg)
        )
        idx = jnp.where(idx < B, idx, B)
        return idx, jnp.full((n_sub,), F32_MAX, jnp.float32)

    c_win = max(kg + 1, HIER_C)
    if B > 2 * c_win:
        lb_s, idx_s, lb_rest = _phase_a_hier(centers, bi, c=c_win)
    else:
        lb = _phase_a_flat_lb(centers, bi)
        m = min(B, c_win)
        neg, idx_s = jax.lax.top_k(-lb, m)
        lb_s = -neg
        lb_rest = (
            -jax.lax.top_k(-lb, m + 1)[0][:, m]
            if m < B else jnp.full((n_sub,), F32_MAX, jnp.float32)
        )
    m = lb_s.shape[1]

    idx_kg = idx_s[:, :kg].astype(jnp.int32)
    # First excluded bound: the (kg+1)-th in-window bound, floored by the
    # out-of-window bound (kg < m always, since m = max(kg+1, HIER_C)).
    lb_excl = jnp.minimum(lb_s[:, kg], lb_rest)
    return idx_kg, lb_excl


@functools.partial(
    jax.jit, static_argnames=("nb_sub", "st", "qt", "nb_table")
)
def select_blocks(q_pad, bi: BlockIndex, *, nb_sub: int = DEFAULT_NB_SUB,
                  st: int = DEFAULT_ST, qt: int = DEFAULT_QT,
                  nb_table: int = DEFAULT_NB_TABLE):
    """Phase A: per-sub-tile nearest candidate blocks → per-tile union table.

    q_pad: (Qp, 3) Morton-sorted queries, Qp % qt == 0, qt % st == 0.
    Returns (tbl (Qp/qt, (qt/st)·nb_sub) int32 — sorted, duplicates and
    unused slots = ``bi.n_blocks`` (the pad row); lb_excl (Qp/st,) f32 —
    per sub-tile, the min EXACT triangle distance from its center to any
    block NOT in its tile's union; centers (Qp/st, 3)).
    """
    Qp = q_pad.shape[0]
    n_sub = Qp // st
    n_qt = Qp // qt
    spt = qt // st
    B = bi.n_blocks

    subs = q_pad.reshape(n_sub, st, 3)
    smin = jnp.min(subs, axis=1)
    smax = jnp.max(subs, axis=1)
    centers = (smin + smax) * 0.5
    r_s = jnp.linalg.norm((smax - smin) * 0.5, axis=-1)

    hier = B >= max(HIER_MIN_BLOCKS, 2 * HIER_C) and PHASE_A != "exact"
    if hier:
        # Large meshes: coarse→fine phase A — O(n_sub·(B + HIER_C·tb))
        # instead of O(n_sub·T) (VERDICT r4: hierarchical block selection).
        lb_c, idx_c, lb_rest = _phase_a_hier(centers, bi, c=HIER_C)
        k_sel = min(nb_sub, HIER_C)
        idx = idx_c[:, :k_sel]
        dmin = lb_c[:, 0]
        n_within = jnp.sum(
            lb_c <= (dmin + 2.0 * r_s)[:, None], axis=1
        )
        keep = jnp.arange(k_sel)[None, :] < jnp.maximum(n_within, 1)[:, None]
        idx = jnp.where(keep, idx, B)
        ids = idx.reshape(n_qt, spt * k_sel)
        ids = jnp.sort(ids, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((n_qt, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1
        )
        tbl = jnp.sort(jnp.where(dup, B, ids), axis=1)
        if tbl.shape[1] > nb_table:
            tbl = tbl[:, :nb_table]
        # Excluded bound: fine csphere bounds for the HIER_C window (masked
        # by tile-union membership), coarse AABB bound ``lb_rest`` for every
        # block beyond it (conservative: union blocks beyond the window
        # needn't be excluded, but including them only tightens downward —
        # always sound, certificate-flagged queries recompute densely).
        in_union = (
            jnp.zeros((n_qt, B + 1), bool)
            .at[jnp.arange(n_qt)[:, None], tbl]
            .set(True)
        )
        tile_of = jnp.repeat(jnp.arange(n_qt), spt)
        m = in_union[tile_of[:, None], idx_c]  # (n_sub, HIER_C)
        lb_excl = jnp.minimum(
            jnp.min(jnp.where(m, F32_MAX, lb_c), axis=1, initial=F32_MAX),
            lb_rest,
        )
        return tbl.astype(jnp.int32), lb_excl, centers

    # Per-block min TRIANGLE-distance lower bound from each sub-tile
    # center, one fused (chunk × T) sweep segment-min'd per block —
    # O(n_sub·T), the 1/st fraction of brute work that makes culling pay.
    # Box-distance bounds over whole blocks are NOT usable here: Morton
    # block AABBs overlap so much near the surface that the excluded
    # bound collapses to 0 (measured 70-88% certificate failures). The
    # default per-TRIANGLE centroid−circumradius bound
    # (|c − centroid| − r ≤ d(c, tri)) is ~6× cheaper than the exact
    # closest-point ladder and within 2·r_tri of it (tiny for dense
    # meshes); exactness never depends on it — looser bounds only raise
    # the certificate-flag rate. M2S_PHASE_A=exact restores the ladder.
    Tp = bi.planes9.shape[1]
    chunk = min(256, n_sub)
    pad_rows = (-n_sub) % chunk
    c_pad = jnp.pad(centers, ((0, pad_rows), (0, 0)), mode="edge")
    v9 = bi.planes9[:, None, :]  # (9, 1, Tp) — component planes

    if PHASE_A == "exact":
        from .pallas_sweep import _pt_dist

        def body(c_chunk):
            d = _pt_dist(
                c_chunk[:, 0][:, None], c_chunk[:, 1][:, None],
                c_chunk[:, 2][:, None], v9,
            )  # (chunk, Tp)
            return jnp.min(d.reshape(chunk, B, Tp // B), axis=2)
    else:
        p9 = bi.planes9
        cen = (p9[0:3] + p9[3:6] + p9[6:9]) * (1.0 / 3.0)  # (3, Tp)
        rad = jnp.sqrt(
            jnp.maximum(
                jnp.sum((p9[0:3] - cen) ** 2, axis=0),
                jnp.maximum(
                    jnp.sum((p9[3:6] - cen) ** 2, axis=0),
                    jnp.sum((p9[6:9] - cen) ** 2, axis=0),
                ),
            )
        )

        def body(c_chunk):
            dx = c_chunk[:, 0][:, None] - cen[0][None, :]
            dy = c_chunk[:, 1][:, None] - cen[1][None, :]
            dz = c_chunk[:, 2][:, None] - cen[2][None, :]
            d = jnp.sqrt(dx * dx + dy * dy + dz * dz) - rad[None, :]
            d = jnp.maximum(d, 0.0)
            return jnp.min(d.reshape(chunk, B, Tp // B), axis=2)

    lb = jax.lax.map(body, c_pad.reshape(-1, chunk, 3)).reshape(-1, B)[:n_sub]

    k_sel = min(nb_sub, B)
    _, idx = jax.lax.top_k(-lb, k_sel)  # (n_sub, k_sel) nearest blocks

    # A-priori exactness requirement (triangle inequality, ≙ the r-tree's
    # branch-and-bound frontier): a block with D[s,b] > dmin_s + 2·r_s
    # cannot hold the winner for ANY q in the sub-tile. Keep only
    # min(n_within, k_sel) slots — sub-tiles in easy regions contribute
    # 1-3 blocks instead of k_sel, which both shrinks the union (kernel
    # compute) and ENLARGES the excluded set (tighter certificates).
    dmin = jnp.min(lb, axis=1)
    n_within = jnp.sum(lb <= (dmin + 2.0 * r_s)[:, None], axis=1)
    keep = jnp.arange(k_sel)[None, :] < jnp.maximum(n_within, 1)[:, None]
    idx = jnp.where(keep, idx, B)

    # Tile union: collect sub-tile selections, sort, dedup → pad id B.
    # Distinct slots beyond ``nb_table`` are truncated (SMEM bound). The
    # table is sorted by BLOCK INDEX, so truncation keeps the lowest-indexed
    # blocks, not the nearest ones; exactness still holds because the
    # per-query certificate is computed from the FINAL table (dropped blocks
    # join the excluded set), but overflow tiles may flood the flag path.
    ids = idx.reshape(n_qt, spt * k_sel)
    ids = jnp.sort(ids, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n_qt, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1
    )
    tbl = jnp.sort(jnp.where(dup, B, ids), axis=1)
    if tbl.shape[1] > nb_table:
        tbl = tbl[:, :nb_table]

    # Excluded lower bound vs the UNION (strictly tighter than the
    # (nb_sub+1)-th own candidate: the union excludes fewer blocks).
    in_union = (
        jnp.zeros((n_qt, B + 1), bool)
        .at[jnp.arange(n_qt)[:, None], tbl]
        .set(True)[:, :B]
    )
    lb_masked = jnp.where(jnp.repeat(in_union, spt, axis=0), F32_MAX, lb)
    lb_excl = jnp.min(lb_masked, axis=1, initial=F32_MAX)
    return tbl.astype(jnp.int32), lb_excl, centers


def _kernel_culled(tbl_ref, *refs, tb: int, n_blocks: int, with_sign: bool):
    if with_sign:
        (qx_ref, qy_ref, qz_ref, sx_ref, sy_ref, sz_ref, t_ref,
         d2_ref, cnt_ref) = refs
    else:
        qx_ref, qy_ref, qz_ref, t_ref, d2_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    slot = tbl_ref[i, j]

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref[:], F32_MAX)
        if with_sign:
            cnt_ref[:] = jnp.zeros_like(cnt_ref[:])

    # Pad slots (sorted last): their DMA is skipped by index-revisiting and
    # their compute by this predicate. Slot 0 is always a real block.
    @pl.when(slot != n_blocks)
    def _():
        # 2-D pair math over 128-lane sub-rows of the block (Mosaic
        # supports the 1-D→2-D trailing-singleton expand; 3-D broadcasts
        # of 1-D vectors are an unsupported shape cast).
        qx = qx_ref[:][:, None]
        qy = qy_ref[:][:, None]
        qz = qz_ref[:][:, None]
        if with_sign:
            # Segment direction toward the query's sign-anchor (its sign-
            # grid cell center): the SAME resident triangles yield both the
            # distance and the segment-crossing parity — no separate sign
            # pass over the soup.
            dxx = sx_ref[:][:, None] - qx
            dyy = sy_ref[:][:, None] - qy
            dzz = sz_ref[:][:, None] - qz
        r = tb // 128
        run = None
        run_c = None
        for s in range(r):
            def plane(k, s=s):
                return t_ref[0, k * r + s, :][None, :]  # (1, 128)

            ax, ay, az = plane(0), plane(1), plane(2)
            abx, aby, abz = plane(3), plane(4), plane(5)
            acx, acy, acz = plane(6), plane(7), plane(8)
            ap = (qx - ax, qy - ay, qz - az)
            v, w, d1, d2_, A, B_, C = _closest_point_vw(
                *ap, abx, aby, abz, acx, acy, acz
            )
            d2pair = _dist2(*ap, v, w, d1, d2_, A, B_, C)
            m = jnp.min(d2pair, axis=1)
            run = m if run is None else jnp.minimum(run, m)
            if with_sign:
                # Möller–Trumbore segment-triangle crossing, strict
                # interior (the reference's aligned test has the same
                # shared-edge blind spot, `geo.rs:156-216`).
                pvx = dyy * acz - dzz * acy
                pvy = dzz * acx - dxx * acz
                pvz = dxx * acy - dyy * acx
                det = abx * pvx + aby * pvy + abz * pvz
                inv = jnp.where(
                    det == 0.0, 0.0,
                    1.0 / jnp.where(det == 0.0, 1.0, det),
                )
                # tvec = q − a = ap; qvec = tvec × e1.
                u = (ap[0] * pvx + ap[1] * pvy + ap[2] * pvz) * inv
                qvx = ap[1] * abz - ap[2] * aby
                qvy = ap[2] * abx - ap[0] * abz
                qvz = ap[0] * aby - ap[1] * abx
                vv = (dxx * qvx + dyy * qvy + dzz * qvz) * inv
                tt = (acx * qvx + acy * qvy + acz * qvz) * inv
                hit = (
                    (det != 0.0) & (u > 0.0) & (vv > 0.0)
                    & (u + vv < 1.0) & (tt > 0.0) & (tt < 1.0)
                )
                c = jnp.sum(hit.astype(jnp.int32), axis=1)
                run_c = c if run_c is None else run_c + c
        d2_ref[:] = jnp.minimum(d2_ref[:], run)
        if with_sign:
            cnt_ref[:] = cnt_ref[:] + run_c


@functools.partial(jax.jit, static_argnames=("qt", "interpret"))
def culled_dist_pallas(queries_sorted, bi: BlockIndex, tbl, *,
                       anchors=None, qt: int = DEFAULT_QT,
                       interpret: bool = False):
    """Min distance per (Morton-sorted, qt-padded) query via its tile's
    candidate blocks. queries_sorted: (Qp, 3) with Qp % qt == 0;
    tbl: (Qp//qt, NB) int32 (pad slots = bi.n_blocks, sorted last).

    ``anchors`` (Qp, 3): optional per-query segment endpoints (sign-grid
    cell centers) — the kernel then ALSO counts query→anchor segment
    crossings against the same resident blocks and returns
    (distances, counts); else just distances.
    """
    Qp = queries_sorted.shape[0]
    n_qt = Qp // qt
    nb = tbl.shape[1]
    tb = bi.tb
    with_sign = anchors is not None

    qx = queries_sorted[:, 0]
    qy = queries_sorted[:, 1]
    qz = queries_sorted[:, 2]

    qspec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(
        (1, 9 * tb // 128, 128),
        lambda i, j, tbl_ref: (tbl_ref[i, j], 0, 0),
        memory_space=pltpu.VMEM,
    )
    ospec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)

    n_q_in = 6 if with_sign else 3
    out_shapes = [jax.ShapeDtypeStruct((Qp,), jnp.float32)]
    if with_sign:
        out_shapes.append(jax.ShapeDtypeStruct((Qp,), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_qt, nb),
        in_specs=[qspec] * n_q_in + [tspec],
        out_specs=[ospec] * len(out_shapes),
        scratch_shapes=[],
    )
    args = [tbl, qx, qy, qz]
    if with_sign:
        args += [anchors[:, 0], anchors[:, 1], anchors[:, 2]]
    args.append(bi.rows)
    outs = pl.pallas_call(
        functools.partial(
            _kernel_culled, tb=tb, n_blocks=bi.n_blocks,
            with_sign=with_sign,
        ),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    if with_sign:
        return jnp.sqrt(outs[0]), outs[1]
    return jnp.sqrt(outs[0])


jax.tree_util.register_pytree_node(
    BlockIndex,
    lambda b: (
        (b.rows, b.planes9, b.lo, b.hi),
        (b.n_blocks, b.tb, b.content_key),
    ),
    lambda aux, ch: BlockIndex(
        rows=ch[0], planes9=ch[1], lo=ch[2], hi=ch[3],
        n_blocks=aux[0], tb=aux[1], content_key=aux[2]
    ),
)
