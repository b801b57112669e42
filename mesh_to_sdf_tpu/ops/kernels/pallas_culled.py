"""Scalar-prefetch Pallas kernel: block-culled distances for query tiles.

The TPU-native completion of the reference's R-tree branch-and-bound
(`bvh_ext.rs:59-168`, `rtree.rs:96-126`): triangles are Morton-sorted into
spatially-coherent BLOCKS of ``TB`` (default 256); an XLA phase selects, per
SUB-TILE of ``st`` Morton-sorted queries (default 128), the ``nb_sub``
candidate blocks with the smallest box-distance lower bound; the per-kernel-
tile (``qt`` = 1024 queries) UNION of its sub-tiles' candidates is deduped
(duplicates → the pad block, sorted last so consecutive identical block
indices skip both the DMA and, via ``pl.when``, the compute). The kernel
walks ``grid=(tile, slot)`` with the triangle-block row coming from a
scalar-prefetched table — each candidate block is DMA'd to VMEM once per
TILE and shared by all 1024 queries, instead of per-query gathers (the XLA
formulation's bandwidth wall, see BENCH.md).

Sub-tile granularity is the round-3 fix for the certificate pass rate: the
round-2 kernel selected candidates per 1024-query tile, whose radius at
scattered-query density made ``lb_excluded − |q − c|`` fail for most queries
near dense meshes (the dense-recompute tail then dominated, BENCH_r02).
With 128-query sub-tiles the center distance shrinks ~2× and the excluded
bound is measured per sub-tile against the TILE union (strictly larger
excluded set ⇒ strictly tighter bound).

Exactness is certified POST-HOC per query: every triangle in an excluded
block satisfies ``d(q, tri) ≥ d(c_s, tri) − |q − c_s| ≥ lb_excluded(s) −
|q − c_s|`` (``lb_excluded(s)`` = the smallest box-distance lower bound from
sub-tile center ``c_s`` among blocks NOT in the tile's union), so a computed
``d_q`` at or below that certificate cannot be beaten; queries failing it
are recomputed densely by the caller.
"""
from __future__ import annotations

import functools
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
#: Candidate blocks per sub-tile; the kernel table has (qt/st)·nb_sub slots.
DEFAULT_NB_SUB = 8
#: Triangles per Morton block. Lane-dim slices must be 128-multiples.
TB = 256


@dataclass(frozen=True)
class BlockIndex:
    """Per-mesh spatial block structure (host-built, device-resident).

    rows: (B+1, 9·tb) f32 — Morton-ordered triangle planes packed one row
    per block: [ax | ay | az | abx | aby | abz | acx | acy | acz], each
    segment ``tb`` wide; one extra all-PAD row at index B (so a single
    row-DMA fetches a whole block). lo/hi: (B, 3) block AABBs over REAL
    triangles; n_blocks: B; tb: triangles per block.
    """

    rows: object
    lo: object
    hi: object
    n_blocks: int
    tb: int


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

    # Pack plane rows: (B+1, 9·block), one extra all-pad row at index B.
    rows = np.empty((B + 1, 9 * block), np.float32)
    for k, (arr, padval) in enumerate(
        [(ta_p[:, 0], PAD_COORD), (ta_p[:, 1], PAD_COORD),
         (ta_p[:, 2], PAD_COORD), (ab_p[:, 0], 0.0), (ab_p[:, 1], 0.0),
         (ab_p[:, 2], 0.0), (ac_p[:, 0], 0.0), (ac_p[:, 1], 0.0),
         (ac_p[:, 2], 0.0)]
    ):
        rows[:B, k * block:(k + 1) * block] = arr.reshape(B, block)
        rows[B, k * block:(k + 1) * block] = padval
    return BlockIndex(
        rows=jnp.asarray(rows),
        lo=jnp.asarray(lo_b),
        hi=jnp.asarray(hi_b),
        n_blocks=B,
        tb=block,
    )


@functools.partial(jax.jit, static_argnames=("nb_sub", "st", "qt"))
def select_blocks(q_pad, bi: BlockIndex, *, nb_sub: int = DEFAULT_NB_SUB,
                  st: int = DEFAULT_ST, qt: int = DEFAULT_QT):
    """Phase A: per-sub-tile nearest candidate blocks → per-tile union table.

    q_pad: (Qp, 3) Morton-sorted queries, Qp % qt == 0, qt % st == 0.
    Returns (tbl (Qp/qt, (qt/st)·nb_sub) int32 — sorted, duplicates and
    unused slots = ``bi.n_blocks`` (the pad row); lb_excl (Qp/st,) f32 —
    per sub-tile, the min box-distance from its center to any block NOT in
    its tile's union; centers (Qp/st, 3)).
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

    # Box distance (iquilezles, ≙ `bvh_ext.rs:18-31`) per component —
    # never materialize an (n_sub, B, 3) minor-dim-3 tensor (tile-pads
    # 3 → 128 lanes; measured 42× HBM blowup, memory `tpu-layout-rules`).
    c = (bi.lo + bi.hi) * 0.5
    h = (bi.hi - bi.lo) * 0.5
    lb2 = jnp.zeros((n_sub, B), jnp.float32)
    for k in range(3):
        dk = jnp.maximum(
            jnp.abs(centers[:, k][:, None] - c[None, :, k]) - h[None, :, k],
            0.0,
        )
        lb2 = lb2 + dk * dk
    lb = jnp.sqrt(lb2)
    lb = jnp.where(jnp.isfinite(bi.lo[None, :, 0]), lb, F32_MAX)

    k_sel = min(nb_sub, B)
    _, idx = jax.lax.top_k(-lb, k_sel)  # (n_sub, k_sel) nearest blocks

    # Tile union: collect sub-tile selections, sort, dedup → pad id B.
    ids = idx.reshape(n_qt, spt * k_sel)
    ids = jnp.sort(ids, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n_qt, 1), bool), ids[:, 1:] == ids[:, :-1]], axis=1
    )
    tbl = jnp.sort(jnp.where(dup, B, ids), axis=1)

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


def _kernel_culled(tbl_ref, qx_ref, qy_ref, qz_ref, t_ref, d2_ref, *,
                   tb: int, n_blocks: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    slot = tbl_ref[i, j]

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref[:], F32_MAX)

    # Pad slots (sorted last): their DMA is skipped by index-revisiting and
    # their compute by this predicate. Slot 0 is always a real block.
    @pl.when(slot != n_blocks)
    def _():
        qx = qx_ref[:][:, None]
        qy = qy_ref[:][:, None]
        qz = qz_ref[:][:, None]

        def plane(k):
            return t_ref[0:1, k * tb:(k + 1) * tb]

        ax, ay, az = plane(0), plane(1), plane(2)
        abx, aby, abz = plane(3), plane(4), plane(5)
        acx, acy, acz = plane(6), plane(7), plane(8)
        ap = (qx - ax, qy - ay, qz - az)
        v, w, d1, d2_, A, B_, C = _closest_point_vw(
            *ap, abx, aby, abz, acx, acy, acz
        )
        d2pair = _dist2(*ap, v, w, d1, d2_, A, B_, C)
        d2_ref[:] = jnp.minimum(d2_ref[:], jnp.min(d2pair, axis=1))


@functools.partial(jax.jit, static_argnames=("qt", "interpret"))
def culled_dist_pallas(queries_sorted, bi: BlockIndex, tbl, *,
                       qt: int = DEFAULT_QT, interpret: bool = False):
    """Min distance per (Morton-sorted, qt-padded) query via its tile's
    candidate blocks. queries_sorted: (Qp, 3) with Qp % qt == 0;
    tbl: (Qp//qt, NB) int32 (pad slots = bi.n_blocks, sorted last).
    Returns (Qp,) f32 distances."""
    Qp = queries_sorted.shape[0]
    n_qt = Qp // qt
    nb = tbl.shape[1]
    tb = bi.tb

    qx = queries_sorted[:, 0]
    qy = queries_sorted[:, 1]
    qz = queries_sorted[:, 2]

    qspec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 9 * tb), lambda i, j, tbl_ref: (tbl_ref[i, j], 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_qt, nb),
        in_specs=[qspec] * 3 + [tspec],
        out_specs=[ospec],
        scratch_shapes=[],
    )
    (d2,) = pl.pallas_call(
        functools.partial(_kernel_culled, tb=tb, n_blocks=bi.n_blocks),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Qp,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tbl, qx, qy, qz, bi.rows)
    return jnp.sqrt(d2)


jax.tree_util.register_pytree_node(
    BlockIndex,
    lambda b: ((b.rows, b.lo, b.hi), (b.n_blocks, b.tb)),
    lambda aux, ch: BlockIndex(
        rows=ch[0], lo=ch[1], hi=ch[2], n_blocks=aux[0], tb=aux[1]
    ),
)
