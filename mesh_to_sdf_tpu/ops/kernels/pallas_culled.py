"""Scalar-prefetch Pallas kernel: block-culled distances for query tiles.

The TPU-native completion of the reference's R-tree branch-and-bound
(`bvh_ext.rs:59-168`, `rtree.rs:96-126`): triangles are Morton-sorted into
spatially-coherent BLOCKS; an XLA phase selects, per tile of Morton-sorted
queries, the candidate blocks whose box-distance lower bound is inside the
certified bound (an achieved distance + 2·tile-radius); the kernel then
walks ``grid=(tile, candidate_slot)`` with the triangle-block index coming
from a scalar-prefetched table — each candidate block is DMA'd to VMEM
once per TILE and shared by all its queries, instead of per-query gathers
(the XLA formulation's bandwidth wall, see BENCH.md).

Exactness is certified POST-HOC per query: every triangle in an excluded
block satisfies ``d(q, tri) ≥ d(c, tri) − |q − c| ≥ lb_excluded −
|q − c|`` (``lb_excluded`` = the smallest box-distance lower bound among
non-selected blocks), so a computed ``d_q`` at or below that certificate
cannot be beaten; queries failing it are recomputed densely by the caller.
Adaptively tight — it uses the achieved distances, unlike a-priori bounds
(a v0-representative upper-bound variant was far too loose in practice).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import F32_MAX
from .pallas_sdf import PAD_COORD, _closest_point_vw, _dist2, _load_sub

#: Queries per tile (kernel block and phase-A tile). 1-D Pallas blocks must
#: be 1024-multiples (Mosaic T(1024) layout).
DEFAULT_QT = 1024
#: Triangles per Morton block (same 1024 constraint).
TB = 1024
#: Candidate block slots per tile (NB × TB candidate triangles per tile).
DEFAULT_NB = 8
SUB = 256


@dataclass(frozen=True)
class BlockIndex:
    """Per-mesh spatial block structure (host-built, device-resident).

    planes: 9 × ((B+1)·TB,) f32 — Morton-ordered triangle planes
    (a, ab, ac components), one extra all-PAD block at index B;
    lo/hi: (B, 3) block AABBs; n_blocks: B.
    """

    planes: Tuple
    lo: object
    hi: object
    n_blocks: int


def build_block_index(ta, tb, tc) -> BlockIndex:
    """Morton-sort triangles, pack TB-sized blocks (host numpy in/out →
    device arrays)."""
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
    pad = (-T) % TB
    if pad:
        ta_p = np.concatenate([ta, np.full((pad, 3), PAD_COORD, np.float32)])
        ab_p = np.concatenate([ab_r, np.zeros((pad, 3), np.float32)])
        ac_p = np.concatenate([ac_r, np.zeros((pad, 3), np.float32)])
    else:
        ta_p, ab_p, ac_p = ta, ab_r, ac_r
    B = len(ta_p) // TB

    # Block AABBs over REAL triangles only.
    tri_lo = np.minimum(np.minimum(ta, tb), tc)
    tri_hi = np.maximum(np.maximum(ta, tb), tc)
    blk_of = np.arange(T) // TB
    lo_b = np.full((B, 3), np.inf, np.float32)
    hi_b = np.full((B, 3), -np.inf, np.float32)
    np.minimum.at(lo_b, blk_of, tri_lo)
    np.maximum.at(hi_b, blk_of, tri_hi)
    planes = []
    for arr, padval in ((ta_p, PAD_COORD), (ab_p, 0.0), (ac_p, 0.0)):
        for k in range(3):
            # one extra all-pad block at index B
            planes.append(
                jnp.asarray(np.concatenate(
                    [arr[:, k], np.full((TB,), padval, np.float32)]
                ))
            )
    return BlockIndex(
        planes=tuple(planes),
        lo=jnp.asarray(lo_b),
        hi=jnp.asarray(hi_b),
        n_blocks=B,
    )


@functools.partial(jax.jit, static_argnames=("nb", "qt"))
def select_blocks(q_tiles, bi: BlockIndex, *, nb: int = DEFAULT_NB,
                  qt: int = DEFAULT_QT):
    """Phase A: the nb nearest candidate blocks per query tile.

    q_tiles: (n_tiles, qt, 3) Morton-sorted queries. Returns
    (tbl (n_tiles, nb) int32, lb_excluded (n_tiles,) f32,
    radius (n_tiles,) f32).

    Exactness is certified POST-HOC per query: a triangle in any excluded
    block is at least ``lb_excluded - radius`` from every point of the
    tile, so a computed distance ``d_q ≤ lb_excluded - radius`` cannot be
    beaten — adaptively tight (uses the achieved distances), unlike an
    a-priori bound.
    """
    centers = (jnp.max(q_tiles, axis=1) + jnp.min(q_tiles, axis=1)) * 0.5
    radius = jnp.linalg.norm(
        (jnp.max(q_tiles, axis=1) - jnp.min(q_tiles, axis=1)) * 0.5, axis=-1
    )
    c = (bi.lo + bi.hi) * 0.5
    h = (bi.hi - bi.lo) * 0.5
    # Box distance (iquilezles, ≙ `bvh_ext.rs:18-31`): (n_tiles, B)
    d = jnp.maximum(
        jnp.abs(centers[:, None, :] - c[None]) - h[None], 0.0
    )
    lb = jnp.linalg.norm(d, axis=-1)
    lb = jnp.where(jnp.isfinite(bi.lo[None, :, 0]), lb, F32_MAX)
    # Pad the block axis so top_k(nb+1) always exists; pad cols sort last.
    B = lb.shape[1]
    if B < nb + 1:
        lb = jnp.pad(lb, ((0, 0), (0, nb + 1 - B)),
                     constant_values=F32_MAX)
    neg_lb, idx = jax.lax.top_k(-lb, nb + 1)
    tbl = jnp.where(idx[:, :nb] >= B, bi.n_blocks, idx[:, :nb])
    lb_excluded = -neg_lb[:, nb]
    return tbl.astype(jnp.int32), lb_excluded, radius


def _kernel_culled(tbl_ref, *refs, n_sub: int, sub: int, nb: int):
    q_refs = refs[0:3]
    t_refs = refs[3:12]
    d2_ref = refs[12]

    tq = q_refs[0].shape[0]
    run_min = jnp.full((tq,), jnp.float32(F32_MAX))
    for s in range(n_sub):
        ap, ab, ac = _load_sub(q_refs, t_refs, s, sub)
        v, w, d1, d2_, A, B_, C = _closest_point_vw(*ap, *ab, *ac)
        d2pair = _dist2(*ap, v, w, d1, d2_, A, B_, C)
        run_min = jnp.minimum(run_min, jnp.min(d2pair, axis=1))

    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        d2_ref[:] = run_min

    @pl.when(jnp.logical_not(first))
    def _():
        d2_ref[:] = jnp.minimum(d2_ref[:], run_min)


@functools.partial(jax.jit, static_argnames=("nb", "qt", "interpret"))
def culled_dist_pallas(queries_sorted, bi: BlockIndex, tbl, *,
                       nb: int = DEFAULT_NB, qt: int = DEFAULT_QT,
                       interpret: bool = False):
    """Min distance per (Morton-sorted, qt-padded) query via its tile's
    candidate blocks. queries_sorted: (Qp, 3) with Qp % qt == 0;
    tbl: (Qp//qt, nb). Returns (Qp,) f32 distances."""
    Qp = queries_sorted.shape[0]
    n_qt = Qp // qt

    qx = queries_sorted[:, 0]
    qy = queries_sorted[:, 1]
    qz = queries_sorted[:, 2]

    qspec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((TB,), lambda i, j, tbl_ref: (tbl_ref[i, j],),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((qt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_qt, nb),
        in_specs=[qspec] * 3 + [tspec] * 9,
        out_specs=[ospec],
        scratch_shapes=[],
    )
    sub = min(SUB, TB)
    (d2,) = pl.pallas_call(
        functools.partial(_kernel_culled, n_sub=TB // sub, sub=sub, nb=nb),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Qp,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tbl, qx, qy, qz, *bi.planes)
    return jnp.sqrt(d2)


jax.tree_util.register_pytree_node(
    BlockIndex,
    lambda b: ((b.planes, b.lo, b.hi), (b.n_blocks,)),
    lambda aux, ch: BlockIndex(
        planes=ch[0], lo=ch[1], hi=ch[2], n_blocks=aux[0]
    ),
)
