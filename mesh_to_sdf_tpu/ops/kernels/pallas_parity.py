"""Pallas line-parity kernel: raycast sign for grids.

TPU-native replacement of the reference's raycast phase
(`mesh_to_sdf/src/generate/grid.rs:560-684`): one +axis ray per boundary cell
of each negative face; every cell in front of a hit at parameter ``t`` gets a
crossing count (`grid.rs:601-618`); a cell is inside iff ≥2 of its 3 axis
parities are odd (`grid.rs:622-639`).

Design: a (line-tile × triangle-block) sweep. For each tile the kernel keeps
a (lines × cells) int32 count block resident in VMEM and, per triangle
sub-block, *extracts the K smallest distinct hit buckets with multiplicities*
(a line rarely crosses more than a few surface sheets within one block), then
adds ``count_k · [cell ≤ bucket_k]`` — avoiding both the O(lines·tris·cells)
dense compare cube and any sort. Lines whose distinct-bucket count exceeds K
within a single sub-block are tallied in an ``overflow`` output (exactness
telemetry; the reference's own single-axis parity is imperfect, which is why
best-of-3 voting exists, `grid.rs:633-638`).

The hit test re-derives the reference's axis-aligned intersection
(`geo.rs:165-216`) from pre-rotated triangle planes; ``t`` is measured from
the axis-0 cell center and bucketed by ``floor(t / cell_size)``.
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

#: Lines per tile (1-D block layout requires 1024 multiples).
LINE_TILE = 1024
#: Triangle block per grid step / sub-block processed at once.
TRI_BLOCK = 2048
SUB = 256
#: Distinct hit buckets extracted per (line, sub-block).
K_DISTINCT = 8

_INF = 3.0e38  # plain float: jnp scalars would be captured consts in-kernel
#: Transverse coordinate for padded lines — far enough that no triangle is hit.
PAD_LINE = 1.0e9
PAD_TRI = 1.0e18


def _parity_kernel(*refs, n_sub: int, sub: int, k_distinct: int, n_pad: int):
    (oy_ref, oz_ref, ox_ref, inv_cs_ref,
     ax_ref, ay_ref, az_ref, abx_ref, aby_ref, abz_ref,
     acx_ref, acy_ref, acz_ref,
     cnt_ref, ovf_ref) = refs

    oy = oy_ref[:][:, None]  # (LC, 1)
    oz = oz_ref[:][:, None]
    ox = ox_ref[0]
    inv_cs = inv_cs_ref[0]

    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)
        ovf_ref[:] = jnp.zeros_like(ovf_ref)

    # tpu.iota only yields integers; cast after.
    cells = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1).astype(jnp.float32)

    counts = cnt_ref[:, :]
    ovf = ovf_ref[:]
    for s in range(n_sub):
        sl = slice(s * sub, (s + 1) * sub)
        # Pre-rotated planes: x = ray axis, (y, z) = transverse.
        ax = ax_ref[sl][None, :]
        ay = ay_ref[sl][None, :]
        az = az_ref[sl][None, :]
        abx = abx_ref[sl][None, :]
        aby = aby_ref[sl][None, :]
        abz = abz_ref[sl][None, :]
        acx = acx_ref[sl][None, :]
        acy = acy_ref[sl][None, :]
        acz = acz_ref[sl][None, :]

        apy = oy - ay  # (LC, B)
        apz = oz - az
        # Edge weights (`geo.rs:181-207`): p1 = o-b, p2 = o-c, e12 = ac-ab,
        # e20 = -ac, e01 = ab, all projected on the (y, z) plane.
        p1y = apy - aby
        p1z = apz - abz
        p2y = apy - acy
        p2z = apz - acz
        e12y = acy - aby
        e12z = acz - abz
        w0 = p1z * e12y - p1y * e12z
        w1 = p2z * (-acy) - p2y * (-acz)
        w2 = apz * aby - apy * abz
        inside = ((w0 < 0.0) & (w1 < 0.0) & (w2 < 0.0)) | (
            (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)
        )
        apx = ox - ax
        p1x = apx - abx
        p2x = apx - acx
        num = w0 * apx + w1 * p1x + w2 * p2x
        den = w0 + w1 + w2
        t = -num / jnp.where(den == 0.0, 1.0, den)
        hit = inside & (t > 0.0) & (den != 0.0)

        # Bucket = floor(t / cs); misses → +inf.
        z = jnp.where(hit, jnp.floor(t * inv_cs), _INF)

        # Extract K smallest distinct buckets with multiplicities.
        for _ in range(k_distinct):
            m = jnp.min(z, axis=1)  # (LC,)
            is_m = z == m[:, None]
            c = jnp.sum(is_m & (z < _INF), axis=1).astype(jnp.int32)
            valid = m < _INF
            add = jnp.where(
                valid[:, None] & (cells <= m[:, None]), c[:, None], 0
            )
            counts = counts + add
            z = jnp.where(is_m, _INF, z)

        # Any hits left after K extractions → overflow telemetry.
        ovf = ovf + jnp.sum(z < _INF, axis=1).astype(jnp.int32)

    cnt_ref[:, :] = counts
    ovf_ref[:] = ovf


@functools.partial(
    jax.jit,
    static_argnames=("n_cells", "k_distinct", "interpret"),
)
def line_parity_counts(
    oy: jax.Array,  # (L,) transverse coord 1 of each line origin
    oz: jax.Array,  # (L,) transverse coord 2
    ox: jax.Array,  # () axis coordinate of the cell-0 center
    cell_size: jax.Array,  # () cell size along the ray axis
    tri_rot: Tuple[jax.Array, ...],  # 9 pre-rotated planes (T,): a/ab/ac xyz
    *,
    n_cells: int,
    k_distinct: int = K_DISTINCT,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Crossing counts per (line, cell) for +axis rays.

    Returns (counts (L, n_cells) int32, overflow (L,) int32). ``tri_rot`` is
    (ax, ay, az, abx, aby, abz, acx, acy, acz) where x is the ray axis
    component and (y, z) the transverse components.
    """
    L = oy.shape[0]
    lpad = (-L) % LINE_TILE
    oy = jnp.concatenate([oy, jnp.full((lpad,), PAD_LINE, jnp.float32)])
    oz = jnp.concatenate([oz, jnp.full((lpad,), PAD_LINE, jnp.float32)])
    Lp = L + lpad

    T = tri_rot[0].shape[0]
    tpad = (-T) % TRI_BLOCK
    planes = []
    for i, arr in enumerate(tri_rot):
        padval = PAD_TRI if i < 3 else 0.0
        planes.append(
            jnp.concatenate([arr, jnp.full((tpad,), padval, jnp.float32)])
        )
    Tp = T + tpad

    n_pad = ((n_cells + 127) // 128) * 128
    n_lt = Lp // LINE_TILE
    n_tb = Tp // TRI_BLOCK

    lspec = pl.BlockSpec((LINE_TILE,), lambda i, j: (i,), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tspec = pl.BlockSpec((TRI_BLOCK,), lambda i, j: (j,), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(
        (LINE_TILE, n_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec((LINE_TILE,), lambda i, j: (i,), memory_space=pltpu.VMEM)

    sub = min(SUB, TRI_BLOCK)
    counts, ovf = pl.pallas_call(
        functools.partial(
            _parity_kernel,
            n_sub=TRI_BLOCK // sub,
            sub=sub,
            k_distinct=k_distinct,
            n_pad=n_pad,
        ),
        grid=(n_lt, n_tb),
        in_specs=[lspec, lspec, sspec, sspec] + [tspec] * 9,
        out_specs=[cspec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((Lp,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        oy, oz,
        jnp.asarray(ox, jnp.float32).reshape(1),
        (1.0 / jnp.asarray(cell_size, jnp.float32)).reshape(1),
        *planes,
    )
    return counts[:L, :n_cells], ovf[:L]


def rotate_planes(ta, tb, tc, axis: int):
    """Split triangle vertex arrays into the 9 pre-rotated planes for `axis`:
    component x ← axis, y ← (axis+1)%3, z ← (axis+2)%3 (`geo.rs:181-195`)."""
    ab = tb - ta
    ac = tc - ta
    ix, iy, iz = axis, (axis + 1) % 3, (axis + 2) % 3
    return (
        ta[:, ix], ta[:, iy], ta[:, iz],
        ab[:, ix], ab[:, iy], ab[:, iz],
        ac[:, ix], ac[:, iy], ac[:, iz],
    )


def grid_inside_mask_pallas(grid, ta, tb, tc, *, k_distinct: int = K_DISTINCT,
                            axes: int = 3, interpret: bool = False,
                            line_bins=None):
    """Boolean (nx, ny, nz) inside mask via 3-axis Pallas line parity.

    Drop-in replacement for :func:`..raycast.grid_inside_mask` (same vote
    semantics, `grid.rs:622-639`; ``axes=1`` = single +X parity). Also
    returns the total overflow count: the number of (line, sub-block) hit
    buckets beyond ``k_distinct`` that were NOT counted. Callers must treat
    any nonzero overflow as "parity unreliable" and fall back to the exact
    engine (see gridgen's host-side check).

    ``line_bins``: optional per-axis :class:`LineBins` tuple (host-built,
    :func:`build_line_bins`) routing each 32×32-line tile to only the
    triangle blocks whose transverse AABB overlaps it — exact, and skips
    the large majority of (tile, block) pairs on real meshes.
    """
    from ..raycast import face_origins, unrotate_axis

    votes = None
    total_ovf = jnp.zeros((), jnp.int32)
    for axis in range(axes):
        origins, lshape = face_origins(grid, axis)
        n = grid.cell_count[axis]
        iy, iz = (axis + 1) % 3, (axis + 2) % 3
        if line_bins is not None:
            # 2× the bucket budget: Morton-sorted blocks concentrate
            # parallel sheets (a fold region's triangles land in ONE
            # block), and extraction is cheap here — a few candidate
            # blocks per tile instead of every block. Overflow would
            # trigger the caller's exact resign, which costs far more.
            counts, ovf = line_parity_counts_binned(
                origins[:, iy],
                origins[:, iz],
                grid.first_cell[axis],
                grid.cell_size[axis],
                line_bins[axis],
                n_cells=n,
                n1=lshape[0],
                n2=lshape[1],
                k_distinct=2 * k_distinct,
                interpret=interpret,
            )
        else:
            counts, ovf = line_parity_counts(
                origins[:, iy],
                origins[:, iz],
                grid.first_cell[axis],
                grid.cell_size[axis],
                rotate_planes(ta, tb, tc, axis),
                n_cells=n,
                k_distinct=k_distinct,
                interpret=interpret,
            )
        odd = (counts % 2 == 1)
        vote = unrotate_axis(odd, axis, lshape, n).astype(jnp.int32)
        votes = vote if votes is None else votes + vote
        total_ovf = total_ovf + jnp.sum(ovf)
    return votes >= (2 if axes >= 2 else 1), total_ovf


# ---------------------------------------------------------------------------
# Binned line parity (r3): per-tile candidate triangle blocks
# ---------------------------------------------------------------------------
#: Transverse tile edge: 32×32 lines = 1024 (the Mosaic 1-D block quantum).
LINE_TILE_EDGE = 32
#: Triangles per candidate block (lane-dim slices must be 128-multiples).
BIN_TB = 256


@dataclass(frozen=True)
class LineBins:
    """Per-(mesh, grid, axis) candidate structure for the parity kernel.

    The dense kernel above pairs every 1024-line tile with every triangle
    block — and the K-bucket extraction runs even for pairs that cannot
    intersect. This is the TPU analog of the reference's per-ray BVH
    traversal (`grid.rs:568-620`): a triangle crosses a +axis line only if
    the line's transverse point lies inside the triangle's transverse AABB,
    so per 32×32-line tile only the blocks whose (Morton-sorted) transverse
    AABB overlaps the tile footprint are visited — EXACT by construction
    (no certificate; the excluded blocks provably contribute zero
    crossings).

    rows: (B+1, 9·tb/128, 128) f32 — rotated planes (ax ay az abx aby abz
    acx acy acz) packed one row per block, extra all-pad row at index B.
    tbl: (n_tiles, max_nb) int32 candidate block ids, pad id = B.
    t1/t2: tile counts along the two transverse dims.
    """

    rows: object
    tbl: object
    n_blocks: int
    tb: int
    tile: int
    t1: int
    t2: int


jax.tree_util.register_pytree_node(
    LineBins,
    lambda b: ((b.rows, b.tbl), (b.n_blocks, b.tb, b.tile, b.t1, b.t2)),
    lambda aux, ch: LineBins(rows=ch[0], tbl=ch[1], n_blocks=aux[0],
                             tb=aux[1], tile=aux[2], t1=aux[3], t2=aux[4]),
)


def build_line_bins(grid, axis: int, ta, tb, tc, *, tile: int = LINE_TILE_EDGE,
                    block: int = BIN_TB) -> LineBins:
    """Host-side candidate structure for +``axis`` line parity (numpy in,
    device arrays out). Triangles are sorted by transverse Morton code so
    blocks are spatially tight; per 32×32-line tile the table keeps every
    block whose transverse AABB (ε-inflated, ≙ `geo.rs:20-21`) overlaps the
    tile's line footprint."""
    ta = np.asarray(ta, np.float32)
    tb_ = np.asarray(tb, np.float32)
    tc = np.asarray(tc, np.float32)
    T = len(ta)
    iy, iz = (axis + 1) % 3, (axis + 2) % 3
    # The line lattice layout comes from raycast.face_origins: rows/cols are
    # (y,z) for axis 0, (x,z) for axis 1, (x,y) for axis 2 — NOT the
    # rotated (iy, iz) pair. Footprints must follow the lattice; the plane
    # packing below keeps the kernel's (axis, iy, iz) rotation.
    cr = 1 if axis == 0 else 0
    cc = 2 if axis != 2 else 1

    lo_t = np.minimum(np.minimum(ta, tb_), tc)
    hi_t = np.maximum(np.maximum(ta, tb_), tc)
    cen_y = (lo_t[:, cr] + hi_t[:, cr]) * 0.5
    cen_z = (lo_t[:, cc] + hi_t[:, cc]) * 0.5

    # Transverse Morton sort (16-bit per axis is plenty at these tile sizes).
    def q16(v):
        lo, hi = float(v.min()), float(v.max())
        s = 65535.0 / (hi - lo) if hi > lo else 0.0
        return np.clip((v - lo) * s, 0, 65535).astype(np.uint64)

    def spread16(x):
        x = (x | (x << 8)) & np.uint64(0x00FF00FF)
        x = (x | (x << 4)) & np.uint64(0x0F0F0F0F)
        x = (x | (x << 2)) & np.uint64(0x33333333)
        x = (x | (x << 1)) & np.uint64(0x55555555)
        return x

    code = spread16(q16(cen_y)) | (spread16(q16(cen_z)) << np.uint64(1))
    order = np.argsort(code, kind="stable")
    ta, tb_, tc = ta[order], tb_[order], tc[order]
    lo_t, hi_t = lo_t[order], hi_t[order]

    ab = tb_ - ta
    ac = tc - ta
    pad = (-T) % block
    if pad:
        ta_p = np.concatenate([ta, np.full((pad, 3), PAD_TRI, np.float32)])
        ab_p = np.concatenate([ab, np.zeros((pad, 3), np.float32)])
        ac_p = np.concatenate([ac, np.zeros((pad, 3), np.float32)])
    else:
        ta_p, ab_p, ac_p = ta, ab, ac
    B = len(ta_p) // block

    # Packed rotated-plane rows: plane k occupies sub-rows
    # [k·block/128, (k+1)·block/128).
    rows = np.empty((B + 1, 9 * block), np.float32)
    planes = [
        (ta_p[:, axis], PAD_TRI), (ta_p[:, iy], PAD_TRI),
        (ta_p[:, iz], PAD_TRI),
        (ab_p[:, axis], 0.0), (ab_p[:, iy], 0.0), (ab_p[:, iz], 0.0),
        (ac_p[:, axis], 0.0), (ac_p[:, iy], 0.0), (ac_p[:, iz], 0.0),
    ]
    for k, (arr, padval) in enumerate(planes):
        rows[:B, k * block:(k + 1) * block] = arr.reshape(B, block)
        rows[B, k * block:(k + 1) * block] = padval

    # Block transverse AABBs over REAL triangles.
    blk_of = np.arange(T) // block
    blo_y = np.full((B,), np.inf, np.float32)
    bhi_y = np.full((B,), -np.inf, np.float32)
    blo_z = np.full((B,), np.inf, np.float32)
    bhi_z = np.full((B,), -np.inf, np.float32)
    np.minimum.at(blo_y, blk_of, lo_t[:, cr])
    np.maximum.at(bhi_y, blk_of, hi_t[:, cr])
    np.minimum.at(blo_z, blk_of, lo_t[:, cc])
    np.maximum.at(bhi_z, blk_of, hi_t[:, cc])

    # Tile footprints over the padded line lattice (lines at cell centers).
    n1 = int(grid.cell_count[cr])
    n2 = int(grid.cell_count[cc])
    t1 = -(-n1 // tile)
    t2 = -(-n2 // tile)
    fc_y = float(np.asarray(grid.first_cell)[cr])
    fc_z = float(np.asarray(grid.first_cell)[cc])
    cs_y = float(np.asarray(grid.cell_size)[cr])
    cs_z = float(np.asarray(grid.cell_size)[cc])
    ti = np.arange(t1)
    tj = np.arange(t2)
    y0 = fc_y + ti * tile * cs_y
    y1 = fc_y + np.minimum((ti + 1) * tile, n1) * cs_y - cs_y
    z0 = fc_z + tj * tile * cs_z
    z1 = fc_z + np.minimum((tj + 1) * tile, n2) * cs_z - cs_z
    if cs_y < 0:
        y0, y1 = y1, y0
    if cs_z < 0:
        z0, z1 = z1, z0

    eps = 1e-4  # ≙ the reference's AABB inflation (`geo.rs:20-21`)
    ov_y = (blo_y[None, :] - eps <= y1[:, None]) & (
        bhi_y[None, :] + eps >= y0[:, None]
    )  # (t1, B)
    ov_z = (blo_z[None, :] - eps <= z1[:, None]) & (
        bhi_z[None, :] + eps >= z0[:, None]
    )  # (t2, B)
    ov = ov_y[:, None, :] & ov_z[None, :, :]  # (t1, t2, B)
    ov = ov.reshape(t1 * t2, B)

    max_nb = max(int(ov.sum(axis=1).max()), 1)
    tbl = np.full((t1 * t2, max_nb), B, np.int32)
    for r in range(t1 * t2):
        ids = np.flatnonzero(ov[r])
        tbl[r, :len(ids)] = ids

    return LineBins(
        rows=jnp.asarray(rows.reshape(B + 1, 9 * block // 128, 128)),
        tbl=jnp.asarray(tbl),
        n_blocks=B, tb=block, tile=tile, t1=t1, t2=t2,
    )


def _parity_binned_kernel(tbl_ref, oy_ref, oz_ref, ox_ref, inv_cs_ref,
                          t_ref, cnt_ref, ovf_ref, *, tb: int,
                          n_blocks: int, k_distinct: int, n_pad: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    slot = tbl_ref[i, j]

    @pl.when(j == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)
        ovf_ref[:] = jnp.zeros_like(ovf_ref)

    @pl.when(slot != n_blocks)
    def _():
        oy = oy_ref[:][:, None]
        oz = oz_ref[:][:, None]
        ox = ox_ref[0]
        inv_cs = inv_cs_ref[0]
        cells = jax.lax.broadcasted_iota(
            jnp.int32, (1, n_pad), 1
        ).astype(jnp.float32)

        r = tb // 128
        zs = []
        for s in range(r):
            def plane(k, s=s):
                return t_ref[0, k * r + s, :][None, :]  # (1, 128)

            ax, ay, az = plane(0), plane(1), plane(2)
            abx, aby, abz = plane(3), plane(4), plane(5)
            acx, acy, acz = plane(6), plane(7), plane(8)
            apy = oy - ay
            apz = oz - az
            p1y = apy - aby
            p1z = apz - abz
            p2y = apy - acy
            p2z = apz - acz
            e12y = acy - aby
            e12z = acz - abz
            w0 = p1z * e12y - p1y * e12z
            w1 = p2z * (-acy) - p2y * (-acz)
            w2 = apz * aby - apy * abz
            inside = ((w0 < 0.0) & (w1 < 0.0) & (w2 < 0.0)) | (
                (w0 > 0.0) & (w1 > 0.0) & (w2 > 0.0)
            )
            apx = ox - ax
            p1x = apx - abx
            p2x = apx - acx
            num = w0 * apx + w1 * p1x + w2 * p2x
            den = w0 + w1 + w2
            t = -num / jnp.where(den == 0.0, 1.0, den)
            hit = inside & (t > 0.0) & (den != 0.0)
            zs.append(jnp.where(hit, jnp.floor(t * inv_cs), _INF))
        z = jnp.concatenate(zs, axis=1)  # (LT, tb)

        counts = cnt_ref[:, :]
        for _ in range(k_distinct):
            m = jnp.min(z, axis=1)
            is_m = z == m[:, None]
            c = jnp.sum(is_m & (z < _INF), axis=1).astype(jnp.int32)
            valid = m < _INF
            counts = counts + jnp.where(
                valid[:, None] & (cells <= m[:, None]), c[:, None], 0
            )
            z = jnp.where(is_m, _INF, z)
        cnt_ref[:, :] = counts
        ovf_ref[:] = ovf_ref[:] + jnp.sum(z < _INF, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n_cells", "n1", "n2", "k_distinct", "interpret")
)
def line_parity_counts_binned(
    oy: jax.Array,  # (L,) row-major transverse coords (L = n1·n2)
    oz: jax.Array,
    ox: jax.Array,
    cell_size: jax.Array,
    bins: LineBins,
    *,
    n_cells: int,
    n1: int,
    n2: int,
    k_distinct: int = K_DISTINCT,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`line_parity_counts` through per-tile candidate blocks.

    Lines are re-laid into 32×32 transverse tiles (pure index transforms —
    compiled as copies), each tile visits only its table's blocks, and the
    counts come back in row-major order. Exact: excluded blocks cannot
    intersect the tile's lines (transverse AABB disjointness).
    """
    tile, t1, t2 = bins.tile, bins.t1, bins.t2
    p1 = t1 * tile - n1
    p2 = t2 * tile - n2

    def tile_layout(v):
        v = v.reshape(n1, n2)
        v = jnp.pad(v, ((0, p1), (0, p2)), constant_values=PAD_LINE)
        v = v.reshape(t1, tile, t2, tile)
        return jnp.transpose(v, (0, 2, 1, 3)).reshape(-1)

    oy_t = tile_layout(oy)
    oz_t = tile_layout(oz)

    n_pad = ((n_cells + 127) // 128) * 128
    lt = tile * tile
    n_tiles = t1 * t2
    nb = bins.tbl.shape[1]

    lspec = pl.BlockSpec((lt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tspec = pl.BlockSpec(
        (1, 9 * bins.tb // 128, 128),
        lambda i, j, tbl_ref: (tbl_ref[i, j], 0, 0),
        memory_space=pltpu.VMEM,
    )
    cspec = pl.BlockSpec((lt, n_pad), lambda i, j, tbl_ref: (i, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((lt,), lambda i, j, tbl_ref: (i,),
                         memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, nb),
        in_specs=[lspec, lspec, sspec, sspec, tspec],
        out_specs=[cspec, ospec],
        scratch_shapes=[],
    )
    counts, ovf = pl.pallas_call(
        functools.partial(
            _parity_binned_kernel, tb=bins.tb, n_blocks=bins.n_blocks,
            k_distinct=k_distinct, n_pad=n_pad,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * lt, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * lt,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        bins.tbl, oy_t, oz_t,
        jnp.asarray(ox, jnp.float32).reshape(1),
        (1.0 / jnp.asarray(cell_size, jnp.float32)).reshape(1),
        bins.rows,
    )

    def untile(v, trail):
        v = v.reshape((t1, t2, tile, tile) + trail)
        v = jnp.transpose(
            v, (0, 2, 1, 3) + tuple(4 + k for k in range(len(trail)))
        )
        v = v.reshape((t1 * tile, t2 * tile) + trail)
        return v[:n1, :n2]

    counts = untile(counts, (n_pad,)).reshape(n1 * n2, n_pad)[:, :n_cells]
    ovf = untile(ovf, ()).reshape(n1 * n2)
    return counts, ovf
