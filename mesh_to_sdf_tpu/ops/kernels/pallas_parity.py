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
from typing import Tuple

import jax
import jax.numpy as jnp
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
                            axes: int = 3, interpret: bool = False):
    """Boolean (nx, ny, nz) inside mask via 3-axis Pallas line parity.

    Drop-in replacement for :func:`..raycast.grid_inside_mask` (same vote
    semantics, `grid.rs:622-639`; ``axes=1`` = single +X parity). Also
    returns the total overflow count: the number of (line, sub-block) hit
    buckets beyond ``k_distinct`` that were NOT counted. Callers must treat
    any nonzero overflow as "parity unreliable" and fall back to the exact
    engine (see gridgen's host-side check).
    """
    from ..raycast import face_origins, unrotate_axis

    votes = None
    total_ovf = jnp.zeros((), jnp.int32)
    for axis in range(axes):
        origins, lshape = face_origins(grid, axis)
        n = grid.cell_count[axis]
        iy, iz = (axis + 1) % 3, (axis + 2) % 3
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
