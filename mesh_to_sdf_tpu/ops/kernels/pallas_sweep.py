"""Pallas CPT sweep kernel: closest-point propagation with a VMEM carry.

The hot loop of the :mod:`..cpt` grid engine (the TPU redesign of the
reference's heap-BFS propagation, `grid.rs:495-558`). XLA `lax.scan`
formulations are launch-overhead- or bandwidth-bound at these slice sizes;
this kernel iterates the sweep axis as the Pallas grid with the previous
slice's state held in VMEM scratch (scratch persists across sequential grid
steps on TPU), so each slice costs one HBM read + one write.

Per grid step (slice i along the sweep axis):
1. first step initializes the carry to sentinels;
2. the incoming slice state (2 best-distinct-triangle slots per cell) is
   merged with 18 candidates — the carry's two slots shifted over the 3×3
   transverse window — each re-evaluated EXACTLY against this slice's cell
   centers (computed in-kernel from the grid parameters: no centers traffic);
3. the merged state is written out and becomes the carry.

Ray direction is folded into the BlockSpec index map (backward sweeps read
slice ``n0-1-i``), so no flipped copies of the volumes are materialized.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import F32_MAX
from ..geometry import AABB_EPSILON  # noqa: F401  (doc parity)

PAD_COORD = 1.0e18


def _pt_dist(cx, cy, cz, v):
    """Exact point-triangle distance, planes (n1, n2); v (9, n1, n2)."""
    return jnp.sqrt(_pt_dist2(cx, cy, cz, v))


def _pt_dist2(cx, cy, cz, v):
    """Exact SQUARED point-triangle distance (no sqrt; ordering-identical
    to :func:`_pt_dist` — sqrt is monotone — so min-merges can run in
    d²-space and pay one sqrt per cell at the end instead of one per
    candidate evaluation)."""
    ax, ay, az = v[0], v[1], v[2]
    bx, by, bz = v[3], v[4], v[5]
    cx2, cy2, cz2 = v[6], v[7], v[8]
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx2 - ax, cy2 - ay, cz2 - az
    apx, apy, apz = cx - ax, cy - ay, cz - az

    d1 = abx * apx + aby * apy + abz * apz
    d2 = acx * apx + acy * apy + acz * apz
    A = abx * abx + aby * aby + abz * abz
    B_ = abx * acx + aby * acy + abz * acz
    C = acx * acx + acy * acy + acz * acz
    d3 = d1 - A
    d4 = d2 - B_
    d5 = d1 - B_
    d6 = d2 - C
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    def rcp(x):
        return jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))

    t_ab = d1 * rcp(A)
    t_ac = d2 * rcp(C)
    t_bc = (d4 - d3) * rcp(A - 2.0 * B_ + C)
    inv_den = rcp(A * C - B_ * B_)

    v_ = vb * inv_den
    w_ = vc * inv_den
    on_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)
    v_ = jnp.where(on_bc, 1.0 - t_bc, v_)
    w_ = jnp.where(on_bc, t_bc, w_)
    on_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    v_ = jnp.where(on_ac, 0.0, v_)
    w_ = jnp.where(on_ac, t_ac, w_)
    on_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    v_ = jnp.where(on_ab, t_ab, v_)
    w_ = jnp.where(on_ab, 0.0, w_)
    in_c = (d6 >= 0.0) & (d5 <= d6)
    v_ = jnp.where(in_c, 0.0, v_)
    w_ = jnp.where(in_c, 1.0, w_)
    in_b = (d3 >= 0.0) & (d4 <= d3)
    v_ = jnp.where(in_b, 1.0, v_)
    w_ = jnp.where(in_b, 0.0, w_)
    in_a = (d1 <= 0.0) & (d2 <= 0.0)
    v_ = jnp.where(in_a, 0.0, v_)
    w_ = jnp.where(in_a, 0.0, w_)

    eq_ab = (abx == 0.0) & (aby == 0.0) & (abz == 0.0)
    eq_ac = (acx == 0.0) & (acy == 0.0) & (acz == 0.0)
    eq_bc = (abx == acx) & (aby == acy) & (abz == acz)
    s_ab = jnp.clip(t_ab, 0.0, 1.0)
    s_ac = jnp.clip(t_ac, 0.0, 1.0)
    seg_ab = eq_bc | eq_ac
    v_ = jnp.where(seg_ab, s_ab, v_)
    w_ = jnp.where(seg_ab, 0.0, w_)
    v_ = jnp.where(eq_ab, 0.0, v_)
    w_ = jnp.where(eq_ab, s_ac, w_)
    alleq = eq_ab & eq_bc
    v_ = jnp.where(alleq, 0.0, v_)
    w_ = jnp.where(alleq, 0.0, w_)

    ap2 = apx * apx + apy * apy + apz * apz
    dd = ap2 + v_ * (v_ * A - 2.0 * d1 + 2.0 * w_ * B_) + w_ * (w_ * C - 2.0 * d2)
    return jnp.maximum(dd, 0.0)


def _merge2(d1, v1, i1, d2, v2, i2, dc, vc, ic):
    """Two-slot distinct-triangle merge of one candidate set."""
    same1 = ic == i1
    b1 = dc < d1
    nd1 = jnp.where(b1, dc, d1)
    nv1 = jnp.where(b1[None], vc, v1)
    ni1 = jnp.where(b1, ic, i1)
    promote = b1 & ~same1
    cand2 = ~b1 & ~same1 & (dc < d2)
    nd2 = jnp.where(promote, d1, jnp.where(cand2, dc, d2))
    nv2 = jnp.where(promote[None], v1, jnp.where(cand2[None], vc, v2))
    ni2 = jnp.where(promote, i1, jnp.where(cand2, ic, i2))
    return nd1, nv1, ni1, nd2, nv2, ni2


#: Sentinel-row margin on each side of the carry scratch's row axis. 8 rows
#: keep every dynamic strip read/write sublane-aligned (Mosaic's f32 tile is
#: (8, 128)) while providing the 1-row halo the 3×3 window needs.
_MARGIN = 8

#: Max transverse-plane elements processed per kernel strip. 256² (the
#: measured-good dense-path plane) — larger planes made the Mosaic register
#: allocator spill ~142 MB at 512² (BENCH r4 streamed-512³ OOM), so bigger
#: planes are strip-mined to this footprint.
_MAX_PLANE = 256 * 256


def _sweep_kernel(
    # SMEM scalars
    rev_ref, f0_ref, f1_ref, f2_ref, cs0_ref, cs1_ref, cs2_ref,
    # inputs (strip blocks of the volumes)
    d1_ref, v1_ref, i1_ref, d2_ref, v2_ref, i2_ref,
    # outputs
    od1_ref, ov1_ref, oi1_ref, od2_ref, ov2_ref, oi2_ref,
    # scratch carry: parity-double-buffered full planes with _MARGIN
    # sentinel rows top+bottom — (2, n1+2·_MARGIN, n2) / (2, 9, ·, ·)
    sd1, sv1, si1, sd2, sv2, si2,
    *, comp0: int, comp1: int, comp2: int, n0: int, n1: int, n1t: int,
):
    """comp0/1/2: which world coordinate (0=x,1=y,2=z) varies along the
    sweep axis / plane rows / plane cols.

    Grid = (slices, row-strips). Each step processes one (n1t, n2) strip of
    one slice: candidates come from the PREVIOUS slice's carry (parity
    ``i%2``), merged state is written to the output window and to parity
    ``1−i%2``. The parity double-buffer is what lets strips within a slice
    run in any order — every read sees the previous slice, never a
    neighbor strip's fresh write. Sentinel margins make the strip's
    halo read one aligned dynamic slice with no edge conditionals.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = jax.lax.rem(i, 2)
    n2 = d1_ref.shape[2]

    @pl.when((i == 0) & (j == 0))
    def _():
        sd1[:, :, :] = jnp.full_like(sd1, F32_MAX)
        sv1[:, :, :, :] = jnp.full_like(sv1, PAD_COORD)
        si1[:, :, :] = jnp.full_like(si1, -1)
        sd2[:, :, :] = jnp.full_like(sd2, F32_MAX)
        sv2[:, :, :, :] = jnp.full_like(sv2, PAD_COORD)
        si2[:, :, :] = jnp.full_like(si2, -1)

    rev = rev_ref[0]
    firsts = (f0_ref[0], f1_ref[0], f2_ref[0])
    css = (cs0_ref[0], cs1_ref[0], cs2_ref[0])

    r0 = j * n1t  # strip's first plane row (dynamic)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n1t, n2), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n1t, n2), 1)
    coord_r = firsts[comp1] + (r0 + row_ids).astype(jnp.float32) * css[comp1]
    coord_c = firsts[comp2] + col_ids.astype(jnp.float32) * css[comp2]
    ga = jnp.where(rev != 0, n0 - 1 - i, i).astype(jnp.float32)
    coord_a = firsts[comp0] + ga * css[comp0]
    comps = [None, None, None]
    comps[comp0] = jnp.broadcast_to(coord_a, (n1t, n2))
    comps[comp1] = coord_r
    comps[comp2] = coord_c
    cx, cy, cz = comps

    d1 = d1_ref[0]
    v1 = v1_ref[0]
    i1 = i1_ref[0]
    d2 = d2_ref[0]
    v2 = v2_ref[0]
    i2 = i2_ref[0]

    # Aligned carry superset: scratch rows [r0, r0+n1t+2·_MARGIN) cover
    # plane rows [r0−_MARGIN, r0+n1t+_MARGIN) ⊇ the strip's 1-row halo
    # (r0 is 8-row aligned by construction, so the read's layout offset is
    # {0,0}). The halo shifts below use `pltpu.roll` (dynamic rotate) +
    # aligned static slices — pad-then-slice concats crash Mosaic when the
    # operand carries a sublane-offset layout (r4 512³ finding).
    rows = pl.dslice(r0, n1t + 2 * _MARGIN)

    def row_strip(s, dy):
        """Plane rows r0−1+dy … r0+n1t−2+dy (sentinel margins supply the
        outer-edge halo rows)."""
        k = _MARGIN - 1 + dy
        if s.ndim == 4:  # vertex planes (2, 9, n1m, n2)
            base = s[p, :, rows, :]
            return pltpu.roll(base, base.shape[1] - k, 1)[:, :n1t, :]
        base = s[p, rows, :]
        return pltpu.roll(base, base.shape[0] - k, 0)[:n1t, :]

    def col_shift(x, dz, pad_val):
        """Columns shifted by dz−1 with ``pad_val`` injected at the edge."""
        if dz == 1:
            return x
        rolled = pltpu.roll(x, (1 - dz) % n2, x.ndim - 1)
        mask = col_ids == (0 if dz == 0 else n2 - 1)
        if x.ndim == 3:
            mask = mask[None]
        return jnp.where(mask, pad_val, rolled)

    for dy in (0, 1, 2):
        # Full 18-candidate schedule (best + runner-up from every neighbor
        # column). The reduced runner-up window (slot2_center, rounds 3/4)
        # measured ~0.04 s faster at 256³ but cost up to ~1% extra
        # far-field relative error — dropped (.campaign/phase256.log).
        rowsets = [
            (row_strip(sv1, dy), row_strip(si1, dy)),
            (row_strip(sv2, dy), row_strip(si2, dy)),
        ]
        for dz in (0, 1, 2):
            for (vrow, irow) in rowsets:
                vcand = col_shift(vrow, dz, PAD_COORD)
                icand = col_shift(irow, dz, -1)
                dcand = _pt_dist(cx, cy, cz, vcand)
                d1, v1, i1, d2, v2, i2 = _merge2(
                    d1, v1, i1, d2, v2, i2, dcand, vcand, icand
                )

    od1_ref[0] = d1
    ov1_ref[0] = v1
    oi1_ref[0] = i1
    od2_ref[0] = d2
    ov2_ref[0] = v2
    oi2_ref[0] = i2
    wrows = pl.dslice(r0 + _MARGIN, n1t)
    q = 1 - p
    sd1[q, wrows, :] = d1
    sv1[q, :, wrows, :] = v1
    si1[q, wrows, :] = i1
    sd2[q, wrows, :] = d2
    sv2[q, :, wrows, :] = v2
    si2[q, wrows, :] = i2


@functools.partial(
    jax.jit,
    static_argnames=("reverse", "comp0", "comp1", "comp2", "interpret"),
)
def sweep_oriented(
    d1, v1, i1, d2, v2, i2,  # volumes (n0, n1, n2) / (n0, 9, n1, n2)
    reverse: bool,  # static — folded into the block index maps
    first_cell,  # (3,) world grid params
    cell_size,  # (3,)
    *,
    comp0: int, comp1: int, comp2: int,
    interpret: bool = False,
):
    """One directional sweep over volumes laid out sweep-axis-first.

    Grid = (slices, row-strips): planes larger than ``_MAX_PLANE`` elements
    are strip-mined so the kernel's live working set stays at the
    measured-good 256² footprint (512² planes spilled ~142 MB of vector
    registers — the r4 streamed-512³ OOM). The carry persists across grid
    steps in parity-double-buffered VMEM scratch.
    """
    n0, n1, n2 = d1.shape

    if n1 * n2 <= _MAX_PLANE:
        n1t = n1
    else:
        n1t = n1
        for t in range(min(_MAX_PLANE // n2, n1), 7, -1):
            # Strips must tile the rows exactly and stay sublane-aligned.
            if n1 % t == 0 and t % _MARGIN == 0:
                n1t = t
                break
    n_strips = n1 // n1t

    rev = jnp.asarray(1 if reverse else 0, jnp.int32).reshape(1)

    if reverse:
        def idx(i):
            return n0 - 1 - i
    else:
        def idx(i):
            return i

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    b3 = pl.BlockSpec((1, n1t, n2), lambda i, j: (idx(i), j, 0),
                      memory_space=pltpu.VMEM)
    b4 = pl.BlockSpec((1, 9, n1t, n2), lambda i, j: (idx(i), 0, j, 0),
                      memory_space=pltpu.VMEM)

    n1m = n1 + 2 * _MARGIN
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, comp0=comp0, comp1=comp1, comp2=comp2, n0=n0,
            n1=n1, n1t=n1t,
        ),
        grid=(n0, n_strips),
        in_specs=[smem] * 7 + [b3, b4, b3, b3, b4, b3],
        out_specs=[b3, b4, b3, b3, b4, b3],
        out_shape=[
            jax.ShapeDtypeStruct((n0, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((n0, 9, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((n0, n1, n2), jnp.int32),
            jax.ShapeDtypeStruct((n0, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((n0, 9, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((n0, n1, n2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n1m, n2), jnp.float32),
            pltpu.VMEM((2, 9, n1m, n2), jnp.float32),
            pltpu.VMEM((2, n1m, n2), jnp.int32),
            pltpu.VMEM((2, n1m, n2), jnp.float32),
            pltpu.VMEM((2, 9, n1m, n2), jnp.float32),
            pltpu.VMEM((2, n1m, n2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # 512² planes: carry scratch ≈48 MB + strip windows ≈23 MB.
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        rev,
        first_cell[0].reshape(1), first_cell[1].reshape(1),
        first_cell[2].reshape(1),
        cell_size[0].reshape(1), cell_size[1].reshape(1),
        cell_size[2].reshape(1),
        d1, v1, i1, d2, v2, i2,
    )
    return out
