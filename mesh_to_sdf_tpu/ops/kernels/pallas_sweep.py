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


def _shift2(plane, dy, dz, pad_val):
    """3x3-window shift with edge padding for a (n1, n2) plane."""
    p = jnp.pad(plane, ((1, 1), (1, 1)), constant_values=pad_val)
    n1, n2 = plane.shape
    return p[dy : dy + n1, dz : dz + n2]


def _shiftv(v, dy, dz):
    p = jnp.pad(v, ((0, 0), (1, 1), (1, 1)), constant_values=PAD_COORD)
    n1, n2 = v.shape[1:]
    return p[:, dy : dy + n1, dz : dz + n2]


def _sweep_kernel(
    # SMEM scalars
    rev_ref, f0_ref, f1_ref, f2_ref, cs0_ref, cs1_ref, cs2_ref,
    # inputs (blocks of the volumes)
    d1_ref, v1_ref, i1_ref, d2_ref, v2_ref, i2_ref,
    # outputs
    od1_ref, ov1_ref, oi1_ref, od2_ref, ov2_ref, oi2_ref,
    # scratch carry
    sd1, sv1, si1, sd2, sv2, si2,
    *, comp0: int, comp1: int, comp2: int, n0: int, chunk: int,
    reverse: bool, squared: bool, slot2_center: bool,
):
    """comp0/1/2: which world coordinate (0=x,1=y,2=z) varies along the
    sweep axis / plane rows / plane cols. Each grid step processes ``chunk``
    consecutive slices (amortizing per-step overhead); a reverse sweep
    walks the slices within the block backwards."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sd1[:, :] = jnp.full_like(sd1, F32_MAX)
        sv1[:, :, :] = jnp.full_like(sv1, PAD_COORD)
        si1[:, :] = jnp.full_like(si1, -1)
        sd2[:, :] = jnp.full_like(sd2, F32_MAX)
        sv2[:, :, :] = jnp.full_like(sv2, PAD_COORD)
        si2[:, :] = jnp.full_like(si2, -1)

    n1, n2 = d1_ref.shape[1:]
    rev = rev_ref[0]

    firsts = (f0_ref[0], f1_ref[0], f2_ref[0])
    css = (cs0_ref[0], cs1_ref[0], cs2_ref[0])
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1).astype(jnp.float32)
    coord_r = firsts[comp1] + row_ids * css[comp1]
    coord_c = firsts[comp2] + col_ids * css[comp2]

    order = range(chunk - 1, -1, -1) if reverse else range(chunk)
    for s in order:
        # Grid index along the sweep axis for this slice.
        ga = jnp.where(
            rev != 0, n0 - 1 - (i * chunk + (chunk - 1 - s)),
            i * chunk + s,
        ).astype(jnp.float32)
        coord_a = firsts[comp0] + ga * css[comp0]
        comps = [None, None, None]
        comps[comp0] = jnp.broadcast_to(coord_a, (n1, n2))
        comps[comp1] = coord_r
        comps[comp2] = coord_c
        cx, cy, cz = comps

        d1 = d1_ref[s]
        v1 = v1_ref[s]
        i1 = i1_ref[s]
        d2 = d2_ref[s]
        v2 = v2_ref[s]
        i2 = i2_ref[s]

        dist = _pt_dist2 if squared else _pt_dist
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                # slot2_center: the runner-up carry only contributes its
                # CENTER candidate (transverse runner-up flow still happens
                # via slot-1 demotion in _merge2) — 10 exact evaluations
                # per cell instead of 18; the sweep is VPU-compute-bound.
                slots = (
                    ((sd1, sv1, si1), (sd2, sv2, si2))
                    if (not slot2_center) or (dy == 1 and dz == 1)
                    else ((sd1, sv1, si1),)
                )
                for (sd, sv, si) in slots:
                    vcand = _shiftv(sv[:, :, :], dy, dz)
                    icand = _shift2(si[:, :], dy, dz, -1)
                    dcand = dist(cx, cy, cz, vcand)
                    d1, v1, i1, d2, v2, i2 = _merge2(
                        d1, v1, i1, d2, v2, i2, dcand, vcand, icand
                    )

        od1_ref[s] = d1
        ov1_ref[s] = v1
        oi1_ref[s] = i1
        od2_ref[s] = d2
        ov2_ref[s] = v2
        oi2_ref[s] = i2
        sd1[:, :] = d1
        sv1[:, :, :] = v1
        si1[:, :] = i1
        sd2[:, :] = d2
        sv2[:, :, :] = v2
        si2[:, :] = i2


@functools.partial(
    jax.jit,
    static_argnames=(
        "reverse", "comp0", "comp1", "comp2", "interpret", "squared",
        "slot2_center",
    ),
)
def sweep_oriented(
    d1, v1, i1, d2, v2, i2,  # volumes (n0, n1, n2) / (n0, 9, n1, n2)
    reverse: bool,  # static — folded into the block index maps
    first_cell,  # (3,) world grid params
    cell_size,  # (3,)
    *,
    comp0: int, comp1: int, comp2: int,
    interpret: bool = False,
    squared: bool = False,  # d1/d2 volumes hold SQUARED distances
    slot2_center: bool = False,  # runner-up carry: center candidate only
):
    """One directional sweep over volumes laid out sweep-axis-first.

    Each grid step handles ``chunk`` slices (TPU scans of single slices are
    step-overhead-bound); the carry stays in VMEM scratch across steps.
    """
    n0, n1, n2 = d1.shape
    # chunk=2 measured perf-neutral at 256³ (0.80 s vs 0.79 s — the sweep is
    # bandwidth-bound, not step-overhead-bound) while needing ~110 MB of
    # scoped VMEM; keep the multi-slice machinery but default to 1.
    chunk = 1
    n_blocks = n0 // chunk

    rev = jnp.asarray(1 if reverse else 0, jnp.int32).reshape(1)

    if reverse:
        def idx(i):
            return n_blocks - 1 - i
    else:
        def idx(i):
            return i

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    b3 = pl.BlockSpec((chunk, n1, n2), lambda i: (idx(i), 0, 0),
                      memory_space=pltpu.VMEM)
    b4 = pl.BlockSpec((chunk, 9, n1, n2), lambda i: (idx(i), 0, 0, 0),
                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, comp0=comp0, comp1=comp1, comp2=comp2, n0=n0,
            chunk=chunk, reverse=reverse, squared=squared,
            slot2_center=slot2_center,
        ),
        grid=(n_blocks,),
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
            pltpu.VMEM((n1, n2), jnp.float32),
            pltpu.VMEM((9, n1, n2), jnp.float32),
            pltpu.VMEM((n1, n2), jnp.int32),
            pltpu.VMEM((n1, n2), jnp.float32),
            pltpu.VMEM((9, n1, n2), jnp.float32),
            pltpu.VMEM((n1, n2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # chunk=2 at 256² slices needs ~110 MB of scoped VMEM (22
            # double-buffered planes in+out + the carry scratch); v5e has
            # 128 MB physical.
            vmem_limit_bytes=120 * 1024 * 1024
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
