"""Differentiable SDF: custom VJP through the closest-point projection.

New capability beyond the reference (which is not differentiable): vertex
gradients d(SDF)/d(vertices) and d(SDF)/d(queries), making SDF generation a
trainable layer (BASELINE.json north star).

Math (envelope theorem): the Embree region ladder (`geo.rs:70-138`) is a
piecewise-smooth projection; at the minimum over triangles, with barycentric
coordinates (u, v, w) of the closest point q = u·a + v·b + w·c,

    d = |p − q|,  n̂ = (p − q)/d
    ∂d/∂p = n̂,   ∂d/∂a = −u·n̂,  ∂d/∂b = −v·n̂,  ∂d/∂c = −w·n̂

with the region choice and the argmin triangle held fixed (stop-grad), and the
sign (raycast parity — piecewise constant — or normal-side test) also held
fixed. The forward pass therefore only saves per-query argmin indices; the
backward re-gathers one triangle per query and scatter-adds into the vertex
array — O(Q) residual memory instead of O(Q·T) autodiff through the scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import F32_MAX
from . import geometry

_EPS = 1e-12


def _gather_tris(vertices, tri_idx):
    return vertices[tri_idx[:, 0]], vertices[tri_idx[:, 1]], vertices[tri_idx[:, 2]]


def _blocked(arrs, block):
    """Split leading axis into (nb, block), padding with invalid entries.
    arrs = [ta, tb, tc, valid]; returns reshaped arrays + effective block."""
    n = arrs[0].shape[0]
    block = max(1, min(block, n))
    rem = (-n) % block
    if rem:
        zero = jnp.zeros((rem, 3), arrs[0].dtype)
        arrs = [
            jnp.concatenate([arrs[0], zero]),
            jnp.concatenate([arrs[1], zero]),
            jnp.concatenate([arrs[2], zero]),
            jnp.concatenate([arrs[3], jnp.zeros((rem,), bool)]),
        ]
        n += rem
    nb = n // block
    return [a.reshape((nb, block) + a.shape[1:]) for a in arrs], block


# =====================================================================
# Unsigned min distance (raycast-mode distance): custom VJP
# =====================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def unsigned_min_distance(vertices, tri_idx, queries, block=512):
    """min over triangles of |p − closest_point(p, tri)|. (Q,) float32.

    vertices: (V, 3); tri_idx: (M, 3) int32 padded to a multiple of ``block``
    (pad rows may repeat a real triangle and are masked via ``tri_idx[:, 0] <
    0`` sentinel — use -1 padding); queries: (Q, 3).
    """
    d, _ = _min_forward(vertices, tri_idx, queries, block)
    return d


def _min_forward(vertices, tri_idx, queries, block):
    ta, tb, tc = _gather_tris(vertices, jnp.maximum(tri_idx, 0))
    valid = tri_idx[:, 0] >= 0
    Q = queries.shape[0]
    (ba, bb, bc, bv), block = _blocked([ta, tb, tc, valid], block)
    nb = ba.shape[0]

    def body(carry, inp):
        mind, mini = carry
        a, b, c, v, blk = inp
        d = geometry.point_triangle_distance(
            queries[:, None, :], a[None], b[None], c[None]
        )
        d = jnp.where(v[None, :], d, F32_MAX)
        arg = jnp.argmin(d, axis=1).astype(jnp.int32)
        dblk = jnp.take_along_axis(d, arg[:, None], axis=1)[:, 0]
        better = dblk < mind
        mind = jnp.where(better, dblk, mind)
        mini = jnp.where(better, blk * block + arg, mini)
        return (mind, mini), None

    init = (jnp.full((Q,), F32_MAX, jnp.float32), jnp.zeros((Q,), jnp.int32))
    (mind, mini), _ = jax.lax.scan(
        body, init, (ba, bb, bc, bv, jnp.arange(nb, dtype=jnp.int32))
    )
    mini = jnp.minimum(mini, tri_idx.shape[0] - 1)  # clamp out of pad zone
    return mind, mini


def _min_fwd(vertices, tri_idx, queries, block):
    d, argmin = _min_forward(vertices, tri_idx, queries, block)
    return d, (vertices, tri_idx, queries, d, argmin)


def _min_bwd(block, res, g):
    vertices, tri_idx, queries, d, argmin = res
    gv, gq = _envelope_grads(vertices, tri_idx, queries, d, argmin, g)
    return gv, None, gq


def _envelope_grads(vertices, tri_idx, queries, d, argmin, g):
    """Shared backward: distribute g·n̂ to query and (−bary)·g·n̂ to vertices."""
    ids = jnp.maximum(tri_idx, 0)[argmin]  # (Q, 3) vertex indices
    a = vertices[ids[:, 0]]
    b = vertices[ids[:, 1]]
    c = vertices[ids[:, 2]]
    bary = geometry.closest_point_barycentric(queries, a, b, c)  # (Q, 3)
    q = bary[:, 0:1] * a + bary[:, 1:2] * b + bary[:, 2:3] * c
    diff = queries - q
    # Guard d == 0 (on-surface) and d == F32_MAX (no triangle).
    ok = (d > 0.0) & (d < F32_MAX)
    inv = jnp.where(ok, 1.0 / jnp.maximum(d, _EPS), 0.0)
    nhat = diff * inv[:, None]
    gq = g[:, None] * nhat
    contrib = -gq[:, None, :] * bary[:, :, None]  # (Q, 3verts, 3coords)
    gv = jnp.zeros_like(vertices).at[ids.reshape(-1)].add(
        contrib.reshape(-1, 3)
    )
    return gv, gq


unsigned_min_distance.defvjp(_min_fwd, _min_bwd)


# =====================================================================
# Normal-sign champions: custom VJP on the (min_pos, min_neg) pair
# =====================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def signed_champion_distances(vertices, tri_idx, queries, block=512):
    """Two champions per query (`ops.keyed` semantics): smallest positive
    signed distance and smallest magnitude among negatives, both (Q,),
    differentiable. Combine with :func:`ops.keyed.combine_champions`
    (its ``where`` selection is itself differentiable)."""
    (mp, mn), _ = _champ_forward(vertices, tri_idx, queries, block)
    return mp, mn


def _champ_forward(vertices, tri_idx, queries, block):
    ta, tb, tc = _gather_tris(vertices, jnp.maximum(tri_idx, 0))
    valid = tri_idx[:, 0] >= 0
    Q = queries.shape[0]
    (ba, bb, bc, bv), block = _blocked([ta, tb, tc, valid], block)
    nb = ba.shape[0]

    def body(carry, inp):
        mp, ip, mn, mi = carry
        a, b, c, v, blk = inp
        sd = geometry.point_triangle_signed_distance(
            queries[:, None, :], a[None], b[None], c[None]
        )
        neg = jnp.signbit(sd)
        dp = jnp.where(v[None, :] & ~neg, sd, F32_MAX)
        dn = jnp.where(v[None, :] & neg, -sd, F32_MAX)
        argp = jnp.argmin(dp, axis=1).astype(jnp.int32)
        argn = jnp.argmin(dn, axis=1).astype(jnp.int32)
        bp = jnp.take_along_axis(dp, argp[:, None], 1)[:, 0]
        bn = jnp.take_along_axis(dn, argn[:, None], 1)[:, 0]
        betterp = bp < mp
        bettern = bn < mn
        mp = jnp.where(betterp, bp, mp)
        ip = jnp.where(betterp, blk * block + argp, ip)
        mn = jnp.where(bettern, bn, mn)
        mi = jnp.where(bettern, blk * block + argn, mi)
        return (mp, ip, mn, mi), None

    init = (
        jnp.full((Q,), F32_MAX, jnp.float32),
        jnp.zeros((Q,), jnp.int32),
        jnp.full((Q,), F32_MAX, jnp.float32),
        jnp.zeros((Q,), jnp.int32),
    )
    (mp, ip, mn, mi), _ = jax.lax.scan(
        body, init, (ba, bb, bc, bv, jnp.arange(nb, dtype=jnp.int32))
    )
    last = tri_idx.shape[0] - 1
    return (mp, mn), (jnp.minimum(ip, last), jnp.minimum(mi, last))


def _champ_fwd(vertices, tri_idx, queries, block):
    (mp, mn), (ip, mi) = _champ_forward(vertices, tri_idx, queries, block)
    return (mp, mn), (vertices, tri_idx, queries, mp, ip, mn, mi)


def _champ_bwd(block, res, gs):
    vertices, tri_idx, queries, mp, ip, mn, mi = res
    gp, gn = gs
    gv1, gq1 = _envelope_grads(vertices, tri_idx, queries, mp, ip, gp)
    gv2, gq2 = _envelope_grads(vertices, tri_idx, queries, mn, mi, gn)
    return gv1 + gv2, None, gq1 + gq2


signed_champion_distances.defvjp(_champ_fwd, _champ_bwd)


# =====================================================================
# CPT-backed grid distance: O(cells + tris) forward, envelope backward
# =====================================================================
def make_cpt_grid_distance(grid, tri_idx_np, vertices_example, *,
                           use_pallas=None):
    """Build a differentiable ``f(vertices) -> dist (nx,ny,nz)`` that runs the
    CPT engine forward (O(cells+tris), see ops/cpt.py) and the envelope VJP
    backward — the scalable path for DifferentiableSDF at big grids (the
    O(Q·T) :func:`unsigned_min_distance` is the small-scale/exact fallback).

    tri_idx_np: (M, 3) int numpy vertex indices (static — subdivision
    structure is fixed at build time from ``vertices_example``).

    The closest point on a subdivided triangle lies on its parent, so the
    backward pass re-computes barycentrics w.r.t. the PARENT triangle and
    scatter-adds into the original vertices (see ``_envelope_grads``).
    Subdivision midpoints move affinely with the parent corners, so carrying
    gradients through the parent is exact.
    """
    import numpy as np

    from . import cpt as cpt_mod

    tri_idx_np = np.asarray(tri_idx_np, np.int64)
    v0 = np.asarray(vertices_example, np.float32)
    cs = float(np.max(np.abs(np.asarray(grid.cell_size))))
    max_edge = (cpt_mod.SEED_SPAN - 1.5) * cs
    ra, rb, rc, parents = cpt_mod.subdivide_to_span(
        v0, tri_idx_np, max_edge=max_edge, return_parents=True
    )
    # Per-subdivided-vertex barycentric weights w.r.t. the parent corners:
    # every subdivided vertex is an affine combination of its parent's
    # corners; solving the (overdetermined) barycentric system per vertex at
    # build time lets the forward recompute sub-triangles from live vertices.
    pa = v0[tri_idx_np[parents, 0]]
    pb = v0[tri_idx_np[parents, 1]]
    pc = v0[tri_idx_np[parents, 2]]

    def bary_weights(p):
        # least-squares barycentrics of p in triangle (pa, pb, pc)
        e0 = pb - pa
        e1 = pc - pa
        d = p - pa
        d00 = (e0 * e0).sum(-1)
        d01 = (e0 * e1).sum(-1)
        d11 = (e1 * e1).sum(-1)
        d20 = (d * e0).sum(-1)
        d21 = (d * e1).sum(-1)
        den = np.maximum(d00 * d11 - d01 * d01, 1e-20)
        v = (d11 * d20 - d01 * d21) / den
        w = (d00 * d21 - d01 * d20) / den
        return np.stack([1.0 - v - w, v, w], -1).astype(np.float32)

    wa = jnp.asarray(bary_weights(ra))  # (M', 3)
    wb = jnp.asarray(bary_weights(rb))
    wc = jnp.asarray(bary_weights(rc))
    parent_corners = jnp.asarray(tri_idx_np[parents])  # (M', 3)
    parents_j = jnp.asarray(parents.astype(np.int32))
    tri_idx_j = jnp.asarray(tri_idx_np.astype(np.int32))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def _sub_tris(vertices):
        pa = vertices[parent_corners[:, 0]]
        pb = vertices[parent_corners[:, 1]]
        pc = vertices[parent_corners[:, 2]]

        def mix(w):
            return w[:, 0:1] * pa + w[:, 1:2] * pb + w[:, 2:3] * pc

        return mix(wa), mix(wb), mix(wc)

    @jax.custom_vjp
    def f(vertices):
        d, _ = _forward(vertices)
        return d

    def _forward(vertices):
        ta, tb, tc = _sub_tris(vertices)
        if use_pallas:
            dist, idx = cpt_mod.closest_point_grid_pallas(grid, ta, tb, tc)
        else:
            dist, idx = cpt_mod.closest_point_grid(grid, ta, tb, tc)
        return dist, idx

    def fwd(vertices):
        dist, idx = _forward(vertices)
        return dist, (vertices, dist, idx)

    def bwd(res, g):
        vertices, dist, idx = res
        centers = grid.all_cell_centers().reshape(-1, 3)
        # Parent triangle per cell (idx < 0 ⇒ no triangle ⇒ zero grad).
        par = parents_j[jnp.maximum(idx.reshape(-1), 0)]
        ids = tri_idx_j[par]  # (N, 3) original vertex indices
        a = vertices[ids[:, 0]]
        b = vertices[ids[:, 1]]
        c = vertices[ids[:, 2]]
        bary = geometry.closest_point_barycentric(centers, a, b, c)
        q = bary[:, 0:1] * a + bary[:, 1:2] * b + bary[:, 2:3] * c
        diff = centers - q
        d = dist.reshape(-1)
        ok = (d > 0.0) & (d < F32_MAX) & (idx.reshape(-1) >= 0)
        inv = jnp.where(ok, 1.0 / jnp.maximum(d, _EPS), 0.0)
        nhat = diff * inv[:, None]
        gq = g.reshape(-1)[:, None] * nhat
        contrib = -gq[:, None, :] * bary[:, :, None]
        gv = jnp.zeros_like(vertices).at[ids.reshape(-1)].add(
            contrib.reshape(-1, 3)
        )
        return (gv,)

    f.defvjp(fwd, bwd)
    return f
