"""Slow, independent NumPy baselines for cross-checking the fast kernels.

Pattern copied from the reference's test strategy (SURVEY.md §4: "every fast
kernel has a slow reference implementation living in the test module"):

- ``sdfgen_point_triangle_distance``: barycentric-clamp algorithm following the
  SDFGen approach (the reference uses the same independent baseline,
  `geo.rs:329-379`). NOT the Embree region ladder — a genuinely different
  algorithm, so agreement is meaningful.
- ``moller_ray_triangle``: generic plane + inside-test intersection
  (`geo.rs:396-454`'s approach).
- ``brute_sdf``: O(Q·T) per-point loop with the sequential compare_distances
  fold (`lib.rs:242-259`, `default.rs:27-73`).
- ``brute_grid_sdf``: cell-center loop + per-line ray parity with best-of-3
  voting (`grid.rs:568-641`).

All pure NumPy float32, no JAX.
"""
from __future__ import annotations

import numpy as np


# --------------------------------------------------------------- geometry
def point_segment_distance(p, a, b):
    d = b - a
    m = float(np.dot(d, d))
    s = 0.0 if m == 0.0 else float(np.dot(d, p - a)) / m
    s = min(max(s, 0.0), 1.0)
    return float(np.linalg.norm(p - (a + s * d)))


def sdfgen_point_triangle_distance(p, a, b, c):
    """SDFGen-style barycentric baseline. Assumes non-degenerate triangle."""
    p = np.asarray(p, np.float64)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c = np.asarray(c, np.float64)
    x13 = a - c
    x23 = b - c
    x03 = p - c
    m13 = np.dot(x13, x13)
    m23 = np.dot(x23, x23)
    d = np.dot(x13, x23)
    invdet = 1.0 / max(m13 * m23 - d * d, 1e-30)
    aa = np.dot(x13, x03)
    bb = np.dot(x23, x03)
    w23 = invdet * (m23 * aa - d * bb)
    w31 = invdet * (m13 * bb - d * aa)
    w12 = 1.0 - w23 - w31
    if w23 >= 0 and w31 >= 0 and w12 >= 0:
        proj = w23 * a + w31 * b + w12 * c
        return float(np.linalg.norm(p - proj))
    if w23 > 0:
        return min(point_segment_distance(p, a, b), point_segment_distance(p, a, c))
    if w31 > 0:
        return min(point_segment_distance(p, a, b), point_segment_distance(p, b, c))
    return min(point_segment_distance(p, a, c), point_segment_distance(p, b, c))


def moller_ray_triangle(origin, direction, v0, v1, v2):
    """Generic ray/triangle: plane hit + 3 edge-side tests. Returns t or None."""
    origin = np.asarray(origin, np.float64)
    direction = np.asarray(direction, np.float64)
    v0, v1, v2 = (np.asarray(v, np.float64) for v in (v0, v1, v2))
    n = np.cross(v1 - v0, v2 - v0)
    ndd = np.dot(n, direction)
    if abs(ndd) < 1e-5:
        return None
    t = -(np.dot(n, origin) - np.dot(n, v0)) / ndd
    if t < 0:
        return None
    p = origin + t * direction
    for e0, e1 in ((v0, v1), (v1, v2), (v2, v0)):
        if np.dot(n, np.cross(e1 - e0, p - e0)) < 0:
            return None
    return float(t)


# ------------------------------------------------- compare_distances fold
def approx_eq(a, b, ulps=2, eps=1e-6):
    if abs(a - b) <= eps:
        return True
    ai = np.float32(a).view(np.int32)
    bi = np.float32(b).view(np.int32)
    return abs(int(ai) - int(bi)) <= ulps


def compare_is_less(a, b):
    """compare_distances(a, b) == Less (`lib.rs:242-259`)."""
    aa, ab = abs(a), abs(b)
    if approx_eq(aa, ab):
        a_neg, b_neg = np.signbit(np.float32(a)), np.signbit(np.float32(b))
        if a_neg and not b_neg:
            return False  # Greater
        if not a_neg and b_neg:
            return True  # Less
        return aa < ab
    return aa < ab


# ----------------------------------------------------------- brute force
F32_MAX = float(np.finfo(np.float32).max)


def _aligned_hits(p, tris, axis):
    """All aligned-ray hits (strict sign + t>0) for point p. Returns list of t."""
    ts = []
    for (a, b, c) in tris:
        iy, iz, ix = (axis + 1) % 3, (axis + 2) % 3, axis
        e01, e12, e20 = b - a, c - b, a - c
        p0, p1, p2 = p - a, p - b, p - c
        w0 = p1[iz] * e12[iy] - p1[iy] * e12[iz]
        w1 = p2[iz] * e20[iy] - p2[iy] * e20[iz]
        w2 = p0[iz] * e01[iy] - p0[iy] * e01[iz]
        same = (w0 < 0 and w1 < 0 and w2 < 0) or (w0 > 0 and w1 > 0 and w2 > 0)
        if not same:
            continue
        ws = w0 + w1 + w2
        if ws == 0:
            continue
        t = -(w0 * p0[ix] + w2 * p2[ix] + w1 * p1[ix]) / ws
        if t > 0:
            ts.append(float(t))
    return ts


def signed_distance_normal(p, a, b, c):
    d = sdfgen_point_triangle_distance(p, a, b, c)
    n = np.cross(b - a, c - a)
    # need the closest point; recompute via projection of the Embree ladder is
    # overkill — use gradient-free approach: sign by nearest-point direction.
    q = _closest_point(p, a, b, c)
    return d if np.dot(p - q, n) > 0 else -d


def _closest_point(p, a, b, c):
    """Closest point via dense sampling-free barycentric clamp (non-degenerate)."""
    x13, x23, x03 = a - c, b - c, p - c
    m13, m23 = np.dot(x13, x13), np.dot(x23, x23)
    d = np.dot(x13, x23)
    invdet = 1.0 / max(m13 * m23 - d * d, 1e-30)
    aa, bb = np.dot(x13, x03), np.dot(x23, x03)
    w23 = invdet * (m23 * aa - d * bb)
    w31 = invdet * (m13 * bb - d * aa)
    w12 = 1.0 - w23 - w31
    if w23 >= 0 and w31 >= 0 and w12 >= 0:
        return w23 * a + w31 * b + w12 * c
    candidates = []
    for (e0, e1) in ((a, b), (a, c), (b, c)):
        dvec = e1 - e0
        m = np.dot(dvec, dvec)
        s = 0.0 if m == 0 else np.clip(np.dot(dvec, p - e0) / m, 0.0, 1.0)
        candidates.append(e0 + s * dvec)
    dists = [np.linalg.norm(p - q) for q in candidates]
    return candidates[int(np.argmin(dists))]


def brute_sdf(vertices, triangles, queries, sign_method="raycast", raycast_axes=3):
    """Sequential-fold brute force mirroring `default.rs:27-73` (normal) and
    `bvh.rs:76-144` (raycast, best-of-3 when raycast_axes=3)."""
    vertices = np.asarray(vertices, np.float32)
    tris = [
        (vertices[i].astype(np.float64), vertices[j].astype(np.float64),
         vertices[k].astype(np.float64))
        for i, j, k in triangles
    ]
    out = []
    for p in np.asarray(queries, np.float32):
        p = p.astype(np.float64)
        if sign_method == "normal":
            best = F32_MAX
            for (a, b, c) in tris:
                d = signed_distance_normal(p, a, b, c)
                if compare_is_less(d, best):
                    best = d
            out.append(best)
        else:
            best = F32_MAX
            for (a, b, c) in tris:
                best = min(best, sdfgen_point_triangle_distance(p, a, b, c))
            odd_axes = 0
            for axis in range(raycast_axes):
                if len(_aligned_hits(p, tris, axis)) % 2 == 1:
                    odd_axes += 1
            threshold = 2 if raycast_axes == 3 else 1
            if odd_axes >= threshold:
                best = -best
            out.append(best)
    return np.asarray(out, np.float32)


def brute_grid_sdf(vertices, triangles, first_cell, cell_size, cell_count,
                   sign_method="raycast"):
    """Grid SDF: unsigned min per cell + per-line parity best-of-3
    (`grid.rs:265-378`)."""
    vertices = np.asarray(vertices, np.float32)
    first_cell = np.asarray(first_cell, np.float64)
    cell_size = np.asarray(cell_size, np.float64)
    nx, ny, nz = cell_count
    tris = [
        (vertices[i].astype(np.float64), vertices[j].astype(np.float64),
         vertices[k].astype(np.float64))
        for i, j, k in triangles
    ]

    dist = np.zeros((nx, ny, nz), np.float64)
    for x in range(nx):
        for y in range(ny):
            for z in range(nz):
                p = first_cell + np.array([x, y, z]) * cell_size
                if sign_method == "normal":
                    best = F32_MAX
                    for (a, b, c) in tris:
                        d = signed_distance_normal(p, a, b, c)
                        if compare_is_less(d, best):
                            best = d
                else:
                    best = F32_MAX
                    for (a, b, c) in tris:
                        best = min(best, sdfgen_point_triangle_distance(p, a, b, c))
                dist[x, y, z] = best

    if sign_method == "raycast":
        counts = np.zeros((nx, ny, nz, 3), np.int64)
        for axis in range(3):
            n = cell_count[axis]
            cs = cell_size[axis]
            other = [i for i in range(3) if i != axis]
            for u in range(cell_count[other[0]]):
                for v in range(cell_count[other[1]]):
                    cell = [0, 0, 0]
                    cell[other[0]] = u
                    cell[other[1]] = v
                    origin = first_cell + np.array(cell, np.float64) * cell_size
                    for t in _aligned_hits(origin, tris, axis):
                        hi = min(int(np.floor(t / cs)), n - 1)
                        for i in range(hi + 1):
                            cell[axis] = i
                            counts[cell[0], cell[1], cell[2], axis] += 1
        odd = counts % 2 == 1
        inside = odd.sum(axis=-1) >= 2
        dist = np.where(inside, -dist, dist)
    return dist.astype(np.float32)


# ---------------------------------------------------------------- meshes
def make_icosphere(subdiv=2, radius=1.0, center=(0.0, 0.0, 0.0)):
    """Watertight icosphere (procedural — no asset files needed)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (verts_list[i] + verts_list[j]) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(verts_list)
                verts_list.append(m)
            return cache[key]

        for (i, j, k) in faces:
            a = midpoint(i, j)
            b = midpoint(j, k)
            c = midpoint(k, i)
            new_faces += [[i, a, c], [j, b, a], [k, c, b], [a, b, c]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    verts = verts * radius + np.asarray(center, np.float64)
    return verts.astype(np.float32), faces.astype(np.uint32)


def make_box(size=(1.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)):
    """Watertight axis-aligned box, 12 triangles, outward normals."""
    sx, sy, sz = np.asarray(size, np.float64) / 2.0
    cx, cy, cz = center
    v = np.array(
        [
            [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz],
            [cx + sx, cy + sy, cz - sz], [cx - sx, cy + sy, cz - sz],
            [cx - sx, cy - sy, cz + sz], [cx + sx, cy - sy, cz + sz],
            [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # -z
            [4, 5, 6], [4, 6, 7],  # +z
            [0, 1, 5], [0, 5, 4],  # -y
            [3, 6, 2], [3, 7, 6],  # +y
            [0, 4, 7], [0, 7, 3],  # -x
            [1, 2, 6], [1, 6, 5],  # +x
        ],
        np.uint32,
    )
    return v.astype(np.float32), f
