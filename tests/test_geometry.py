"""Property-style kernel tests vs independent NumPy baselines.

Mirrors the reference's proptest strategy (`geo.rs:225-287`, 1000 cases):
closest-point distance vs an SDFGen-style baseline, aligned ray/triangle vs a
generic Möller-style baseline, over all 3 alignments.
"""
import numpy as np
import jax.numpy as jnp

from mesh_to_sdf_tpu.ops import geometry
import baselines

N_CASES = 250


def _random_case(rng, n):
    return rng.uniform(-10.0, 10.0, size=(n, 4, 3)).astype(np.float32)


def test_closest_point_triangle_vs_sdfgen(rng):
    pts = _random_case(rng, N_CASES)
    p, a, b, c = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]

    dist = np.asarray(geometry.point_triangle_distance(p, a, b, c))
    assert not np.any(np.isnan(dist))

    for i in range(N_CASES):
        base = baselines.sdfgen_point_triangle_distance(p[i], a[i], b[i], c[i])
        assert abs(dist[i] - base) < 1e-3 + 1e-4 * abs(base), (
            f"case {i}: {dist[i]} vs baseline {base}"
        )


def test_closest_point_degenerate_triangles():
    # a==b → segment [a, c] (`geo.rs:77-79`)
    p = np.array([0.0, 1.0, 0.0], np.float32)
    a = np.array([0.0, 0.0, 0.0], np.float32)
    c = np.array([2.0, 0.0, 0.0], np.float32)
    d = float(geometry.point_triangle_distance(p, a, a, c))
    assert abs(d - 1.0) < 1e-6

    # all equal → vertex
    d = float(geometry.point_triangle_distance(p, a, a, a))
    assert abs(d - 1.0) < 1e-6

    # b==c → segment [a, b]
    b = np.array([2.0, 0.0, 0.0], np.float32)
    d = float(geometry.point_triangle_distance(p, a, b, b))
    assert abs(d - 1.0) < 1e-6

    # collinear (degenerate but unequal vertices) must not NaN
    b2 = np.array([1.0, 0.0, 0.0], np.float32)
    d = float(geometry.point_triangle_distance(p, a, b2, c))
    assert np.isfinite(d)
    assert abs(d - 1.0) < 1e-5


def test_barycentric_sums_to_one(rng):
    pts = _random_case(rng, 300)
    bary = np.asarray(
        geometry.closest_point_barycentric(pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
    )
    assert np.allclose(bary.sum(-1), 1.0, atol=1e-5)
    assert np.all(bary >= -1e-6) and np.all(bary <= 1.0 + 1e-6)


def test_closest_point_segment():
    # `geo.rs:311-323`
    a = np.array([0.0, 0.0, 0.0], np.float32)
    b = np.array([1.0, 0.0, 0.0], np.float32)
    p = np.array([0.3, 1.0, 0.0], np.float32)
    q = np.asarray(geometry.closest_point_on_triangle(p, a, b, b))
    assert np.allclose(q, [0.3, 0.0, 0.0], atol=1e-6)
    p2 = np.array([10.3, 1.0, 10.0], np.float32)
    q2 = np.asarray(geometry.closest_point_on_triangle(p2, a, b, b))
    assert np.allclose(q2, [1.0, 0.0, 0.0], atol=1e-6)


def test_ray_triangle_aligned_vs_generic(rng):
    pts = _random_case(rng, N_CASES)
    p, a, b, c = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]
    dirs = np.eye(3)

    for axis in range(3):
        hit, t = geometry.ray_triangle_aligned(p, a, b, c, axis)
        hit = np.asarray(hit)
        t = np.asarray(t)
        for i in range(N_CASES):
            base = baselines.moller_ray_triangle(p[i], dirs[axis], a[i], b[i], c[i])
            if hit[i] and base is not None:
                assert abs(t[i] - base) < 1e-3 + 1e-3 * abs(base)
            # Boundary-grazing rays may legitimately disagree between the two
            # formulations (strict-sign test vs >=0 plane test); only flag
            # clear interior hits/misses.
            elif hit[i] != (base is not None):
                # recompute edge weights; skip if near an edge (|w| small)
                if base is not None and base > 1e-3:
                    ix, iy, iz = axis, (axis + 1) % 3, (axis + 2) % 3
                    e01, e12, e20 = b[i] - a[i], c[i] - b[i], a[i] - c[i]
                    p0, p1, p2 = p[i] - a[i], p[i] - b[i], p[i] - c[i]
                    w0 = p1[iz] * e12[iy] - p1[iy] * e12[iz]
                    w1 = p2[iz] * e20[iy] - p2[iy] * e20[iz]
                    w2 = p0[iz] * e01[iy] - p0[iy] * e01[iz]
                    wmin = min(abs(w0), abs(w1), abs(w2))
                    assert wmin < 1e-2, (
                        f"axis {axis} case {i}: hit={hit[i]} generic={base} "
                        f"weights=({w0},{w1},{w2})"
                    )


def test_ray_triangle_known_cases():
    # `geo.rs:289-309` adapted to aligned rays
    a = np.array([0.0, 1.0, 0.0], np.float32)
    b = np.array([1.0, 0.0, 0.0], np.float32)
    c = np.array([0.0, 0.0, 1.0], np.float32)
    origin = np.array([0.2, 0.2, 0.2], np.float32)
    hit, t = geometry.ray_triangle_aligned(origin, a, b, c, 2)
    assert bool(hit)
    assert float(t) > 0

    # pointing away: origin beyond the triangle
    origin2 = np.array([0.2, 0.2, 0.9], np.float32)
    hit2, _ = geometry.ray_triangle_aligned(origin2, a, b, c, 2)
    assert not bool(hit2)


def test_triangle_bounding_box():
    a = np.array([0.0, 1.0, 2.0], np.float32)
    b = np.array([3.0, -1.0, 0.0], np.float32)
    c = np.array([1.0, 5.0, -2.0], np.float32)
    lo, hi = geometry.triangle_bounding_box(a, b, c)
    eps = geometry.AABB_EPSILON
    assert np.allclose(np.asarray(lo), [0 - eps, -1 - eps, -2 - eps], atol=1e-7)
    assert np.allclose(np.asarray(hi), [3 + eps, 5 + eps, 2 + eps], atol=1e-7)


def test_signed_distance_sign_convention():
    # Triangle in the xy plane, normal +z (counter-clockwise winding).
    a = np.array([0.0, 0.0, 0.0], np.float32)
    b = np.array([1.0, 0.0, 0.0], np.float32)
    c = np.array([0.0, 1.0, 0.0], np.float32)
    above = np.array([0.2, 0.2, 0.5], np.float32)
    below = np.array([0.2, 0.2, -0.5], np.float32)
    d_above = float(geometry.point_triangle_signed_distance(above, a, b, c))
    d_below = float(geometry.point_triangle_signed_distance(below, a, b, c))
    assert abs(d_above - 0.5) < 1e-6
    assert abs(d_below + 0.5) < 1e-6
