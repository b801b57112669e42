"""Pallas kernel consistency vs the XLA engine (interpret mode on CPU).

The cross-backend strategy of the reference (SURVEY.md §4.3): every
accelerated path is validated against a slower trusted one on real meshes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import (
    AccelerationMethod,
    SignMethod,
    Strategy,
    Topology,
    generate_sdf,
)
from mesh_to_sdf_tpu.ops.kernels import pallas_sdf


@pytest.fixture(scope="module")
def mesh():
    return make_icosphere(subdiv=2)


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(7)
    return rng.uniform(-1.5, 1.5, (700, 3)).astype(np.float32)


def _tris(mesh):
    v, f = mesh
    return (
        jnp.asarray(v[f[:, 0]]),
        jnp.asarray(v[f[:, 1]]),
        jnp.asarray(v[f[:, 2]]),
    )


def test_raycast_matches_xla(mesh, queries):
    v, f = mesh
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_sdf(v, topo, queries, AccelerationMethod.none(SignMethod.RAYCAST))
    )
    ta, tb, tc = _tris(mesh)
    got = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(queries), ta, tb, tc, raycast_axes=1, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_raycast3_matches_xla(mesh, queries):
    v, f = mesh
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_sdf(v, topo, queries, AccelerationMethod.bvh(SignMethod.RAYCAST))
    )
    ta, tb, tc = _tris(mesh)
    got = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(queries), ta, tb, tc, raycast_axes=3, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_normal_matches_xla(mesh, queries):
    v, f = mesh
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_sdf(v, topo, queries, AccelerationMethod.none(SignMethod.NORMAL))
    )
    ta, tb, tc = _tris(mesh)
    got = np.asarray(
        pallas_sdf.sdf_normal_pallas(
            jnp.asarray(queries), ta, tb, tc, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unsigned_grid_mode(mesh, queries):
    """raycast_axes=0 returns the unsigned distance (grid distance pass)."""
    v, f = mesh
    ta, tb, tc = _tris(mesh)
    got = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(queries), ta, tb, tc, raycast_axes=0, interpret=True
        )
    )
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.abs(
        np.asarray(
            generate_sdf(v, topo, queries, AccelerationMethod.none(SignMethod.RAYCAST))
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert (got >= 0).all()


def test_degenerate_triangles(queries):
    """Degenerate (segment/point) triangles match the XLA ladder exactly."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 3)).astype(np.float32)
    b = a.copy()  # b == a → segment [a, c]
    c = rng.standard_normal((64, 3)).astype(np.float32)
    b[32:] = c[32:]  # b == c → segment [a, b]
    c[48:] = a[48:]  # all equal → vertex a
    b[48:] = a[48:]

    from mesh_to_sdf_tpu.ops import geometry

    q = queries[:100]
    ref = np.asarray(
        geometry.point_triangle_distance(
            q[:, None, :], a[None], b[None], c[None]
        ).min(axis=1)
    )
    got = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(q),
            jnp.asarray(a),
            jnp.asarray(b),
            jnp.asarray(c),
            raycast_axes=0,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pad_tail_is_neutral(mesh):
    """Triangle counts not divisible by the block size give identical results
    (PAD_COORD sentinel rows must never win a champion or cross a ray)."""
    v, f = mesh
    ta, tb, tc = _tris(mesh)
    q = np.asarray([[0.3, 0.2, 0.1], [2.0, 1.5, 0.7]], np.float32)
    full = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(q), ta, tb, tc, raycast_axes=1, interpret=True
        )
    )
    odd = 321  # not a multiple of anything relevant
    got = np.asarray(
        pallas_sdf.sdf_raycast_pallas(
            jnp.asarray(q), ta[:odd], tb[:odd], tc[:odd], raycast_axes=1,
            interpret=True,
        )
    )
    assert np.isfinite(got).all()
    # With fewer triangles the sphere is open: distances must be >= full-mesh
    # unsigned distances (removing triangles can only increase distance).
    assert (np.abs(got) + 1e-5 >= np.abs(full) - 1e-5).all()


def test_generate_sdf_pallas_strategy(mesh, queries):
    """Strategy.PALLAS through the public API (interpret transparently off-TPU
    is not wired — call the kernel path explicitly instead)."""
    v, f = mesh
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_sdf(v, topo, queries, Strategy.XLA, sign_method=SignMethod.RAYCAST)
    )
    assert ref.shape == (700,)


def test_line_parity_kernel_matches_xla():
    """Pallas line-parity kernel vs the XLA sort-based kernel (sphere+torus)."""
    import jax.numpy as jnp

    from mesh_to_sdf_tpu import Grid
    from mesh_to_sdf_tpu.ops import raycast
    from mesh_to_sdf_tpu.ops.kernels import pallas_parity
    from mesh_to_sdf_tpu.utils.meshgen import torus

    for v, f in (make_icosphere(subdiv=2), torus(n_major=24, n_minor=12)):
        ta = jnp.asarray(v[f[:, 0]])
        tb = jnp.asarray(v[f[:, 1]])
        tc = jnp.asarray(v[f[:, 2]])
        g = Grid.from_bounding_box(v.min(0) - 0.2, v.max(0) + 0.2, [16, 16, 16])
        ref = np.asarray(
            raycast.grid_inside_mask(
                g, ta, tb, tc, jnp.ones((ta.shape[0],), bool), tri_block=256
            )
        )
        got, ovf = pallas_parity.grid_inside_mask_pallas(
            g, ta, tb, tc, interpret=True
        )
        assert int(ovf) == 0
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_line_parity_counts_vs_bruteforce():
    """Raw per-cell crossing counts vs a numpy brute force on one axis."""
    import jax.numpy as jnp

    from mesh_to_sdf_tpu import Grid
    from mesh_to_sdf_tpu.ops.kernels import pallas_parity
    from mesh_to_sdf_tpu.ops import geometry

    v, f = make_icosphere(subdiv=1)
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    g = Grid.from_bounding_box([-1.2] * 3, [1.2] * 3, [8, 8, 8])
    axis = 0
    from mesh_to_sdf_tpu.ops.raycast import face_origins

    origins, lshape = face_origins(g, axis)
    iy, iz = 1, 2
    counts, ovf = pallas_parity.line_parity_counts(
        jnp.asarray(origins[:, iy]),
        jnp.asarray(origins[:, iz]),
        g.first_cell[axis],
        g.cell_size[axis],
        pallas_parity.rotate_planes(
            jnp.asarray(ta), jnp.asarray(tb), jnp.asarray(tc), axis
        ),
        n_cells=8,
        interpret=True,
    )
    assert int(np.asarray(ovf).sum()) == 0
    # numpy reference: same hit test via geometry.ray_triangle_aligned_2d
    o = np.asarray(origins)[:, None, :]
    inside, t = geometry.ray_triangle_aligned_2d(
        jnp.asarray(o), jnp.asarray(ta)[None], jnp.asarray(tb)[None],
        jnp.asarray(tc)[None], axis
    )
    hit = np.asarray(inside & (t > 0))
    bucket = np.floor(np.asarray(t) / float(g.cell_size[axis]))
    want = np.zeros((len(o), 8), np.int32)
    for c in range(8):
        want[:, c] = (hit & (bucket >= c)).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(counts), want)
