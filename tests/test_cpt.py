"""Closest-point-transform engine tests.

The reference asserts its propagation flagship equals brute force on real
meshes (`generate/grid.rs:692-724`); CPT is held to an explicit two-tier
contract instead: exact within a 3-cell band of the surface, ≤0.5%-relative
deviation in the far field (both propagation schemes are heuristics made
safe by exact re-evaluation — see ops/cpt.py docstring).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import (
    Grid,
    SignMethod,
    Strategy,
    Topology,
    generate_grid_sdf,
)
from mesh_to_sdf_tpu.ops import cpt
from mesh_to_sdf_tpu.utils.meshgen import box, torus


def _brute_unsigned(v, f, g):
    return np.abs(
        np.asarray(
            generate_grid_sdf(
                v,
                Topology.triangle_list(f.reshape(-1)),
                g,
                SignMethod.RAYCAST,
                strategy=Strategy.XLA,
                flat=False,
            )
        )
    )


def _cpt_dist(v, f, g, **kw):
    cs = float(np.max(np.abs(np.asarray(g.cell_size))))
    ra, rb, rc = cpt.subdivide_to_span(v, f, max_edge=(cpt.SEED_SPAN - 1.5) * cs)
    d, idx = cpt.closest_point_grid(
        g, jnp.asarray(ra), jnp.asarray(rb), jnp.asarray(rc), **kw
    )
    return np.asarray(d), np.asarray(idx)


CASES = [
    ("sphere", make_icosphere(subdiv=2), 20),
    ("torus", torus(n_major=24, n_minor=12), 18),
    ("box", box(), 16),
]


@pytest.mark.parametrize("name,mesh,n", CASES)
def test_cpt_contract(name, mesh, n):
    v, f = mesh
    g = Grid.from_bounding_box(v.min(0) - 0.25, v.max(0) + 0.25, [n, n, n])
    ref = _brute_unsigned(v, f, g)
    got, idx = _cpt_dist(v, f, g)
    assert (idx >= 0).all(), "unseeded cells survived the sweeps"
    cs = float(np.max(np.abs(np.asarray(g.cell_size))))
    err = got - ref
    # CPT only ever evaluates exact distances to real triangles → can never
    # undershoot the true minimum.
    assert err.min() > -1e-5, err.min()
    near = ref <= 1.5 * cs
    np.testing.assert_allclose(got[near], ref[near], atol=1e-5,
                               err_msg=f"{name}: seed band not exact")
    rel = err / np.maximum(ref, 1e-6)
    assert rel.max() <= 2e-2, f"{name}: far-field deviation {rel.max():.2%}"


def test_cpt_through_generate_grid_sdf():
    """AUTO grid strategy = CPT; signs must match the XLA engine exactly."""
    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [16] * 3)
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.RAYCAST, strategy=Strategy.XLA)
    )
    got = np.asarray(generate_grid_sdf(v, topo, g, SignMethod.RAYCAST))
    assert (np.sign(got) == np.sign(ref)).all()
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_subdivide_to_span():
    v, f = box()
    ra, rb, rc = cpt.subdivide_to_span(v, f, max_edge=0.5)
    edges = np.stack(
        [
            np.linalg.norm(rb - ra, axis=1),
            np.linalg.norm(rc - rb, axis=1),
            np.linalg.norm(ra - rc, axis=1),
        ]
    )
    assert edges.max() <= 0.5 + 1e-6
    # Surface area preserved.
    def area(a, b, c):
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()

    a0 = area(v[f[:, 0]], v[f[:, 1]], v[f[:, 2]])
    assert abs(area(ra, rb, rc) - a0) < 1e-3 * a0


def test_cpt_seeds_cover_surface():
    """Every cell adjacent to the surface is seeded directly (preheap parity
    with `grid.rs:383-456`)."""
    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [20] * 3)
    ta = jnp.asarray(v[f[:, 0]])
    tb = jnp.asarray(v[f[:, 1]])
    tc = jnp.asarray(v[f[:, 2]])
    dist, idx, *_ = cpt._seed(g, ta, tb, tc, cpt.SEED_SPAN)
    dist = np.asarray(dist).reshape(20, 20, 20)
    ref = _brute_unsigned(v, f, g)
    cs = float(np.max(np.asarray(g.cell_size)))
    near = ref <= 1.0 * cs
    assert (dist[near] < 3.0e38).all()
    np.testing.assert_allclose(dist[near], ref[near], atol=1e-5)


def test_cpt_normal_sign_matches_rtree_semantics():
    """Nearest-triangle sign (reference Rtree, `rtree.rs:96-126`): |d| matches
    the champion engine and signs disagree on at most ~1% of cells — the
    budget the reference's own test allows (`rtree.rs:171-242`)."""
    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [16] * 3)
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.NORMAL,
                          strategy=Strategy.XLA, flat=False)
    )
    got = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.NORMAL,
                          strategy=Strategy.CPT, flat=False)
    )
    np.testing.assert_allclose(np.abs(got), np.abs(ref), atol=5e-3)
    mismatch = (np.sign(got) != np.sign(ref)).mean()
    assert mismatch <= 0.01, mismatch


def test_cpt_grid_gradients_fd():
    """CPT-backed differentiable grid: envelope VJP vs finite differences."""
    import jax
    import jax.numpy as jnp

    from mesh_to_sdf_tpu.ops import autodiff

    v, f = make_icosphere(subdiv=1)
    g = Grid.from_bounding_box([-1.4] * 3, [1.4] * 3, [10] * 3)
    fn = autodiff.make_cpt_grid_distance(g, f, v, use_pallas=False)
    vj = jnp.asarray(v)

    def loss(vv):
        return jnp.sum((fn(vv) - 0.3) ** 2)

    gr = jax.grad(loss)(vj)
    eps = 1e-3
    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(6):
        i = int(rng.integers(0, len(v)))
        k = int(rng.integers(0, 3))
        vp = vj.at[i, k].add(eps)
        vm = vj.at[i, k].add(-eps)
        fd = (float(loss(vp)) - float(loss(vm))) / (2 * eps)
        an = float(gr[i, k])
        if abs(fd) < 0.2:
            continue  # fd unreliable near Voronoi boundaries
        np.testing.assert_allclose(an, fd, rtol=5e-2)
        checked += 1
    assert checked >= 3


def test_differentiable_sdf_cpt_engine():
    from mesh_to_sdf_tpu.models.sdf_layer import DifferentiableSDF

    v, f = make_icosphere(subdiv=1)
    g = Grid.from_bounding_box([-1.5] * 3, [1.5] * 3, [10] * 3)
    target = np.abs(
        np.asarray(
            generate_grid_sdf(
                v * 1.15, Topology.triangle_list(f.reshape(-1)), g,
                SignMethod.NORMAL, strategy=Strategy.XLA, flat=False,
            )
        )
    )
    import jax.numpy as jnp

    model = DifferentiableSDF(
        f.astype(np.int32), g, SignMethod.NORMAL, learning_rate=5e-2,
        engine="cpt", vertices_example=v,
    )
    state = model.init(v)
    losses = []
    for _ in range(6):
        state, loss = model.train_step(state, jnp.asarray(target))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
