"""Finite-difference checks of the custom VJP (BASELINE.json north star)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mesh_to_sdf_tpu import Grid, SignMethod
from mesh_to_sdf_tpu.ops import autodiff
from mesh_to_sdf_tpu.ops.keyed import combine_champions
from mesh_to_sdf_tpu.models.sdf_layer import (
    DifferentiableSDF, pad_tri_idx, sdf_at_points, sdf_grid,
)
import baselines


def _setup(subdiv=0):
    verts, faces = baselines.make_icosphere(subdiv=subdiv)
    tri_idx = jnp.asarray(pad_tri_idx(faces.astype(np.int32), 64))
    return jnp.asarray(verts), tri_idx


def _fd_grad(f, x, eps=1e-3):
    """Central finite differences of scalar f wrt array x (float64 host loop)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32)) - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


def test_unsigned_min_distance_vertex_grads(rng):
    verts, tri_idx = _setup()
    queries = jnp.asarray(rng.uniform(-1.5, 1.5, size=(5, 3)).astype(np.float32))
    weights = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))

    def scalar(v):
        return float(jnp.sum(weights * autodiff.unsigned_min_distance(
            v, tri_idx, queries, 64)))

    grad = np.asarray(jax.grad(
        lambda v: jnp.sum(weights * autodiff.unsigned_min_distance(
            v, tri_idx, queries, 64))
    )(verts))
    fd = _fd_grad(scalar, verts)
    np.testing.assert_allclose(grad, fd, atol=3e-3, rtol=2e-2)


def test_unsigned_min_distance_query_grads(rng):
    verts, tri_idx = _setup()
    queries = jnp.asarray(rng.uniform(-1.5, 1.5, size=(4, 3)).astype(np.float32))

    def scalar(q):
        return float(jnp.sum(autodiff.unsigned_min_distance(verts, tri_idx, q, 64)))

    grad = np.asarray(jax.grad(
        lambda q: jnp.sum(autodiff.unsigned_min_distance(verts, tri_idx, q, 64))
    )(queries))
    fd = _fd_grad(scalar, queries)
    np.testing.assert_allclose(grad, fd, atol=3e-3, rtol=2e-2)
    # Gradient wrt query of a distance function has unit norm (eikonal).
    norms = np.linalg.norm(grad, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_signed_champions_grads(rng):
    verts, tri_idx = _setup()
    queries = jnp.asarray(rng.uniform(-1.4, 1.4, size=(5, 3)).astype(np.float32))

    def combined(v):
        mp, mn = autodiff.signed_champion_distances(v, tri_idx, queries, 64)
        return jnp.sum(combine_champions(mp, mn))

    grad = np.asarray(jax.grad(combined)(verts))
    fd = _fd_grad(lambda v: float(combined(v)), verts)
    np.testing.assert_allclose(grad, fd, atol=3e-3, rtol=2e-2)


def test_forward_matches_generate_sdf(rng):
    """The differentiable path must agree with the production forward."""
    from mesh_to_sdf_tpu import Topology, generate_sdf, Strategy

    verts_np, faces = baselines.make_icosphere(subdiv=1)
    verts = jnp.asarray(verts_np)
    tri_idx = jnp.asarray(pad_tri_idx(faces.astype(np.int32), 64))
    queries_np = rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32)

    for sign in (SignMethod.NORMAL, SignMethod.RAYCAST):
        a = np.asarray(sdf_at_points(verts, tri_idx, jnp.asarray(queries_np), sign,
                                     block=64))
        b = np.asarray(generate_sdf(verts_np, Topology.triangle_list(faces.reshape(-1)),
                                    queries_np, Strategy.XLA, sign_method=sign))
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_fit_vertices_to_target_grid():
    """End-to-end trainable-layer demo: inflate a small sphere toward a bigger
    target sphere by SDF-grid matching."""
    verts, faces = baselines.make_icosphere(subdiv=1, radius=0.7)
    grid = Grid.from_bounding_box([-1.5] * 3, [1.5] * 3, [12, 12, 12])
    tri = faces.astype(np.int32)

    target_verts, _ = baselines.make_icosphere(subdiv=1, radius=1.0)
    model = DifferentiableSDF(tri, grid, SignMethod.NORMAL, learning_rate=3e-2)
    target = sdf_grid(jnp.asarray(target_verts), model.tri_idx, grid,
                      SignMethod.NORMAL)

    state = model.init(verts)
    loss0 = float(model.loss(state.params, target))
    for _ in range(40):
        state, loss = model.train_step(state, target)
    loss_end = float(loss)
    assert loss_end < loss0 * 0.2, (loss0, loss_end)
    # fitted vertices should be near radius 1
    radii = np.linalg.norm(np.asarray(state.params), axis=1)
    assert abs(float(radii.mean()) - 1.0) < 0.1, radii.mean()
