"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mesh_to_sdf_tpu import Grid, SignMethod, Strategy, Topology, generate_sdf
from mesh_to_sdf_tpu.models.sdf_layer import pad_tri_idx, sdf_grid
from mesh_to_sdf_tpu.parallel import mesh as pmesh
from mesh_to_sdf_tpu.parallel import sharding
import baselines


@pytest.fixture(scope="module")
def meshes():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return {
        "cells8": pmesh.make_sdf_mesh(cells=8, tris=1),
        "cells4_tris2": pmesh.make_sdf_mesh(cells=4, tris=2),
        "cells2_tris4": pmesh.make_sdf_mesh(cells=2, tris=4),
    }


@pytest.mark.parametrize("mesh_name", ["cells8", "cells4_tris2", "cells2_tris4"])
@pytest.mark.parametrize("sign", [SignMethod.RAYCAST, SignMethod.NORMAL])
def test_sharded_matches_single_device(meshes, mesh_name, sign, rng):
    verts, faces = baselines.make_icosphere(subdiv=1)
    queries = rng.uniform(-1.5, 1.5, size=(100, 3)).astype(np.float32)

    ref = np.asarray(
        generate_sdf(verts, Topology.triangle_list(faces.reshape(-1)), queries,
                     Strategy.XLA, sign_method=sign)
    )
    out = np.asarray(
        sharding.generate_sdf_sharded(
            verts, faces.astype(np.int32), queries, meshes[mesh_name], sign,
            block=64,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_sharded_grid_matches(meshes):
    verts, faces = baselines.make_icosphere(subdiv=1)
    grid = Grid.from_bounding_box([-1.4] * 3, [1.4] * 3, [8, 8, 8])
    from mesh_to_sdf_tpu import generate_grid_sdf

    ref = np.asarray(
        generate_grid_sdf(verts, Topology.triangle_list(faces.reshape(-1)), grid,
                          SignMethod.NORMAL)
    )
    out = np.asarray(
        sharding.generate_grid_sdf_sharded(
            verts, faces.astype(np.int32), grid, meshes["cells4_tris2"],
            SignMethod.NORMAL, block=64,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_sharded_train_step_runs_and_descends(meshes):
    """Full sharded training step: loss decreases, grads all-reduced."""
    mesh = meshes["cells4_tris2"]
    verts, faces = baselines.make_icosphere(subdiv=1, radius=0.8)
    target_verts, _ = baselines.make_icosphere(subdiv=1, radius=1.0)
    grid = Grid.from_bounding_box([-1.4] * 3, [1.4] * 3, [8, 8, 8])

    tx = optax.adam(2e-2)
    step, pad_target = sharding.sharded_fit_step_fn(
        mesh, faces.astype(np.int32), grid, tx, SignMethod.NORMAL, block=64
    )
    target = pad_target(
        np.asarray(
            sdf_grid(
                jnp.asarray(target_verts),
                jnp.asarray(pad_tri_idx(faces.astype(np.int32), 64)),
                grid, SignMethod.NORMAL,
            )
        ).reshape(-1)
    )

    v = jax.device_put(jnp.asarray(verts), pmesh.replicated(mesh))
    opt_state = tx.init(v)
    losses = []
    for _ in range(10):
        v, opt_state, loss = step(v, opt_state, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    # vertices stay replicated & finite
    assert np.all(np.isfinite(np.asarray(v)))


def test_sharded_gradient_matches_single_device(meshes):
    """Vertex grads from the sharded path == single-device custom VJP."""
    mesh = meshes["cells2_tris4"]
    verts, faces = baselines.make_icosphere(subdiv=0)
    queries = np.linspace(-1.2, 1.2, 16 * 3).reshape(16, 3).astype(np.float32)

    tri_pad = pad_tri_idx(faces.astype(np.int32), 64)
    from mesh_to_sdf_tpu.ops import autodiff
    from mesh_to_sdf_tpu.ops.keyed import combine_champions

    def single(v):
        mp, mn = autodiff.signed_champion_distances(
            v, jnp.asarray(tri_pad), jnp.asarray(queries), 64)
        return jnp.sum(combine_champions(mp, mn))

    g_single = np.asarray(jax.grad(single)(jnp.asarray(verts)))

    fn = sharding.sharded_sdf_fn(mesh, SignMethod.NORMAL, block=32)
    tri_np = np.asarray(faces, np.int32)
    Mpad = pmesh.pad_for_axis(tri_np.shape[0], mesh, pmesh.TRI_AXIS, 32)
    tri_np = np.concatenate([tri_np, np.full((Mpad - tri_np.shape[0], 3), -1, np.int32)])

    def sharded(v):
        return jnp.sum(fn(v, jnp.asarray(tri_np), jnp.asarray(queries)))

    g_sharded = np.asarray(jax.grad(sharded)(jnp.asarray(verts)))
    np.testing.assert_allclose(g_sharded, g_single, atol=1e-5, rtol=1e-4)
