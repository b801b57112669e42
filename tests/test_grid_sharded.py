"""Distributed grid generation tests (8-device virtual CPU mesh)."""
import numpy as np
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import (
    Grid,
    SignMethod,
    Strategy,
    Topology,
    generate_grid_sdf,
)
from mesh_to_sdf_tpu.parallel import mesh as pmesh
from mesh_to_sdf_tpu.parallel.grid_sharded import generate_grid_sdf_sharded_cpt


@pytest.fixture(scope="module")
def setup():
    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [32, 16, 16])
    m = pmesh.make_sdf_mesh(cells=8, tris=1)
    return v, f, g, m


def test_sharded_raycast_matches_single_device(setup):
    v, f, g, m = setup
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.RAYCAST, strategy=Strategy.CPT)
    )
    got = np.asarray(generate_grid_sdf_sharded_cpt(v, f, g, m, SignMethod.RAYCAST))
    assert (np.sign(got) == np.sign(ref)).all()
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_sharded_vs_exact_brute_contract(setup):
    """Same contract as single-device CPT: signs exact, never (materially)
    undershoots, far field within tolerance."""
    v, f, g, m = setup
    topo = Topology.triangle_list(f.reshape(-1))
    brute = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.RAYCAST, strategy=Strategy.XLA)
    )
    got = np.asarray(generate_grid_sdf_sharded_cpt(v, f, g, m, SignMethod.RAYCAST))
    assert (np.sign(got) == np.sign(brute)).all()
    # Never undershoots (absolute epsilon: near-surface cells have |d|~0, so
    # pure-relative undershoot checks amplify float noise on the subdivided
    # soup into percent-scale artifacts).
    assert np.all(np.abs(got) >= np.abs(brute) - 1e-5)
    rel = (np.abs(got) - np.abs(brute)) / np.maximum(np.abs(brute), 1e-6)
    assert rel.max() < 2e-2


def test_sharded_normal_sign(setup):
    v, f, g, m = setup
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.NORMAL, strategy=Strategy.CPT)
    )
    got = np.asarray(generate_grid_sdf_sharded_cpt(v, f, g, m, SignMethod.NORMAL))
    np.testing.assert_allclose(np.abs(got), np.abs(ref), atol=3e-3)
    assert (np.sign(got) != np.sign(ref)).mean() <= 0.01


def test_sharded_uneven_rejects():
    v, f = make_icosphere(subdiv=1)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [30, 16, 16])
    m = pmesh.make_sdf_mesh(cells=8, tris=1)
    with pytest.raises(ValueError, match="divide"):
        generate_grid_sdf_sharded_cpt(v, f, g, m)
