"""Slab-streamed grid generation (bounded-memory path for huge grids)."""
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
from mesh_to_sdf_tpu.gridgen_streamed import generate_grid_sdf_streamed


@pytest.fixture(scope="module")
def setup():
    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [32, 16, 16])
    return v, f, g


def test_streamed_matches_cpt(setup):
    v, f, g = setup
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.RAYCAST, strategy=Strategy.CPT)
    )
    got = generate_grid_sdf_streamed(v, f, g, SignMethod.RAYCAST, slab_nx=8)
    assert (np.sign(got) == np.sign(ref)).all()
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_streamed_normal_sign(setup):
    v, f, g = setup
    topo = Topology.triangle_list(f.reshape(-1))
    ref = np.asarray(
        generate_grid_sdf(v, topo, g, SignMethod.NORMAL, strategy=Strategy.CPT)
    )
    got = generate_grid_sdf_streamed(v, f, g, SignMethod.NORMAL, slab_nx=8)
    np.testing.assert_allclose(np.abs(got), np.abs(ref), atol=3e-3)
    assert (np.sign(got) != np.sign(ref)).mean() <= 0.01


def test_streamed_bad_slab(setup):
    v, f, g = setup
    with pytest.raises(ValueError, match="multiple"):
        generate_grid_sdf_streamed(v, f, g, slab_nx=5)
