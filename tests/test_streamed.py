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


def test_slab_sign_binned_matches_xla(rng):
    """The per-slab pallas sign with candidate line-bins == the slab-local
    XLA suffix-parity sign (exercises build_slab_line_bins' common-width
    padding and the slab-offset footprints, interpret mode)."""
    import jax.numpy as jnp

    from mesh_to_sdf_tpu.gridgen_streamed import (
        _slab_sign_raycast, build_slab_line_bins,
    )

    v, f = make_icosphere(subdiv=2)
    oa, ob, oc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    grid = Grid.from_bounding_box([-1.4] * 3, [1.4] * 3, [16, 12, 12])
    slab_nx, n_slabs = 4, 4
    bins = build_slab_line_bins(grid, slab_nx, n_slabs, oa, ob, oc)
    assert len(bins) == n_slabs
    # Common table width per axis (one compiled program serves every slab).
    assert len({b[1].tbl.shape for b in bins}) == 1
    assert len({b[2].tbl.shape for b in bins}) == 1

    orig = jnp.asarray(np.stack([oa, ob, oc]))
    cs = jnp.asarray(grid.cell_size)
    cell_count = (slab_nx, 12, 12)
    dist = jnp.ones((slab_nx, 12, 12), jnp.float32)
    for i in range(n_slabs):
        fc = jnp.asarray(grid.first_cell) + jnp.asarray(
            [i * slab_nx, 0, 0], jnp.float32) * cs
        want, _ = _slab_sign_raycast(fc, cs, cell_count, dist, orig, False)
        got, ovf = _slab_sign_raycast(fc, cs, cell_count, dist, orig, True,
                                      line_bins=bins[i])
        assert int(ovf) == 0
        assert (np.sign(np.asarray(got)) == np.sign(np.asarray(want))).all()
