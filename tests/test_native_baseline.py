"""Cross-validation of the measured C++ RtreeBvh-class baseline.

The baseline exists to MEASURE the "vs single-core reference" multipliers
(BASELINE.md); these tests pin its outputs to our exact engines so the
measured denominators are trustworthy (same signed distances ⇒ same work).
"""
import numpy as np
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import (
    Grid, SignMethod, Strategy, Topology, generate_grid_sdf, generate_sdf,
)
from mesh_to_sdf_tpu.utils import baseline


pytestmark = pytest.mark.skipif(
    not baseline.available(build=True), reason="baseline binary unavailable"
)


@pytest.fixture(scope="module")
def sphere():
    v, f = make_icosphere(subdiv=3)
    return v, f


def test_query_mode_matches_engine(sphere, rng):
    v, f = sphere
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    q = rng.uniform(-1.3, 1.3, (2000, 3)).astype(np.float32)
    out = baseline.run_query(ta, tb, tc, q)
    want = np.asarray(
        generate_sdf(v, Topology.triangle_list(f.reshape(-1)), q,
                     Strategy.XLA, sign_method=SignMethod.RAYCAST)
    )
    assert out["queries"] == len(q)
    assert out["queries_per_s"] > 0
    # Checksum of signed distances: same algorithm ⇒ same values (float
    # reassociation only).
    np.testing.assert_allclose(out["checksum"], float(want.sum()),
                               rtol=1e-4, atol=1e-3)


def test_grid_mode_matches_engine(sphere):
    v, f = sphere
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [24] * 3)
    out = baseline.run_grid(ta, tb, tc, grid)
    want = np.asarray(
        generate_grid_sdf(v, Topology.triangle_list(f.reshape(-1)), grid,
                          SignMethod.RAYCAST, strategy=Strategy.XLA)
    )
    assert out["cells"] == grid.total_cell_count
    # The baseline grid algorithm (preheap+BFS) is the reference's, which
    # asserts exact equality with brute on its meshes (`grid.rs:692-724`);
    # allow BFS propagation slack at far-field cells like our CPT contract.
    np.testing.assert_allclose(out["checksum"], float(want.sum()),
                               rtol=2e-2, atol=1e-2)
