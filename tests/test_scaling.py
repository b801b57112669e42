"""Weak-scaling efficiency harness (parallel/scaling.py).

On the 8-virtual-device CPU mesh the efficiency numbers are plumbing-only
(report carries non_predictive=True); what these tests pin down is the
harness contract: report structure, monotone device counts, positive
timings, a 100% first row, and that the measured pipeline is the REAL
sharded CPT pipeline (values match the single-device engine).
"""
import numpy as np
import pytest

import jax

from mesh_to_sdf_tpu.parallel.scaling import (
    _pow2_counts,
    format_report,
    measure_weak_scaling,
)


def test_pow2_counts():
    assert _pow2_counts(8) == [1, 2, 4, 8]
    assert _pow2_counts(6) == [1, 2, 4, 6]
    assert _pow2_counts(1) == [1]


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_weak_scaling_report_contract():
    report = measure_weak_scaling(
        base_nx=8, ny=16, nz=16, subdiv=1, repeats=2,
        device_counts=[1, 2, 4],
    )
    assert report["non_predictive"] is True  # CPU virtual mesh
    assert report["cells_per_device"] == 8 * 16 * 16
    rows = report["rows"]
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert [r["nx"] for r in rows] == [8, 16, 32]
    assert rows[0]["efficiency_pct"] == 100.0
    for r in rows:
        assert r["median_ms"] > 0
        assert r["min_ms"] <= r["median_ms"] + 1e-9
        assert r["cells_per_s_per_device"] > 0
        assert 0 < r["efficiency_pct"] <= 200.0

    text = format_report(report)
    assert "plumbing only" in text
    assert text.count("eff") == len(rows)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 virtual devices")
def test_scaling_workload_matches_single_device_engine():
    """The harness must time the real pipeline: re-run its n=2 workload
    directly and compare against the unsharded CPT engine."""
    from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
    from mesh_to_sdf_tpu.parallel import mesh as pmesh
    from mesh_to_sdf_tpu.parallel.grid_sharded import (
        generate_grid_sdf_sharded_cpt,
    )
    from mesh_to_sdf_tpu.utils.meshgen import icosphere

    verts, faces = icosphere(subdiv=1)
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [16, 16, 16])
    dmesh = pmesh.make_sdf_mesh(cells=2, tris=1, devices=jax.devices()[:2])
    got = np.asarray(
        generate_grid_sdf_sharded_cpt(
            verts, faces, grid, dmesh, SignMethod.RAYCAST
        )
    )
    want = np.asarray(
        generate_grid_sdf(
            verts, Topology.triangle_list(faces.reshape(-1)), grid,
            SignMethod.RAYCAST,
        )
    ).reshape(-1)
    assert (np.sign(got) == np.sign(want)).mean() > 0.995
    np.testing.assert_allclose(got, want, atol=3e-3)
