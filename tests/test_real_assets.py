"""Parity tests on the reference's real GLB assets.

The reference validates its backends on real meshes — suzanne at 32^3 with
0.01 tolerance (`bvh.rs:153-249`), rtree vs grid with a ~1% sign-mismatch
budget (`rtree.rs:171-242`), knight/FlightHelmet as its criterion workloads
(`benches/generate_sdf.rs:12-58,185-236`). These tests put the same assets
through this framework's engines, cross-checked against each other and the
independent NumPy oracle (tests/baselines.py).
"""
import os

import numpy as np
import pytest

import mesh_to_sdf_tpu as m
from mesh_to_sdf_tpu import Grid, SignMethod, Strategy, Topology
from mesh_to_sdf_tpu.io import gltf

import baselines

ASSETS = "/root/reference/mesh_to_sdf/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not mounted"
)

_CACHE = {}


def load(name):
    """Merged (vertices, faces) for a reference asset, cached per session."""
    if name not in _CACHE:
        scene = gltf.load_scene(f"{ASSETS}/{name}.glb")
        _CACHE[name] = scene.merge()
    return _CACHE[name]


def sample_queries(verts, n, rng, scale=1.3):
    """Random points in the mesh's bbox inflated by `scale` (mix of inside/out)."""
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    c = (lo + hi) / 2
    half = (hi - lo) / 2 * scale
    return (c + rng.uniform(-1, 1, (n, 3)) * half).astype(np.float32)


def test_asset_counts_match_reference():
    """Merged counts equal the reference's documented workloads
    (`benches/generate_sdf.rs:12` knight, `:186` FlightHelmet)."""
    v, f = load("knight")
    assert len(f) == 11184
    v, f = load("FlightHelmet")
    assert len(f) == 94722
    v, f = load("suzanne")
    assert len(f) == 968


def test_suzanne_query_vs_numpy_oracle(rng):
    """XLA engine vs the independent NumPy oracle on suzanne, both signs."""
    verts, faces = load("suzanne")
    topo = Topology.triangle_list(faces.reshape(-1))
    q = sample_queries(verts, 96, rng)
    for sign in ("raycast", "normal"):
        got = np.asarray(
            m.generate_sdf(
                verts, topo, q, Strategy.XLA,
                sign_method=SignMethod(sign),
            )
        )
        want = baselines.brute_sdf(verts, faces, q, sign_method=sign)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_suzanne_reference_ground_truth_anchor():
    """Anchor to values the REFERENCE itself computed and committed
    (`generate/generic/default.rs:99-108`): suzanne at query points
    (0,0,0) / (1,1,1) / (0.1,0.2,0.2) with SignMethod::Normal must land
    within 0.1 of the pysdf-derived triple [-0.42, 0.69, -0.46] (negative
    = inside, the crate's convention). This is the one test whose expected
    numbers were produced OUTSIDE this repo — it fails if our sign
    convention or distance magnitude ever drifts from the reference's own
    committed ground truth. (For the record, the crate computes
    [-0.40961263, 0.6929414, -0.46345082]; we match those to ~5e-3.)"""
    verts, faces = load("suzanne")
    topo = Topology.triangle_list(faces.reshape(-1))
    q = np.array([[0, 0, 0], [1, 1, 1], [0.1, 0.2, 0.2]], np.float32)
    baseline = np.array([-0.42, 0.69, -0.46])
    for strat in (Strategy.XLA, Strategy.PALLAS):
        got = np.asarray(
            m.generate_sdf(verts, topo, q, strat,
                           sign_method=SignMethod.NORMAL)
        )
        assert np.all(np.abs(got - baseline) < 0.1), (strat, got)
        # Tighter: match the crate's own reported output to 1e-2.
        crate = np.array([-0.40961263, 0.6929414, -0.46345082])
        assert np.all(np.abs(got - crate) < 1e-2), (strat, got)


def test_knight_culled_matches_xla(rng):
    """CULLED (the analog of the reference's Rtree/RtreeBvh best backend) must
    agree with the exact engine on knight (11,184 tris — above the culling
    fallback threshold, so the real candidate path runs)."""
    verts, faces = load("knight")
    topo = Topology.triangle_list(faces.reshape(-1))
    q = sample_queries(verts, 256, rng)
    for sign in (SignMethod.RAYCAST, SignMethod.NORMAL):
        exact = np.asarray(
            m.generate_sdf(verts, topo, q, Strategy.XLA, sign_method=sign)
        )
        culled = np.asarray(
            m.generate_sdf(verts, topo, q, Strategy.CULLED, sign_method=sign)
        )
        np.testing.assert_allclose(np.abs(culled), np.abs(exact), rtol=1e-4,
                                   atol=1e-6, err_msg=str(sign))
        # Sign: raycast must agree exactly (parity is exact); normal sign may
        # differ on near-edge ties like the reference allows (`rtree.rs:227-239`).
        mismatches = np.mean(np.sign(culled) != np.sign(exact))
        budget = 0.0 if sign == SignMethod.RAYCAST else 0.01
        assert mismatches <= budget, f"{sign}: {mismatches:.3%} sign mismatches"


def test_flighthelmet_culled_matches_xla(rng):
    """FlightHelmet (94,722 tris) — the reference's 'big_big' workload
    (`benches/generate_sdf.rs:185-236`)."""
    verts, faces = load("FlightHelmet")
    topo = Topology.triangle_list(faces.reshape(-1))
    q = sample_queries(verts, 128, rng)
    exact = np.asarray(
        m.generate_sdf(verts, topo, q, Strategy.XLA,
                       sign_method=SignMethod.RAYCAST)
    )
    culled = np.asarray(
        m.generate_sdf(verts, topo, q, Strategy.CULLED,
                       sign_method=SignMethod.RAYCAST)
    )
    np.testing.assert_allclose(np.abs(culled), np.abs(exact), rtol=1e-4,
                               atol=1e-6)
    assert np.array_equal(np.sign(culled), np.sign(exact))


def test_suzanne_grid_strategies_agree():
    """Grid engines on suzanne at 32^3 — the reference's own real-mesh grid
    test setup (`bvh.rs:191-249`, `rtree.rs:171-242`): dense engine vs CPT,
    0.01 absolute tolerance on |distance|, ≤0.5% sign-mismatch budget."""
    verts, faces = load("suzanne")
    topo = Topology.triangle_list(faces.reshape(-1))
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    grid = Grid.from_bounding_box(lo, hi, [32, 32, 32])

    dense = np.asarray(
        m.generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST,
                            strategy=Strategy.XLA)
    )
    cpt = np.asarray(
        m.generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST,
                            strategy=Strategy.CPT)
    )
    # CPT contract: never undershoots; ≤2% relative in the far field OR
    # within an absolute epsilon (on-surface cells: |d| ≈ 0 makes any fp
    # difference a huge "relative" error).
    assert np.all(np.abs(cpt) >= np.abs(dense) - 1e-4)
    diff = np.abs(np.abs(cpt) - np.abs(dense))
    rel = diff / np.maximum(np.abs(dense), 1e-3)
    ok = (rel < 0.025) | (diff < 1e-4)
    assert ok.all(), (rel.max(), diff[~ok])
    sign_mismatch = np.mean(np.sign(cpt) != np.sign(dense))
    assert sign_mismatch <= 0.005, f"{sign_mismatch:.3%}"


@pytest.mark.parametrize(
    "asset,res",
    [
        ("suzanne", 16), ("suzanne", 24), ("suzanne", 32),
        ("knight", 16), ("knight", 24), ("knight", 32),
        ("ferris3d", 24), ("annoted_cube", 16), ("FlightHelmet", 16),
    ],
)
def test_cpt_contract_on_real_assets(asset, res):
    """The CPT far-field contract — never undershoots, ≤2% relative beyond
    the exact band — asserted on ALL FIVE reference assets across the
    resolutions that stress it (thin features vs coarse cells). The r2
    worst case was 2.6% on knight@24³ (contract breach); a second sweep
    round at coarse resolutions restores ≤2%. Reference bar: exact
    equality on its meshes (`generate/grid.rs:692-724`)."""
    verts, faces = load(asset)
    topo = Topology.triangle_list(faces.reshape(-1))
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    pad = 0.05 * (hi - lo)
    grid = Grid.from_bounding_box(lo - pad, hi + pad, [res] * 3)

    cpt = np.asarray(
        m.generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST,
                            strategy=Strategy.CPT, flat=False)
    )
    want = np.asarray(
        m.generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST,
                            strategy=Strategy.XLA, flat=False)
    )
    assert np.all(np.abs(cpt) >= np.abs(want) - 1e-4)  # never undershoots
    diff = np.abs(np.abs(cpt) - np.abs(want))
    rel = diff / np.maximum(np.abs(want), 1e-4)
    # ≤2% relative in the far field; near-surface cells (|d| ≈ 0, exact by
    # the seed band) get an absolute epsilon so float noise does not read
    # as percent-scale error.
    ok = (rel <= 0.02) | (diff <= 1e-4)
    bad = ~ok
    assert ok.all(), (
        f"{asset}@{res}: rel {rel[bad].max():.3%} at |d|="
        f"{np.abs(want)[bad].min():.2e}"
    )
    # Exact sign agreement everywhere EXCEPT cells whose center lies on the
    # surface within float noise (|d| ≤ 1e-4 by either engine): there the
    # binned seed yields an exact ±0.0 while the dense engine's different
    # float association yields ±1e-5 — a signed-zero artifact, not a sign
    # error (the reference's own compare_distances treats these as equal,
    # `lib.rs:242-259`).
    on_surface = (np.abs(want) <= 1e-4) | (np.abs(cpt) <= 1e-4)
    sign_mismatch = (np.sign(cpt) != np.sign(want)) & ~on_surface
    assert sign_mismatch.sum() == 0, (
        f"{asset}@{res}: {sign_mismatch.sum()} off-surface sign mismatches, "
        f"worst |d|={np.abs(want)[sign_mismatch].max():.2e}"
    )
