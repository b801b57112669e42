"""Pallas CPT sweep-kernel + parity-overflow coverage (interpret mode).

Closes the round-1 gap: the flagship's TPU hot loop
(ops/kernels/pallas_sweep.py) and the K_DISTINCT overflow path of the parity
kernel (ops/kernels/pallas_parity.py) regress on CPU, not only on hardware.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from baselines import make_icosphere, make_box
from mesh_to_sdf_tpu import Grid, SignMethod, Topology
from mesh_to_sdf_tpu.ops import cpt as cpt_mod
from mesh_to_sdf_tpu.ops import raycast as raycast_mod
from mesh_to_sdf_tpu.ops.kernels import pallas_parity


def _soup(verts, faces):
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces)
    return (
        jnp.asarray(v[f[:, 0]]),
        jnp.asarray(v[f[:, 1]]),
        jnp.asarray(v[f[:, 2]]),
    )


@pytest.mark.parametrize("mesh_fn,grid_shape", [
    (lambda: make_icosphere(subdiv=2), (16, 16, 12)),   # non-cubic
    (lambda: make_box(size=(1.6, 1.0, 0.8)), (10, 14, 12)),
])
def test_sweep_kernel_matches_xla_sequential(mesh_fn, grid_shape):
    """Interpret-mode Pallas sweeps == the XLA sequential sweep fixed point.

    Non-cubic grids force the XLA path into the sequential (Gauss-Seidel)
    schedule — the exact schedule the Pallas orchestration implements — so
    the two must agree to float tolerance.
    """
    verts, faces = mesh_fn()
    ta, tb, tc = _soup(verts, faces)
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, list(grid_shape))

    d_xla, i_xla = cpt_mod.closest_point_grid(grid, ta, tb, tc)
    d_pl, i_pl = cpt_mod.closest_point_grid_pallas(
        grid, ta, tb, tc, interpret=True
    )
    # Tolerance: the kernel fuses the distance math differently from XLA —
    # float32 accumulation differences up to ~1e-4 relative are expected.
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_xla), rtol=2e-4, atol=1e-5
    )
    # Indices may differ where distances tie (symmetric/coplanar meshes tie
    # constantly); the contract is that BOTH indices achieve the reported
    # distance when re-evaluated exactly.
    from mesh_to_sdf_tpu.ops import geometry

    centers = grid.all_cell_centers().reshape(-1, 3)
    for idx in (i_pl, i_xla):
        safe = jnp.maximum(idx.reshape(-1), 0)
        d_re = geometry.point_triangle_distance(
            centers, ta[safe], tb[safe], tc[safe]
        )
        np.testing.assert_allclose(
            np.asarray(d_re), np.asarray(d_pl).reshape(-1), rtol=2e-4,
            atol=1e-5,
        )


def test_sweep_kernel_contract_vs_exact_cubic():
    """Cubic grid: kernel output obeys the CPT contract vs the exact dense
    reduction (never undershoots; ≤2% relative in the far field)."""
    verts, faces = make_icosphere(subdiv=2)
    ta, tb, tc = _soup(verts, faces)
    grid = Grid.from_bounding_box([-1.4] * 3, [1.4] * 3, [16, 16, 16])

    d_pl, _ = cpt_mod.closest_point_grid_pallas(grid, ta, tb, tc, interpret=True)
    from mesh_to_sdf_tpu.ops import brute

    centers = grid.all_cell_centers().reshape(-1, 3)
    valid = jnp.ones((ta.shape[0],), bool)
    ta_p, tb_p, tc_p, valid_p, blk = brute.pad_tri_blocks(ta, tb, tc, valid, 512)
    exact = np.asarray(
        brute.sdf_brute(
            centers, ta_p, tb_p, tc_p, valid_p,
            sign_method=SignMethod.RAYCAST, raycast_axes=0,
            tri_block=blk, query_chunk=centers.shape[0],
        )
    ).reshape(grid.cell_count)
    got = np.asarray(d_pl)
    assert np.all(got >= exact - 1e-4)
    rel = np.abs(got - exact) / np.maximum(exact, 1e-3)
    assert rel.max() < 0.02, rel.max()


# ---------------------------------------------------------------------------
# Parity overflow (K_DISTINCT) — ADVICE r1 medium #1
# ---------------------------------------------------------------------------
def _sheet_stack(n_sheets):
    """n_sheets parallel unit quads perpendicular to +X at distinct x.

    A +X ray through them crosses n_sheets distinct hit buckets inside ONE
    256-triangle sub-block — exceeding K_DISTINCT=8 when n_sheets > 8.
    """
    tris = []
    for i in range(n_sheets):
        x = 0.1 + 0.08 * i
        a, b, c, d = (
            [x, -1, -1], [x, 1, -1], [x, 1, 1], [x, -1, 1],
        )
        tris.append([a, b, c])
        tris.append([a, c, d])
    t = np.asarray(tris, np.float32)
    return jnp.asarray(t[:, 0]), jnp.asarray(t[:, 1]), jnp.asarray(t[:, 2])


def test_parity_overflow_detected_and_widened():
    ta, tb, tc = _sheet_stack(12)  # 12 > K_DISTINCT=8 distinct buckets
    grid = Grid.from_bounding_box([0.0, -0.5, -0.5], [1.2, 0.5, 0.5],
                                  [16, 4, 4])

    inside8, ovf8 = pallas_parity.grid_inside_mask_pallas(
        grid, ta, tb, tc, interpret=True
    )
    assert int(ovf8) > 0, "12 sheets must overflow K_DISTINCT=8"

    # Widening K restores exactness and clears the overflow.
    inside16, ovf16 = pallas_parity.grid_inside_mask_pallas(
        grid, ta, tb, tc, k_distinct=16, interpret=True
    )
    assert int(ovf16) == 0
    valid = jnp.ones((ta.shape[0],), bool)
    want = np.asarray(
        raycast_mod.grid_inside_mask(grid, ta, tb, tc, valid, tri_block=24)
    )
    np.testing.assert_array_equal(np.asarray(inside16), want)


def test_parity_no_overflow_on_simple_mesh():
    verts, faces = make_icosphere(subdiv=2)
    ta, tb, tc = _soup(verts, faces)
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [12, 12, 12])
    inside, ovf = pallas_parity.grid_inside_mask_pallas(
        grid, ta, tb, tc, interpret=True
    )
    assert int(ovf) == 0
    valid = jnp.ones((ta.shape[0],), bool)
    want = np.asarray(
        raycast_mod.grid_inside_mask(grid, ta, tb, tc, valid, tri_block=256)
    )
    np.testing.assert_array_equal(np.asarray(inside), want)


def test_parity_single_axis_mode():
    """axes=1 (+X only — the reference default backend, `default.rs:34-37`)."""
    verts, faces = make_icosphere(subdiv=2)
    ta, tb, tc = _soup(verts, faces)
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [12, 12, 12])
    inside, ovf = pallas_parity.grid_inside_mask_pallas(
        grid, ta, tb, tc, axes=1, interpret=True
    )
    assert int(ovf) == 0
    valid = jnp.ones((ta.shape[0],), bool)
    want = np.asarray(
        raycast_mod.grid_inside_mask(
            grid, ta, tb, tc, valid, tri_block=256, axes=1
        )
    )
    np.testing.assert_array_equal(np.asarray(inside), want)


def test_exact_resign_fallback():
    """gridgen._exact_resign: re-signs |d| with the exact XLA parity — the
    host-side fallback taken when the Pallas kernel reports overflow."""
    from mesh_to_sdf_tpu import Strategy, gridgen

    verts, faces = make_icosphere(subdiv=2)
    topo = Topology.triangle_list(np.asarray(faces).reshape(-1))
    grid = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [10, 10, 10])
    want = np.asarray(
        gridgen.generate_grid_sdf(
            verts, topo, grid, SignMethod.RAYCAST, strategy=Strategy.XLA
        )
    )
    # Feed the resign helper deliberately wrong signs; it must restore them.
    wrong = jnp.asarray(np.abs(want))
    fixed = np.asarray(
        gridgen._exact_resign(wrong, verts, topo, grid, 3, 512, flat=True)
    )
    np.testing.assert_allclose(fixed, want, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Binned line parity (r3): per-tile candidate triangle blocks
# ---------------------------------------------------------------------------
def test_binned_parity_matches_dense():
    """The candidate-table parity kernel == the dense (every tile × every
    block) kernel: excluded blocks provably cannot cross the tile's lines
    (transverse AABB disjointness), so the masks must be identical."""
    from mesh_to_sdf_tpu.utils.meshgen import torus

    cases = [
        (make_icosphere(subdiv=2),
         Grid.from_bounding_box([-1.6] * 3, [1.6] * 3, [16, 16, 12])),
        (torus(1.0, 0.35, n_major=24, n_minor=12),
         Grid.from_bounding_box([-1.6] * 3, [1.6] * 3, [12, 8, 16])),
        # Multi-tile transverse lattices (>32 lines per dim) exercise the
        # 32×32 tile layout/unlayout transforms and real block culling.
        (make_icosphere(subdiv=2),
         Grid.from_bounding_box([-1.6] * 3, [1.6] * 3, [40, 72, 33])),
        # Slab-style grid (the streamed pipeline's shape): covers only a
        # thin x-range of the mesh; +x rays still see the whole soup.
        (make_icosphere(subdiv=2),
         Grid.from_bounding_box([-1.4, -1.4, -1.4], [-0.9, 1.4, 1.4],
                                [4, 40, 40])),
    ]
    for (verts, faces), grid in cases:
        ta, tb, tc = _soup(verts, faces)
        inside_d, ovf_d = pallas_parity.grid_inside_mask_pallas(
            grid, ta, tb, tc, interpret=True
        )
        bins = tuple(
            pallas_parity.build_line_bins(
                grid, ax, np.asarray(ta), np.asarray(tb), np.asarray(tc)
            )
            for ax in range(3)
        )
        inside_b, ovf_b = pallas_parity.grid_inside_mask_pallas(
            grid, ta, tb, tc, interpret=True, line_bins=bins
        )
        assert (np.asarray(inside_b) == np.asarray(inside_d)).all()
        assert int(ovf_b) == 0 and int(ovf_d) == 0


def test_binned_parity_overflow_still_detected():
    """Depth complexity beyond the bucket budget inside one candidate block
    must still surface as overflow (the caller's exact-resign trigger).
    The binned path doubles K_DISTINCT (Morton sorting concentrates
    parallel sheets into one block), so stack past 2·K."""
    # Keep cell_size (0.075) below the 0.08 sheet spacing so every sheet
    # lands in a distinct bucket; rays hit sheets beyond the grid too.
    ta, tb, tc = _sheet_stack(2 * pallas_parity.K_DISTINCT + 4)
    grid = Grid.from_bounding_box([0.0, -0.5, -0.5], [1.2, 0.5, 0.5],
                                  [16, 4, 4])
    bins = tuple(
        pallas_parity.build_line_bins(
            grid, ax, np.asarray(ta), np.asarray(tb), np.asarray(tc)
        )
        for ax in range(3)
    )
    _, ovf = pallas_parity.grid_inside_mask_pallas(
        grid, ta, tb, tc, interpret=True, axes=1, line_bins=bins
    )
    assert int(ovf) > 0
