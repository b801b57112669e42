"""Roofline accounting sanity (utils/roofline.py, VERDICT r3 weak #4)."""
import numpy as np

from mesh_to_sdf_tpu.utils import roofline


def test_account_compute_bound():
    # 1 TFLOP in 0.5 s on a 6.1 TFLOP/s roof -> ~33% peak, compute-bound.
    out = roofline.account(0.5, flops=1e12, hbm_bytes=1e9)
    assert out["bound"] == "compute"
    assert abs(out["achieved_gflops"] - 2000.0) < 1.0
    assert 30.0 < out["pct_vpu_fp32_peak"] < 35.0


def test_account_bandwidth_bound():
    out = roofline.account(1.0, flops=1e10, hbm_bytes=5e11)
    assert out["bound"] == "bandwidth"
    assert 55.0 < out["pct_hbm_peak"] < 65.0


def test_account_latency_bound():
    # Tiny work over a long wall time: neither resource explains it.
    out = roofline.account(1.0, flops=1e9, hbm_bytes=1e6)
    assert out["bound"] == "latency"


def test_query_pairs_model_padding():
    m = roofline.pairs_query_flops(1000, 500, raycast_axes=3,
                                   chunk=1024, block=1024)
    # Padded to one chunk x one block.
    assert m["pairs"] == 1024 * 1024
    assert m["flops"] > m["pairs"] * 80


def test_sweep_model_scales_with_rounds():
    one = roofline.cpt_sweep_flops(10**6)
    two = roofline.cpt_sweep_flops(10**6, rounds=2)
    assert one["evals_per_cell"] == 20 * 6
    assert two["flops"] == 2 * one["flops"]
    assert two["hbm_bytes"] == 2 * one["hbm_bytes"]


def test_grid_total_counts_from_real_structures():
    # Build tiny real structures and make sure the counting paths run.
    import jax.numpy as jnp

    from mesh_to_sdf_tpu import Grid
    from mesh_to_sdf_tpu.ops import cpt as cpt_mod
    from mesh_to_sdf_tpu.ops.kernels import pallas_parity
    from tests.baselines import make_icosphere

    verts, faces = make_icosphere(subdiv=1)
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    grid = Grid.from_bounding_box([-1.2] * 3, [1.2] * 3, [8, 8, 8])
    bins = cpt_mod.build_seed_bins(grid, ta, tb, tc)
    lbs = tuple(
        pallas_parity.build_line_bins(grid, ax, ta, tb, tc)
        for ax in range(3)
    )
    m = roofline.grid_total_flops(8**3, bins, lbs)
    assert m["flops"] > 0 and m["hbm_bytes"] > 0
    acct = roofline.account(0.01, **m)
    assert set(acct) >= {"achieved_gflops", "pct_vpu_fp32_peak", "bound"}
