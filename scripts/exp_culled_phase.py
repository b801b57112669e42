#!/usr/bin/env python
"""Phase breakdown of the CULLED engine on the FlightHelmet criterion
workloads (BENCH_r04: query grid 73k q/s = 0.64x 1-core — find the time).

Times, separately and warm: morton sort, select_blocks (phase A), the fused
distance+sign kernel, the in-jit fixup, the full query_sdf_culled path, and
the fused brute kernel on the same workload. Prints one JSON line per
workload/config.

Run exclusively: python scripts/exp_culled_phase.py [st_grid]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling
from mesh_to_sdf_tpu.ops.kernels import pallas_culled, pallas_sdf
from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.topology import Topology
from mesh_to_sdf_tpu.types import SignMethod

hv, hf = gltf.load_scene(
    "/root/reference/mesh_to_sdf/assets/FlightHelmet.glb"
).merge()
htopo = Topology.triangle_list(hf.reshape(-1))
ta, tb, tc, valid, n = qmod.prepare_triangles(hv, htopo, 1024)
bi = pallas_culled.build_block_index(
    np.asarray(ta[:n]), np.asarray(tb[:n]), np.asarray(tc[:n])
)
sg = qmod._sign_grid_cached(ta, tb, tc, valid, n)
print(json.dumps({"tris": int(n), "blocks": bi.n_blocks}), flush=True)


def _query_grid(verts, cell_radius):
    lo = verts.min(0)
    hi = verts.max(0)
    cs = cell_radius
    counts = np.maximum(np.ceil((hi - lo) / cs).astype(int), 1)
    from mesh_to_sdf_tpu import Grid

    g = Grid.from_bounding_box(lo, hi, [int(c) for c in counts])
    return np.asarray(g.all_cell_centers()).reshape(-1, 3)


rng = np.random.default_rng(1)
lo, hi = hv.min(0), hv.max(0)
c, half = (lo + hi) / 2, (hi - lo) * 0.65
WORKLOADS = {
    "query_grid": jnp.asarray(_query_grid(hv, 0.01)),
    "scattered_1M": jnp.asarray(
        (c + rng.uniform(-1, 1, (1_000_000, 3)) * half).astype(np.float32)
    ),
}


def timeit(f, n_rep=3):
    f()
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


for name, q in WORKLOADS.items():
    Q = q.shape[0]
    st = 64 if Q >= 262_144 else 16
    qt = pallas_culled.DEFAULT_QT
    nb_table = pallas_culled.DEFAULT_NB_TABLE
    n_qt_ = -(-Q // qt)
    nb_table = max(min(nb_table, (2**20 // 4) // max(n_qt_, 1) - 8), 16)
    nb_sub = pallas_culled.DEFAULT_NB_SUB
    res = {"workload": name, "Q": int(Q), "st": st, "nb_table": nb_table}

    # pieces, jitted separately for timing
    @jax.jit
    def morton(q):
        order = culling._morton_order(q)
        return q[order], order

    q_sorted, order = morton(q)
    jax.block_until_ready(q_sorted)
    res["t_morton"] = round(timeit(lambda: jax.block_until_ready(morton(q)[0])), 4)

    pad = (-Q) % qt
    q_pad = jnp.pad(q_sorted, ((0, pad), (0, 0)), mode="edge")

    def selb():
        tbl, lb, cen = pallas_culled.select_blocks(
            q_pad, bi, nb_sub=nb_sub, st=st, qt=qt, nb_table=nb_table
        )
        jax.block_until_ready(tbl)
        return tbl, lb, cen

    tbl, lb_excl, centers = selb()
    res["t_select_blocks"] = round(timeit(lambda: selb()), 4)
    occ = float(jnp.mean(jnp.sum(tbl != bi.n_blocks, axis=1)))
    res["tbl_mean_occupancy"] = round(occ, 1)
    res["tbl_slots"] = int(tbl.shape[1])
    res["work_frac"] = round(occ / bi.n_blocks, 3)

    # anchors
    grid = sg.grid
    counts_g = jnp.asarray(grid.cell_count, jnp.int32)
    fc = jnp.asarray(grid.first_cell)
    cs_ = jnp.asarray(grid.cell_size)
    bmin = fc - 0.5 * cs_
    cell = jnp.clip(
        jnp.floor((q_pad - bmin) / cs_).astype(jnp.int32), 0, counts_g - 1
    )
    anchors = grid.cell_center(cell)

    def kern():
        d, cnt = pallas_culled.culled_dist_pallas(
            q_pad, bi, tbl, anchors=anchors, qt=qt
        )
        jax.block_until_ready(d)

    res["t_kernel_fused"] = round(timeit(kern), 4)

    def kern_nosign():
        d = pallas_culled.culled_dist_pallas(q_pad, bi, tbl, qt=qt)
        jax.block_until_ready(d)

    res["t_kernel_dist_only"] = round(timeit(kern_nosign), 4)

    def signed_impl():
        s, f, wf = culling._culled_blocks_signed_impl(
            q, bi, sg.inside, sg.grid, qt=qt, st=st,
            nb_sub=nb_sub, nb_table=nb_table, interpret=False,
        )
        jax.block_until_ready(s)
        return s, f, wf

    s_, f_, wf_ = signed_impl()
    res["t_signed_impl"] = round(timeit(lambda: signed_impl()), 4)
    res["n_flag"] = int(jnp.sum(f_))
    res["work_frac_reported"] = round(float(wf_), 3)

    k_fix = min(max(4096, Q // 32), 65_536)

    def fixup():
        s, nf, wf = culling._culled_signed_fixup_impl(
            q, bi, sg.inside, sg.grid, ta[:n], tb[:n], tc[:n],
            qt=qt, st=st, nb_sub=nb_sub, nb_table=nb_table, k_fix=k_fix,
            raycast_axes=3, interpret=False,
        )
        jax.block_until_ready(s)

    res["t_fixup_total"] = round(timeit(fixup), 4)

    def full():
        d = culling.query_sdf_culled(
            q, ta, tb, tc, valid, sign_method=SignMethod.RAYCAST,
            n_valid_tris=n, sign_grid=sg, block_index=bi,
            st=st,  # non-default cfg: disables route cache interference
        )
        jax.block_until_ready(d)

    res["t_full_path"] = round(timeit(full), 4)

    # Gathered dense engine (per-sub-tile candidates), several (st, kg).
    for stg in (16, 32, 64):
        for kg in (16, 32):
            def gather():
                s, f, wf = culling._culled_gather_signed_impl(
                    q, bi, sg.inside, sg.grid, st=stg, kg=kg,
                    interpret=False,
                )
                jax.block_until_ready(s)
                return s, f, wf

            s_, f_, wf_ = gather()
            t = timeit(lambda: gather())
            res[f"gather_st{stg}_kg{kg}"] = {
                "t": round(t, 4),
                "qps": round(Q / t, 1),
                "n_flag": int(jnp.sum(f_)),
                "work_frac": round(float(wf_), 4),
            }

    def brute_f():
        d = pallas_sdf.sdf_raycast_pallas(
            q, ta[:n], tb[:n], tc[:n], raycast_axes=3
        )
        jax.block_until_ready(d)

    res["t_brute_fused"] = round(timeit(brute_f), 4)
    res["qps_full"] = round(Q / res["t_full_path"], 1)
    res["qps_brute"] = round(Q / res["t_brute_fused"], 1)
    print(json.dumps(res), flush=True)
