#!/usr/bin/env python
"""Quick CULLED measurement: the two FlightHelmet criterion workloads
through the PUBLIC path (whatever engine is default), one gather config
each, vs the fused brute kernel. Unbuffered one-line-JSON output.

Run exclusively: python scripts/exp_culled_quick.py [workloads...]
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
    counts = np.maximum(np.ceil((hi - lo) / cell_radius).astype(int), 1)
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
want = sys.argv[1:] or list(WORKLOADS)


def timeit(f, n_rep=3):
    f()
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


for name in want:
    q = WORKLOADS[name]
    Q = q.shape[0]
    res = {"workload": name, "Q": int(Q)}

    def full():
        d = culling.query_sdf_culled(
            q, ta, tb, tc, valid, sign_method=SignMethod.RAYCAST,
            n_valid_tris=n, sign_grid=sg, block_index=bi,
            nb_sub=pallas_culled.DEFAULT_NB_SUB,  # non-default: no route cache
        )
        jax.block_until_ready(d)
        return d

    t0 = time.perf_counter()
    d_full = full()
    res["t_compile_full"] = round(time.perf_counter() - t0, 1)
    res["t_full"] = round(timeit(full), 4)
    res["qps_full"] = round(Q / res["t_full"], 1)
    print(json.dumps(res), flush=True)

    # Flag telemetry from the underlying gather engine at the default cfg.
    st = 32 if Q < 262_144 else 64
    s_, f_, wf_ = culling._culled_gather_signed_impl(
        q, bi, sg.inside, sg.grid, st=st, kg=culling.DEFAULT_KG,
        interpret=False,
    )
    res["n_flag_round1"] = int(jnp.sum(f_))
    res["work_frac"] = round(float(wf_), 4)

    def brute_f():
        d = pallas_sdf.sdf_raycast_pallas(
            q, ta[:n], tb[:n], tc[:n], raycast_axes=3
        )
        jax.block_until_ready(d)

    res["t_brute"] = round(timeit(brute_f), 4)
    res["qps_brute"] = round(Q / res["t_brute"], 1)
    # Cross-check: full path vs brute values.
    db = pallas_sdf.sdf_raycast_pallas(
        q, ta[:n], tb[:n], tc[:n], raycast_axes=3
    )
    res["max_abs_diff"] = float(jnp.max(jnp.abs(jnp.abs(d_full) - jnp.abs(db))))
    res["sign_mismatch_frac"] = float(
        jnp.mean((d_full < 0) != (db < 0))
    )
    print(json.dumps(res), flush=True)
