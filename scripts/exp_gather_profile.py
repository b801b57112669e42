#!/usr/bin/env python
"""Phase profile of the gathered CULLED engine on scattered_1M.

Times round-1 gather, the widen round, phase A, morton, and the dense
fixup separately. Unbuffered JSON lines.

Run exclusively: python -u scripts/exp_gather_profile.py [query_grid|scattered_1M]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception as e:  # noqa: BLE001
    print(f"compilation cache unavailable: {e}", flush=True)
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling
from mesh_to_sdf_tpu.ops.kernels import pallas_culled
from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.topology import Topology

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
    "query_grid": lambda: jnp.asarray(_query_grid(hv, 0.01)),
    "scattered_1M": lambda: jnp.asarray(
        (c + rng.uniform(-1, 1, (1_000_000, 3)) * half).astype(np.float32)
    ),
}
want = sys.argv[1:] or ["scattered_1M"]


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
    q = WORKLOADS[name]()
    Q = q.shape[0]
    st = 32 if Q < 262_144 else 64
    res = {"workload": name, "Q": int(Q), "st": st}

    # Morton sort alone.
    @jax.jit
    def morton(q):
        return q[culling._morton_order(q)]

    res["t_morton"] = round(
        timeit(lambda: jax.block_until_ready(morton(q))), 4
    )

    # Phase A alone at round-1 geometry.
    chunk = 64
    pad = (-Q) % (st * chunk)
    q_pad = jnp.pad(morton(q), ((0, pad), (0, 0)), mode="edge")
    n_sub = q_pad.shape[0] // st

    @jax.jit
    def phase_a(q_pad):
        subs = q_pad.reshape(n_sub, st, 3)
        smin = jnp.min(subs, axis=1)
        smax = jnp.max(subs, axis=1)
        centers = (smin + smax) * 0.5
        r_s = jnp.linalg.norm((smax - smin) * 0.5, axis=-1)
        return pallas_culled._phase_a_topk(centers, r_s, bi, kg=32)

    res["t_phase_a"] = round(
        timeit(lambda: jax.block_until_ready(phase_a(q_pad)[0])), 4
    )

    # Round-1 gather (includes morton + phase A + body).
    def round1():
        s, f, wf = culling._culled_gather_signed_impl(
            q, bi, sg.inside, sg.grid, st=st, kg=32, interpret=False,
        )
        jax.block_until_ready(s)
        return s, f, wf

    s_, f_, wf_ = round1()
    res["t_round1"] = round(timeit(round1), 4)
    res["n_flag1"] = int(jnp.sum(f_))
    res["work_frac"] = round(float(wf_), 4)

    # Widen round alone at the real flagged subset size.
    k_wide = min(max(16_384, Q // 3), 393_216)
    idxw = jnp.nonzero(f_, size=k_wide, fill_value=Q)[0]
    subw = q[jnp.minimum(idxw, Q - 1)]

    def widen():
        s2, f2, _ = culling._culled_gather_signed_impl(
            subw, bi, sg.inside, sg.grid, st=16, kg=culling.DEFAULT_KG_WIDE,
            interpret=False,
        )
        jax.block_until_ready(s2)
        return f2

    f2_ = widen()
    res["k_wide"] = int(k_wide)
    res["t_widen"] = round(timeit(widen), 4)
    res["n_flag2"] = int(jnp.sum(f2_[: int(jnp.sum(f_))]))

    # Full fused path (round1 + widen + dense fixup in one program).
    k_fix = min(max(4096, Q // 32), 65_536)

    def fixup():
        s, nf, wf = culling._culled_signed_fixup_impl(
            q, bi, sg.inside, sg.grid, ta[:n], tb[:n], tc[:n],
            qt=1024, st=st, nb_sub=48, nb_table=256, k_fix=k_fix,
            raycast_axes=3, interpret=False, engine="gather", kg=32,
        )
        jax.block_until_ready(s)

    res["t_fixup_total"] = round(timeit(fixup), 4)
    res["qps_fixup"] = round(Q / res["t_fixup_total"], 1)
    print(json.dumps(res), flush=True)
