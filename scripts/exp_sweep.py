"""Sweep CULLED fused-path params on the FlightHelmet workloads (TPU)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling
from mesh_to_sdf_tpu.ops.kernels import pallas_culled
from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.topology import Topology
from mesh_to_sdf_tpu.types import SignMethod

hv, hf = gltf.load_scene(
    "/root/reference/mesh_to_sdf/assets/FlightHelmet.glb").merge()
htopo = Topology.triangle_list(hf.reshape(-1))
ta, tb, tc, valid, n = qmod.prepare_triangles(hv, htopo, 1024)
bi = pallas_culled.build_block_index(
    np.asarray(ta[:n]), np.asarray(tb[:n]), np.asarray(tc[:n]))
sg = qmod._sign_grid_cached(ta, tb, tc, valid, n)
print(f"tris={n} blocks={bi.n_blocks}", flush=True)

rng = np.random.default_rng(1)
lo, hi = hv.min(0), hv.max(0)
c, half = (lo + hi) / 2, (hi - lo) * 0.65
q_scat = jnp.asarray(
    (c + rng.uniform(-1, 1, (1_000_000, 3)) * half).astype(np.float32))


def _query_grid(verts, cell_radius):
    lo = verts.min(0) - 0.1
    hi = verts.max(0) + 0.1
    n3 = np.maximum(((hi - lo) / (2 * cell_radius)).astype(int), 1)
    axes = [lo[k] + (np.arange(n3[k]) + 0.5) * 2 * cell_radius
            for k in range(3)]
    return jnp.asarray(np.stack(
        np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3).astype(np.float32))


q_grid = _query_grid(hv, 0.01)

# SMEM caps the prefetch table at 1 MiB: nb_table*n_tiles*4 <= 2^20.
CONFIGS = {
    "scattered_1M": (q_scat, [(128, 64, 256), (64, 48, 256)]),
    "query_grid": (q_grid, [(16, 64, 256), (16, 96, 256), (32, 96, 256)]),
}

for name, (q, cfgs) in CONFIGS.items():
    for (st, nb_sub, nb_table) in cfgs:
        def full():
            d = culling.query_sdf_culled(
                q, ta, tb, tc, valid, sign_method=SignMethod.RAYCAST,
                n_valid_tris=n, sign_grid=sg, block_index=bi,
                st=st, nb_sub=nb_sub, nb_table=nb_table,
            )
            jax.block_until_ready(d)
            return d

        # flag count (one cheap probe via the impl)
        _, flag, _wf = culling._culled_blocks_signed_impl(
            q, bi, sg.inside, sg.grid, qt=1024, st=st, nb_sub=nb_sub,
            nb_table=nb_table, interpret=False)
        nf = int(jnp.sum(flag))
        full()
        t0 = time.perf_counter()
        full()
        t = time.perf_counter() - t0
        print(f"{name} st={st} nb={nb_sub} tbl={nb_table}: "
              f"flags={nf} ({100*nf/q.shape[0]:.1f}%)  FULL {t:.3f}s "
              f"-> {q.shape[0]/t:,.0f} q/s", flush=True)
