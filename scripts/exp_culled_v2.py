"""TPU experiment: CULLED v2 (sub-tile unions) phase times + cert pass rate.

Run EXCLUSIVELY (1-core host): PYTHONPATH=/root/repo:/root/.axon_site python
scripts/exp_culled_v2.py [st nb_sub block]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling
from mesh_to_sdf_tpu.ops.kernels import pallas_culled
from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.topology import Topology
from mesh_to_sdf_tpu.types import SignMethod

st = int(sys.argv[1]) if len(sys.argv) > 1 else pallas_culled.DEFAULT_ST
nb_sub = int(sys.argv[2]) if len(sys.argv) > 2 else pallas_culled.DEFAULT_NB_SUB
block = int(sys.argv[3]) if len(sys.argv) > 3 else pallas_culled.TB
nb_table = int(sys.argv[4]) if len(sys.argv) > 4 else pallas_culled.DEFAULT_NB_TABLE
st_grid = int(sys.argv[5]) if len(sys.argv) > 5 else 32

hv, hf = gltf.load_scene("/root/reference/mesh_to_sdf/assets/FlightHelmet.glb").merge()
htopo = Topology.triangle_list(hf.reshape(-1))
ta, tb, tc, valid, n = qmod.prepare_triangles(hv, htopo, 1024)
print(f"tris={n} st={st} nb_sub={nb_sub} block={block}", flush=True)

bi = pallas_culled.build_block_index(
    np.asarray(ta[:n]), np.asarray(tb[:n]), np.asarray(tc[:n]), block=block
)
print("blocks:", bi.n_blocks, flush=True)

rng = np.random.default_rng(1)
lo, hi = hv.min(0), hv.max(0)
c, half = (lo + hi) / 2, (hi - lo) * 0.65
q_scat = jnp.asarray(
    (c + rng.uniform(-1, 1, (1_000_000, 3)) * half).astype(np.float32)
)


def _query_grid(verts, cell_radius):
    lo = verts.min(0) - 0.1
    hi = verts.max(0) + 0.1
    n3 = np.maximum(((hi - lo) / (2 * cell_radius)).astype(int), 1)
    axes = [lo[k] + (np.arange(n3[k]) + 0.5) * 2 * cell_radius for k in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    return g.astype(np.float32)


q_grid = jnp.asarray(_query_grid(hv, 0.01))
print("grid queries:", q_grid.shape[0], flush=True)

for name, q in (("scattered_1M", q_scat), ("query_grid", q_grid)):
    st_w = st if name == "scattered_1M" else st_grid

    def once():
        return culling._culled_blocks_impl(
            q, bi, qt=1024, st=st_w, nb_sub=nb_sub, nb_table=nb_table,
            interpret=False,
        )

    dist, ovf = once()  # warm
    jax.block_until_ready((dist, ovf))
    t0 = time.perf_counter()
    dist, ovf = once()
    jax.block_until_ready((dist, ovf))
    t_kernel = time.perf_counter() - t0
    n_ovf = int(jnp.sum(ovf))
    print(
        f"{name}: kernel+certs {t_kernel:.3f}s  overflow {n_ovf} "
        f"({100.0 * n_ovf / q.shape[0]:.2f}%)",
        flush=True,
    )

    # Full path (fused kernel + subset fallback) — end to end.
    sg = qmod._sign_grid_cached(ta, tb, tc, valid, n)

    def full():
        d = culling.query_sdf_culled(
            q, ta, tb, tc, valid, sign_method=SignMethod.RAYCAST,
            n_valid_tris=n, sign_grid=sg, block_index=bi,
        )
        jax.block_until_ready(d)
        return d

    full()
    t0 = time.perf_counter()
    full()
    t_full = time.perf_counter() - t0
    print(
        f"{name}: FULL {t_full:.3f}s  -> {q.shape[0] / t_full:,.0f} q/s",
        flush=True,
    )
