"""Probe: per-sub-tile exact candidate-set sizes (n_within) on FlightHelmet.

n_within(s) = #{blocks b : D[s,b] <= dmin_s + 2 r_s} — the a-priori EXACT
candidate requirement; a sub-tile whose selection capacity >= n_within is
proven exact with NO per-query certificate.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling, geometry
from mesh_to_sdf_tpu.ops.kernels import pallas_culled
from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.topology import Topology

st = int(sys.argv[1]) if len(sys.argv) > 1 else 128

hv, hf = gltf.load_scene(
    "/root/reference/mesh_to_sdf/assets/FlightHelmet.glb").merge()
htopo = Topology.triangle_list(hf.reshape(-1))
ta, tb, tc, valid, n = qmod.prepare_triangles(hv, htopo, 1024)
bi = pallas_culled.build_block_index(
    np.asarray(ta[:n]), np.asarray(tb[:n]), np.asarray(tc[:n]))
B = bi.n_blocks
print(f"tris={n} blocks={B} st={st}")

rng = np.random.default_rng(1)
lo, hi = hv.min(0), hv.max(0)
c, half = (lo + hi) / 2, (hi - lo) * 0.65
q_scat = (c + rng.uniform(-1, 1, (1_000_000, 3)) * half).astype(np.float32)


def _query_grid(verts, cell_radius):
    lo = verts.min(0) - 0.1
    hi = verts.max(0) + 0.1
    n3 = np.maximum(((hi - lo) / (2 * cell_radius)).astype(int), 1)
    axes = [lo[k] + (np.arange(n3[k]) + 0.5) * 2 * cell_radius
            for k in range(3)]
    return np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3).astype(np.float32)


@jax.jit
def stats(q):
    Q = q.shape[0]
    order = culling._morton_order(q)
    qs = q[order]
    pad = (-Q) % st
    qp = jnp.pad(qs, ((0, pad), (0, 0)), mode="edge")
    subs = qp.reshape(-1, st, 3)
    smin = jnp.min(subs, axis=1)
    smax = jnp.max(subs, axis=1)
    centers = (smin + smax) * 0.5
    r = jnp.linalg.norm((smax - smin) * 0.5, axis=-1)
    n_sub = centers.shape[0]
    chunk = 256
    padr = (-n_sub) % chunk
    cp = jnp.pad(centers, ((0, padr), (0, 0)), mode="edge")
    Tp = bi.ta.shape[0]

    def body(cc):
        d = geometry.point_triangle_distance(
            cc[:, None, :], bi.ta[None], bi.tbv[None], bi.tc[None])
        return jnp.min(d.reshape(chunk, B, Tp // B), axis=2)

    D = jax.lax.map(body, cp.reshape(-1, chunk, 3)).reshape(-1, B)[:n_sub]
    dmin = jnp.min(D, axis=1)
    n_within = jnp.sum(D <= (dmin + 2 * r)[:, None], axis=1)
    return n_within, r, dmin


for name, q in (("scattered_1M", q_scat), ("query_grid", _query_grid(hv, 0.01))):
    nw, r, dmin = stats(jnp.asarray(q))
    nw = np.asarray(nw)
    print(name, "sub-tiles:", len(nw))
    print("  n_within pct:", {p: int(np.percentile(nw, p))
                              for p in (50, 75, 90, 95, 99, 100)})
    print("  mean:", float(nw.mean()),
          " frac<=8:", float((nw <= 8).mean()),
          " frac<=32:", float((nw <= 32).mean()),
          " frac<=48:", float((nw <= 48).mean()),
          " frac<=96:", float((nw <= 96).mean()))
