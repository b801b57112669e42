"""CPU analysis: why do CULLED tile unions go dense on query grids, and
does re-clustering sub-tiles (by nearest candidate block) fix it?

For the FlightHelmet query-grid criterion workload (`generate_sdf.rs:
216-236`), computes per-sub-tile exact candidate requirements (n_within)
and the per-1024-query-tile union sizes under
  (a) Morton query order (current engine),
  (b) sub-tiles re-sorted by their nearest block id (proposed v4),
and reports the kernel work fraction (union pairs / brute pairs) each way.
Pure host analysis — no TPU needed, structure only.

Usage: JAX_PLATFORMS=cpu python scripts/exp_union_density.py [st] [qt]
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from mesh_to_sdf_tpu import query as qmod
from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.ops import culling
from mesh_to_sdf_tpu.ops.kernels import pallas_culled
from mesh_to_sdf_tpu.topology import Topology

st = int(sys.argv[1]) if len(sys.argv) > 1 else 16
qt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

hv, hf = gltf.load_scene(
    "/root/reference/mesh_to_sdf/assets/FlightHelmet.glb").merge()
htopo = Topology.triangle_list(hf.reshape(-1))
ta, tb, tc, valid, n = qmod.prepare_triangles(hv, htopo, 1024)
bi = pallas_culled.build_block_index(
    np.asarray(ta[:n]), np.asarray(tb[:n]), np.asarray(tc[:n]))
B = bi.n_blocks

# The reference bench's query grid (bench.py::_query_grid, cell_radius 0.01).
lo, hi = hv.min(0), hv.max(0)
counts = np.maximum(np.ceil((hi - lo) / 0.01).astype(int), 1)
xs = [lo[i] + (np.arange(counts[i]) + 0.5) * 0.01 for i in range(3)]
q = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 3)
q = q.astype(np.float32)
Q = len(q)
print(f"tris={n} blocks={B} queries={Q} st={st} qt={qt}")

order = np.asarray(culling._morton_order(jnp.asarray(q)))
qs = q[order]
pad = (-Q) % qt
qp = np.concatenate([qs, np.repeat(qs[-1:], pad, axis=0)])

n_sub = len(qp) // st
subs = qp.reshape(n_sub, st, 3)
smin, smax = subs.min(1), subs.max(1)
centers = (smin + smax) / 2
r_s = np.linalg.norm((smax - smin) / 2, axis=-1)

# Per-(sub-tile, block) csphere lower bound — the engine's phase A.
p9 = np.asarray(bi.planes9)
cen = (p9[0:3] + p9[3:6] + p9[6:9]) / 3.0  # (3, Tp)
rad = np.sqrt(np.maximum.reduce([
    ((p9[0:3] - cen) ** 2).sum(0),
    ((p9[3:6] - cen) ** 2).sum(0),
    ((p9[6:9] - cen) ** 2).sum(0),
]))
Tp = p9.shape[1]
lb = np.empty((n_sub, B), np.float32)
chunk = 512
for i in range(0, n_sub, chunk):
    c = centers[i:i + chunk]
    d = np.sqrt(((c[:, :, None] - cen[None]) ** 2).sum(1)) - rad[None]
    lb[i:i + chunk] = np.maximum(d, 0).reshape(len(c), B, Tp // B).min(2)

dmin = lb.min(1)
n_within = (lb <= (dmin + 2 * r_s)[:, None]).sum(1)
print(f"n_within per sub-tile: median={np.median(n_within):.0f} "
      f"p90={np.percentile(n_within, 90):.0f} max={n_within.max()}")

k_sel = min(pallas_culled.DEFAULT_NB_SUB, B)
sel = np.argsort(lb, axis=1)[:, :k_sel]
keep = np.arange(k_sel)[None] < np.maximum(n_within, 1)[:, None]
sel = np.where(keep, sel, B)

spt = qt // st


def union_stats(sel_rows, label):
    ids = sel_rows.reshape(-1, spt * k_sel)
    sizes = np.array([len(np.unique(r[r < B])) for r in ids])
    nb_cap = pallas_culled.DEFAULT_NB_TABLE
    work = np.minimum(sizes, nb_cap).sum() / (len(sizes) * B)
    print(f"{label}: union size median={np.median(sizes):.0f} "
          f"p90={np.percentile(sizes, 90):.0f} max={sizes.max()} "
          f"work_frac={work:.3f}")
    return work


w_a = union_stats(sel, "(a) morton order   ")

# (b) re-cluster sub-tiles by nearest block id (block Morton ids are
# spatial, so sub-tiles sharing surface patches become tile-mates).
nearest = np.argmin(lb, axis=1)
sub_order = np.argsort(nearest, kind="stable")
w_b = union_stats(sel[sub_order], "(b) nearest-block  ")

# (c) cluster by FULL candidate-set signature similarity: sort by
# (nearest, second-nearest) lexicographic.
second = np.where(sel[:, 1] < B, sel[:, 1], nearest)
sub_order2 = np.lexsort((second, nearest))
w_c = union_stats(sel[sub_order2], "(c) lex(near,2nd)  ")

print(f"work_frac improvement (a)->(b): {w_a / max(w_b, 1e-9):.2f}x, "
      f"(a)->(c): {w_a / max(w_c, 1e-9):.2f}x")

# Where's the floor? pairs if every sub-tile paid ONLY its own candidates:
own = np.minimum(n_within, k_sel).astype(np.float64)
floor = (own * st).sum() / (len(qp) * B)
print(f"per-sub-tile floor work_frac (no union): {floor:.4f}")
