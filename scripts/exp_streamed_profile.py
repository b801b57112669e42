#!/usr/bin/env python
"""Phase profile of the streamed 512^3 pipeline (BENCH_r04: 155 s warm).

Times, separately: tunnel H2D/D2H bandwidth, host prep (subdivision,
slab seed bins, slab line bins), per-slab pass1/pass2/sign device time,
and per-slab D2H output fetch. Prints a JSON dict at the end.

Usage: python scripts/exp_streamed_profile.py [n=512] [slab_nx=64]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from mesh_to_sdf_tpu import Grid, SignMethod
from mesh_to_sdf_tpu.utils.meshgen import icosphere
from mesh_to_sdf_tpu.ops import cpt as cpt_mod
from mesh_to_sdf_tpu import gridgen_streamed as gs

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SLAB = int(sys.argv[2]) if len(sys.argv) > 2 else 64

out = {"n": N, "slab_nx": SLAB, "backend": jax.default_backend()}

# --- tunnel bandwidth probes -------------------------------------------------
x_host = np.ones((64, 512, 512), np.float32)  # 64 MB
t0 = time.perf_counter()
x_dev = jnp.asarray(x_host)
jax.block_until_ready(x_dev)
out["h2d_64MB_s"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter()
_ = np.asarray(x_dev)
out["d2h_64MB_s"] = round(time.perf_counter() - t0, 3)
# second round (steady state)
t0 = time.perf_counter()
x_dev2 = jnp.asarray(x_host + 1)
jax.block_until_ready(x_dev2)
out["h2d_64MB_s_2"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter()
_ = np.asarray(x_dev2)
out["d2h_64MB_s_2"] = round(time.perf_counter() - t0, 3)
del x_dev, x_dev2

# --- mesh + grid --------------------------------------------------------------
verts, faces = icosphere(subdiv=5)  # 20480 tris
grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [N, N, N])
nx, ny, nz = grid.cell_count
n_slabs = nx // SLAB
cell_count = (SLAB, ny, nz)

v_np = np.asarray(verts, np.float32)
f_np = np.asarray(faces, np.int64)
cs = float(np.max(np.abs(np.asarray(grid.cell_size))))

t0 = time.perf_counter()
ra, rb, rc = cpt_mod.subdivide_to_span(v_np, f_np, max_edge=8.0 * cs)
out["prep_subdivide_s"] = round(time.perf_counter() - t0, 3)
out["tris_subdivided"] = int(ra.shape[0])

oa_np = v_np[f_np[:, 0]]
ob_np = v_np[f_np[:, 1]]
oc_np = v_np[f_np[:, 2]]

t0 = time.perf_counter()
slab_line_bins = gs.build_slab_line_bins(grid, SLAB, n_slabs, oa_np, ob_np, oc_np)
out["prep_line_bins_s"] = round(time.perf_counter() - t0, 3)

t0 = time.perf_counter()
slab_bins = cpt_mod.build_slab_seed_bins(grid, n_slabs, ra, rb, rc)
out["prep_seed_bins_s"] = round(time.perf_counter() - t0, 3)
out["seed_entry_shapes"] = [list(np.shape(slab_bins.entry_tri[i])) for i in range(min(2, n_slabs))]

tris = jnp.asarray(np.stack([ra, rb, rc]))
orig = jnp.asarray(np.stack([oa_np, ob_np, oc_np]))
use_pallas = jax.default_backend() == "tpu"

def slab_seed(i):
    return (
        jnp.asarray(slab_bins.entry_tri[i]),
        jnp.asarray(slab_bins.rows_cell[i]),
        jnp.asarray(slab_bins.cell_row[i]),
    )

def slab_first(i):
    return grid.first_cell + jnp.asarray([i * SLAB, 0, 0], jnp.float32) * grid.cell_size

empty = gs._empty_edge(ny, nz)

# compile passes once (cold timings recorded separately)
t0 = time.perf_counter()
_st, _hi, _lo = gs._slab_pass(
    slab_first(0), grid.cell_size, cell_count, tris, empty, empty,
    *slab_seed(0), slab_bins.n_shift_rounds, use_pallas,
)
jax.block_until_ready(_st.d1)
out["compile_slab_pass_s"] = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter()
_sg, _ovf = gs._slab_sign_raycast(
    slab_first(0), grid.cell_size, cell_count, _st.d1, orig, use_pallas,
    line_bins=slab_line_bins[0] if slab_line_bins else None,
)
jax.block_until_ready(_sg)
out["compile_sign_s"] = round(time.perf_counter() - t0, 3)
del _st, _hi, _lo, _sg

# --- warm pass 1 ---------------------------------------------------------------
pass1 = []
edge_fetch = []
right_edges = []
carry = empty
for i in range(n_slabs):
    seeds = slab_seed(i)
    t0 = time.perf_counter()
    _, hi, _lo = gs._slab_pass(
        slab_first(i), grid.cell_size, cell_count, tris, carry, empty,
        *seeds, slab_bins.n_shift_rounds, use_pallas,
    )
    jax.block_until_ready(hi.d1)
    pass1.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    right_edges.append(jax.tree.map(np.asarray, hi))
    edge_fetch.append(round(time.perf_counter() - t0, 3))
    carry = hi
out["pass1_per_slab_s"] = pass1
out["pass1_edge_fetch_s"] = edge_fetch

# --- warm pass 2 + sign --------------------------------------------------------
pass2, sign_t, fetch_t = [], [], []
res = np.empty((nx, ny, nz), np.float32)
carry = empty
for i in reversed(range(n_slabs)):
    left = (
        cpt_mod.CptState(*[jnp.asarray(x) for x in right_edges[i - 1]])
        if i > 0 else empty
    )
    t0 = time.perf_counter()
    state, _hi2, lo = gs._slab_pass(
        slab_first(i), grid.cell_size, cell_count, tris, left, carry,
        *slab_seed(i), slab_bins.n_shift_rounds, use_pallas,
    )
    jax.block_until_ready(state.d1)
    pass2.append(round(time.perf_counter() - t0, 3))
    carry = lo
    t0 = time.perf_counter()
    signed, ovf = gs._slab_sign_raycast(
        slab_first(i), grid.cell_size, cell_count, state.d1, orig, use_pallas,
        line_bins=slab_line_bins[i] if slab_line_bins else None,
    )
    jax.block_until_ready(signed)
    sign_t.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    res[i * SLAB : (i + 1) * SLAB] = np.asarray(signed)
    fetch_t.append(round(time.perf_counter() - t0, 3))
out["pass2_per_slab_s"] = pass2
out["sign_per_slab_s"] = sign_t
out["out_fetch_per_slab_s"] = fetch_t

inside = float((res < 0).mean())
out["inside_frac"] = round(inside, 4)
out["sum_pass1"] = round(sum(pass1), 2)
out["sum_pass2"] = round(sum(pass2), 2)
out["sum_sign"] = round(sum(sign_t), 2)
out["sum_fetch"] = round(sum(fetch_t) + sum(edge_fetch), 2)
out["sum_prep"] = round(
    out["prep_subdivide_s"] + out["prep_line_bins_s"] + out["prep_seed_bins_s"], 2
)
print(json.dumps(out))
