#!/usr/bin/env python
"""End-to-end timing of the reworked streamed 512^3 pipeline (prep-cached,
device edges, overlapped fetch). Prints cold and two warm timings."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from mesh_to_sdf_tpu import Grid, SignMethod
from mesh_to_sdf_tpu.gridgen_streamed import generate_grid_sdf_streamed
from mesh_to_sdf_tpu.utils.meshgen import icosphere

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
verts, faces = icosphere(subdiv=5)
grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [N] * 3)
out = {"n": N, "backend": jax.default_backend()}

buf = np.empty(N * N * N, np.float32)
t0 = time.perf_counter()
r = generate_grid_sdf_streamed(verts, faces, grid, SignMethod.RAYCAST, out=buf)
out["cold_s"] = round(time.perf_counter() - t0, 2)
inside = float((r < 0).mean())
out["inside_frac"] = round(inside, 4)
for k in ("warm1_s", "warm2_s"):
    t0 = time.perf_counter()
    generate_grid_sdf_streamed(verts, faces, grid, SignMethod.RAYCAST, out=buf)
    out[k] = round(time.perf_counter() - t0, 2)
out["cells_per_s_warm"] = round(N**3 / min(out["warm1_s"], out["warm2_s"]), 1)
print(json.dumps(out))
