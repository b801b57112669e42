import time
import numpy as np
import jax
from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
from mesh_to_sdf_tpu.utils.meshgen import icosphere

print("devices:", jax.devices())
verts, faces = icosphere(subdiv=5)
topo = Topology.triangle_list(faces.reshape(-1))

# 256^3 regression check (n_strips=1 path).
g = Grid.from_bounding_box([-1.1]*3, [1.1]*3, [256]*3)
def run():
    out = generate_grid_sdf(verts, topo, g, SignMethod.RAYCAST)
    float(jax.numpy.sum(out))
    return out
out = run()
inside = float((np.asarray(out) < 0).mean())
assert 0.37 < inside < 0.42, inside
ts = []
for _ in range(3):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter()-t0)
print(f"256^3: median {sorted(ts)[1]:.4f}s  cells/s {256**3/sorted(ts)[1]:.3e}  inside {inside:.3f}")

# streamed 512^3 (the r4 OOM workload) — strip-mined sweep.
from mesh_to_sdf_tpu.gridgen_streamed import generate_grid_sdf_streamed
g512 = Grid.from_bounding_box([-1.1]*3, [1.1]*3, [512]*3)
def f():
    return generate_grid_sdf_streamed(verts, faces, g512, SignMethod.RAYCAST)
out = f()
inside = float((np.asarray(out) < 0).mean())
print("512^3 inside:", inside)
assert 0.37 < inside < 0.42, inside
t0 = time.perf_counter(); f(); t = time.perf_counter()-t0
print(f"512^3 streamed: {t:.2f}s  cells/s {512**3/t:.3e}")
