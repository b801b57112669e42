"""Confirm the production CULLED path (auto params + in-jit fixup) on TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu import generate_sdf
from mesh_to_sdf_tpu.topology import Topology
from mesh_to_sdf_tpu.types import SignMethod, Strategy

hv, hf = gltf.load_scene(
    "/root/reference/mesh_to_sdf/assets/FlightHelmet.glb").merge()
htopo = Topology.triangle_list(hf.reshape(-1))

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
    return np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(
        -1, 3).astype(np.float32)


for name, q, strat in (
    ("scattered_1M culled", q_scat, Strategy.CULLED),
    ("query_grid culled", _query_grid(hv, 0.01), Strategy.CULLED),
    ("query_grid pallas-brute", _query_grid(hv, 0.01), Strategy.PALLAS),
):
    def f():
        d = generate_sdf(hv, htopo, q, strat, sign_method=SignMethod.RAYCAST)
        jax.block_until_ready(d)
        return d

    f()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t:.3f}s -> {len(q)/t:,.0f} q/s", flush=True)
