"""TPU adjudication of the sweep-schedule flags (VERDICT r3 weak #6):
slot2_center x squared at 256^3, sweeps-only, plus result agreement."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from mesh_to_sdf_tpu import Grid
from mesh_to_sdf_tpu.ops import cpt as cpt_mod
from mesh_to_sdf_tpu.utils.meshgen import icosphere

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

verts, faces = icosphere(subdiv=5)
grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [N, N, N])
v = np.asarray(verts, np.float32)
f = np.asarray(faces, np.int64)
ta, tb, tc = (jnp.asarray(v[f[:, i]]) for i in range(3))

bins = cpt_mod.build_seed_bins(grid, np.asarray(ta), np.asarray(tb),
                               np.asarray(tc))
seed = cpt_mod.seed_from_bins(grid, ta, tb, tc, bins)
jax.block_until_ready(seed)


def timeit(fn, rep=3):
    fn()
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


ref = None
for s2c in (False, True):
    for sq in (False, True):
        def run(s2c=s2c, sq=sq):
            d, i = cpt_mod.closest_point_grid_pallas(
                grid, ta, tb, tc, seed=seed, slot2_center=s2c, squared=sq
            )
            jax.block_until_ready(d)
            return d

        d = run()
        t = timeit(run)
        if ref is None:
            ref = d
            delta = 0.0
        else:
            delta = float(jnp.max(jnp.abs(d - ref)))
        print(f"slot2_center={s2c} squared={sq}: {t:.3f}s "
              f"max|d - base|={delta:.3e}", flush=True)
