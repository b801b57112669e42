"""256^3 grid phase breakdown on TPU: seeds / sweeps / parity."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

INTERP = os.environ.get("M2S_FORCE_CPU") == "1"  # smoke-test the script off-TPU
if INTERP:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
from mesh_to_sdf_tpu.ops import cpt as cpt_mod
from mesh_to_sdf_tpu.utils.meshgen import icosphere

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256

verts, faces = icosphere(subdiv=5)
topo = Topology.triangle_list(faces.reshape(-1))
grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [N, N, N])

v = np.asarray(verts, np.float32)
f = np.asarray(faces, np.int64)
ta = jnp.asarray(v[f[:, 0]])
tb = jnp.asarray(v[f[:, 1]])
tc = jnp.asarray(v[f[:, 2]])


def timeit(fn, rep=3):
    fn()
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# Host binning (cached in the real pipeline) — do once, outside timings.
t0 = time.perf_counter()
bins = cpt_mod.build_seed_bins(grid, np.asarray(ta), np.asarray(tb),
                               np.asarray(tc))
print(f"host binning (cold): {time.perf_counter() - t0:.3f}s", flush=True)


def run_seed():
    s = cpt_mod.seed_from_bins(grid, ta, tb, tc, bins)
    jax.block_until_ready(s)
    float(jnp.sum(s[0]))
    return s


seed = run_seed()
t_seed = timeit(run_seed)
from mesh_to_sdf_tpu.utils import roofline

m = roofline.cpt_seed_flops(bins)
print(f"seed (device): {t_seed:.3f}s pairs={m['pairs']:.3g} "
      f"{roofline.account(t_seed, m['flops'], m['hbm_bytes'])}", flush=True)

def run_sweeps():
    d, i = cpt_mod.closest_point_grid_pallas(
        grid, ta, tb, tc, seed=seed, interpret=INTERP
    )
    float(jnp.sum(d))
    return d

t = timeit(run_sweeps)
ms = roofline.cpt_sweep_flops(N**3)
print(f"seed-eval+sweeps: {t:.3f}s "
      f"(sweeps-only ~{t - t_seed:.3f}s) "
      f"{roofline.account(max(t - t_seed, 1e-9), ms['flops'], ms['hbm_bytes'])}",
      flush=True)


# Parity phase: dense vs binned kernels.
from mesh_to_sdf_tpu.ops.kernels import pallas_parity

bins3 = tuple(
    pallas_parity.build_line_bins(grid, ax, np.asarray(ta), np.asarray(tb),
                                  np.asarray(tc))
    for ax in range(3)
)
nb_per_tile = [int(np.asarray(b.tbl.shape[1])) for b in bins3]
used = [float(np.mean(np.asarray(b.tbl) != b.n_blocks)) for b in bins3]
print(f"line bins: max_nb={nb_per_tile} used_frac={[round(u,3) for u in used]}",
      flush=True)

for name, lb in (("dense", None), ("binned", bins3)):
    def run_parity(lb=lb):
        inside, ovf = pallas_parity.grid_inside_mask_pallas(
            grid, ta, tb, tc, line_bins=lb, interpret=INTERP
        )
        float(jnp.sum(inside))
        return inside

    t = timeit(run_parity)
    acct = ""
    if lb is not None:
        mp = roofline.parity_binned_flops(lb)
        acct = f" {roofline.account(t, mp['flops'], mp['hbm_bytes'])}"
    print(f"parity 3-axis {name}: {t:.3f}s{acct}", flush=True)


def run_full():
    out = generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST)
    float(jnp.sum(out))
    return out


t_full = timeit(run_full)
print(f"FULL generate_grid_sdf {N}^3 raycast: {t_full:.3f}s = "
      f"{N**3 / t_full:,.0f} cells/s", flush=True)
