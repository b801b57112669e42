#!/usr/bin/env python
"""Headline benchmark: grid cells/s/chip, raycast sign (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's big criterion config scaled to the north
star: a 20 480-triangle watertight mesh, 256^3 grid (--quick: 128^3),
`generate_grid_sdf` with SignMethod::Raycast
(reference: mesh_to_sdf/benches/generate_grid_sdf.rs:94-122 at 100^3).

`vs_baseline`: the reference publishes no absolute numbers (BASELINE.md);
the constant below estimates the Rust crate's multithreaded propagation
pipeline on a high-end desktop CPU (~16 threads): its per-cell work is a
handful of 26-neighbor pops plus one raycast per boundary cell — ~2e6
cells/s at this scale. vs_baseline = measured / BASELINE_CELLS_PER_S.
"""
import json
import sys
import time

import numpy as np

BASELINE_CELLS_PER_S = 2.0e6


def main():
    import jax

    from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
    from mesh_to_sdf_tpu.utils.meshgen import icosphere

    quick = "--quick" in sys.argv
    n = 128 if quick else 256

    verts, faces = icosphere(subdiv=5)  # 20480 triangles
    topo = Topology.triangle_list(faces.reshape(-1))
    grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [n, n, n])

    def run():
        out = generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST)
        # Force execution + host sync: on some backends (axon tunnel)
        # block_until_ready alone does not guarantee the work ran.
        float(jax.numpy.sum(out))
        return out

    out = run()  # compile + warmup
    # Sanity: watertight unit sphere in a 2.2-box → inside fraction ≈ 0.393.
    inside = float((np.asarray(out) < 0).mean())
    assert 0.37 < inside < 0.42, f"bad sign fraction {inside}"

    times = []
    for _ in range(2 if quick else 3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    cells_per_s = n**3 / best

    print(
        json.dumps(
            {
                "metric": f"grid_cells_per_s_{n}^3_raycast",
                "value": round(cells_per_s, 1),
                "unit": "cells/s",
                "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
