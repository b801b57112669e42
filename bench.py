#!/usr/bin/env python
"""Headline benchmark: grid cells/s/chip at 256^3, raycast sign.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors the reference's big criterion config, scaled to the
BASELINE.json north star): a ~20k-triangle watertight mesh, 256^3 grid,
`generate_grid_sdf` with SignMethod::Raycast
(reference: mesh_to_sdf/benches/generate_grid_sdf.rs:94-122 at 100^3; the
north star asks for 256^3).

`vs_baseline`: the reference publishes no absolute numbers (BASELINE.md), so
the baseline constant below is an estimate of the Rust crate's multithreaded
grid throughput on a high-end desktop CPU: 100^3 cells on a ~30k-tri mesh in
~0.5 s => ~2e6 cells/s (consistent with the crate's own "10-20x faster than
v0.3" claim and its preheap+BFS design whose cost scales with cells, not
cells*tris). vs_baseline = measured_cells_per_s / BASELINE_CELLS_PER_S.
"""
import json
import sys
import time

import numpy as np

BASELINE_CELLS_PER_S = 2.0e6  # estimated reference CPU throughput (see above)
N = 256
TARGET_TRIS = 20_000


def main():
    import jax

    sys.path.insert(0, "tests")
    from baselines import make_icosphere

    from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf

    # icosphere subdiv 5 = 20480 triangles
    verts, faces = make_icosphere(subdiv=5)
    assert faces.shape[0] >= TARGET_TRIS, faces.shape
    topo = Topology.triangle_list(faces.reshape(-1))

    grid = Grid.from_bounding_box([-1.1] * 3, [1.1] * 3, [N, N, N])

    def run():
        out = generate_grid_sdf(verts, topo, grid, SignMethod.RAYCAST)
        jax.block_until_ready(out)
        return out

    run()  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    cells_per_s = N**3 / best

    print(
        json.dumps(
            {
                "metric": f"grid_cells_per_s_{N}^3_raycast",
                "value": round(cells_per_s, 1),
                "unit": "cells/s",
                "vs_baseline": round(cells_per_s / BASELINE_CELLS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
