"""Demo — the analog of the reference's `examples/demo.rs` (demo.rs:5-64):
load a GLB, one `generate_sdf` over a small query grid, one `generate_grid_sdf`,
plus the new capabilities: a rendered PNG and a vertex-gradient step.

Run: python examples/demo.py [scene.glb]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import mesh_to_sdf_tpu as m2s
from mesh_to_sdf_tpu.io import gltf
from mesh_to_sdf_tpu.utils.meshgen import icosphere


def main():
    if len(sys.argv) > 1:
        vertices, faces = gltf.load_mesh(sys.argv[1])
        print(f"loaded {sys.argv[1]}: {len(vertices)} verts, {len(faces)} tris")
    else:
        vertices, faces = icosphere(subdiv=3)
        print(f"procedural icosphere: {len(vertices)} verts, {len(faces)} tris")

    topo = m2s.Topology.triangle_list(faces.reshape(-1))

    # generate_sdf over scattered query points (demo.rs:24-37).
    rng = np.random.default_rng(0)
    queries = rng.uniform(vertices.min(), vertices.max(), (1000, 3)).astype(
        np.float32
    )
    sdf = np.asarray(m2s.generate_sdf(vertices, topo, queries))
    print(
        f"generate_sdf: {len(queries)} points, "
        f"{int((sdf < 0).sum())} inside, range [{sdf.min():.3f}, {sdf.max():.3f}]"
    )

    # generate_grid_sdf (demo.rs:39-63).
    lo, hi = vertices.min(axis=0) - 0.2, vertices.max(axis=0) + 0.2
    grid = m2s.Grid.from_bounding_box(lo, hi, [32, 32, 32])
    dist = np.asarray(
        m2s.generate_grid_sdf(vertices, topo, grid, m2s.SignMethod.RAYCAST,
                              flat=False)
    )
    print(
        f"generate_grid_sdf: 32^3 cells, inside fraction "
        f"{(dist < 0).mean():.3f}"
    )

    # Offline render (replaces the wgpu client). When a GLB with materials
    # was given, project its base colors onto the SDF via the 6-face
    # cubemap (the client's material mapping, `cubemap.rs:160-311`).
    from mesh_to_sdf_tpu.render import (
        Camera, RaymarchMode, generate_cubemap, render, save_png,
    )

    material = None
    if len(sys.argv) > 1:
        scene = gltf.load_scene(sys.argv[1], with_materials=True)
        sv, sf = scene.merge()
        material = generate_cubemap(sv, sf, scene.merge_colors())
        print("cubemap material projected (6 × "
              f"{material.resolution}² faces)")
    cam = Camera.orbit(grid, width=400, height=400)
    img = render(dist, grid, cam, mode=RaymarchMode.TRILINEAR,
                 material=material)
    out = pathlib.Path("demo_render.png")
    save_png(out, np.asarray(img))
    print(f"wrote {out}")

    # New capability: d(SDF)/d(vertices) — one fit step toward a scaled target.
    import jax.numpy as jnp

    from mesh_to_sdf_tpu.models.sdf_layer import DifferentiableSDF, sdf_grid, pad_tri_idx

    small = m2s.Grid.from_bounding_box(lo, hi, [12, 12, 12])
    tri_idx = pad_tri_idx(faces.astype(np.int32), 128)
    target = sdf_grid(
        jnp.asarray(vertices * 1.05), jnp.asarray(tri_idx), small,
        m2s.SignMethod.NORMAL, block=128,
    )
    model = DifferentiableSDF(faces.astype(np.int32), small,
                              m2s.SignMethod.NORMAL, block=128)
    state = model.init(vertices)
    state, loss0 = model.train_step(state, target)
    state, loss1 = model.train_step(state, target)
    print(f"DifferentiableSDF: loss {float(loss0):.6f} -> {float(loss1):.6f}")


if __name__ == "__main__":
    main()
