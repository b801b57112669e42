"""CLI end-to-end tests (generate → info → render), in-process."""
import json

import numpy as np
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import cli
from mesh_to_sdf_tpu.io import gltf, serde


@pytest.fixture(scope="module")
def glb(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "ico.glb"
    v, f = make_icosphere(subdiv=2)
    gltf.save_glb(p, v, f)
    return p


def test_generate_info_render(glb, tmp_path, capsys):
    sdf_path = tmp_path / "out.sdf"
    rc = cli.main(
        ["generate", str(glb), "--cells", "12", "-o", str(sdf_path),
         "--sign", "raycast"]
    )
    assert rc == 0 and sdf_path.exists()
    back = serde.read_from_file(sdf_path)
    assert isinstance(back, serde.GridSdf)
    assert back.grid.cell_count == (12, 12, 12)
    assert (back.distances < 0).any() and (back.distances > 0).any()

    rc = cli.main(["info", str(sdf_path)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["kind"] == "grid"
    assert info["iso_limits"][0] < 0 < info["iso_limits"][1]

    png = tmp_path / "out.png"
    rc = cli.main(
        ["render", str(sdf_path), "-o", str(png), "--width", "48",
         "--height", "48", "--no-shadows"]
    )
    assert rc == 0 and png.exists()
    from PIL import Image

    img = np.asarray(Image.open(png))
    assert img.shape == (48, 48, 3)
    assert img.sum() > 0


def test_info_mesh(glb, capsys):
    rc = cli.main(["info", str(glb)])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["kind"] == "mesh" and info["triangles"] == 320


def test_generate_normal_sign(glb, tmp_path):
    sdf_path = tmp_path / "n.sdf"
    rc = cli.main(
        ["generate", str(glb), "--cells", "10", "-o", str(sdf_path),
         "--sign", "normal"]
    )
    assert rc == 0
    back = serde.read_from_file(sdf_path)
    assert (back.distances < 0).any()


def test_missing_file_errors():
    with pytest.raises(SystemExit):
        cli.main(["generate", "/nonexistent.glb", "-o", "/tmp/x.sdf"])


def test_splat_render():
    from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
    from mesh_to_sdf_tpu.render import Camera, render_sdf_points

    v, f = make_icosphere(subdiv=2)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [16] * 3)
    d = np.asarray(
        generate_grid_sdf(
            v, Topology.triangle_list(f.reshape(-1)), g, SignMethod.RAYCAST
        )
    )
    cam = Camera.orbit(g, width=64, height=64)
    img = render_sdf_points(g, d, cam, point_size=2)
    assert img.shape == (64, 64, 3)
    assert img.sum() > 0


def test_generate_exact_and_reference_format(glb, tmp_path):
    """--exact produces grid == brute-at-centers; --format reference writes
    a container the rmp-serde reader round-trips."""
    import numpy as np

    from mesh_to_sdf_tpu.io import serde

    out = tmp_path / "exact.bin"
    rc = cli.main(
        ["generate", str(glb), "-o", str(out), "--cells", "12",
         "--exact", "--format", "reference"]
    )
    assert rc == 0
    back = serde.read_from_file(out)
    assert isinstance(back, serde.GridSdf)
    assert back.grid.cell_count == (12, 12, 12)

    # Exactness vs the dense engine on the same grid.
    import mesh_to_sdf_tpu as m
    from mesh_to_sdf_tpu.io import gltf as gltf_mod

    verts, faces = gltf_mod.load_mesh(glb)
    want = np.asarray(
        m.generate_grid_sdf(
            verts, m.Topology.triangle_list(faces.reshape(-1)),
            back.grid, m.SignMethod.RAYCAST, strategy=m.Strategy.XLA,
        )
    )
    np.testing.assert_allclose(back.distances, want, rtol=1e-5, atol=1e-6)


def test_generate_distributed_args_accepted(glb, tmp_path):
    """--distributed / --devices flags parse and run (single-process no-op;
    --devices 2 exercises the sharded CPT pipeline on the CPU mesh)."""
    out = tmp_path / "dist.bin"
    rc = cli.main(
        ["generate", str(glb), "-o", str(out), "--cells", "8",
         "--distributed", "--devices", "2"]
    )
    assert rc == 0
    from mesh_to_sdf_tpu.io import serde

    back = serde.read_from_file(out)
    assert back.distances.shape == (512,)


def test_render_with_material_flag(tmp_path):
    """--material: glb → cubemap-textured render (ferris3d has a texture)."""
    asset = "/root/reference/mesh_to_sdf/assets/ferris3d.glb"
    import os

    if not os.path.exists(asset):
        pytest.skip("reference assets not mounted")
    out = tmp_path / "mat.png"
    rc = cli.main(
        ["render", asset, "-o", str(out), "--cells", "24",
         "--material", "--width", "64", "--height", "64", "--no-shadows"]
    )
    assert rc == 0
    img = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(out))
    assert img.shape[:2] == (64, 64)
    assert img.max() > 10  # non-black
