"""Renderer tests: sampler semantics, raymarch hit geometry, isosurface tools."""
import numpy as np
import jax.numpy as jnp
import pytest

from baselines import make_icosphere
from mesh_to_sdf_tpu import Grid, SignMethod, Topology, generate_grid_sdf
from mesh_to_sdf_tpu.render import (
    Camera,
    RaymarchMode,
    estimate_normal,
    iso_limits,
    ordered_indices,
    point_cloud,
    render,
    sample,
    surface_cells,
    to_uint8,
    trace,
    voxel_band,
)


@pytest.fixture(scope="module")
def sphere_grid():
    v, f = make_icosphere(subdiv=3)
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [24, 24, 24])
    d = generate_grid_sdf(
        v, Topology.triangle_list(f.reshape(-1)), g, SignMethod.RAYCAST, flat=False
    )
    return g, np.asarray(d)


def test_samplers_agree_at_cell_centers(sphere_grid):
    """All samplers must return the stored value exactly at cell centers
    (trilinear/tetrahedral weights collapse to 1 on the dual grid)."""
    g, d = sphere_grid
    cells = np.array([[3, 4, 5], [10, 10, 10], [0, 0, 0], [23, 23, 23]])
    pts = np.asarray(g.cell_center(cells))
    want = d[cells[:, 0], cells[:, 1], cells[:, 2]]
    for mode in RaymarchMode:
        got = np.asarray(sample(jnp.asarray(d), g, jnp.asarray(pts), mode))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode.value)


def test_trilinear_is_linear_between_centers(sphere_grid):
    g, d = sphere_grid
    a = np.asarray(g.cell_center([5, 5, 5]))
    b = np.asarray(g.cell_center([6, 5, 5]))
    mid = (a + b) * 0.5
    va = d[5, 5, 5]
    vb = d[6, 5, 5]
    got = float(sample(jnp.asarray(d), g, jnp.asarray(mid), RaymarchMode.TRILINEAR))
    np.testing.assert_allclose(got, (va + vb) / 2, atol=1e-5)
    got_t = float(
        sample(jnp.asarray(d), g, jnp.asarray(mid), RaymarchMode.TETRAHEDRAL)
    )
    np.testing.assert_allclose(got_t, (va + vb) / 2, atol=1e-5)


def test_out_of_bounds_sentinel(sphere_grid):
    g, d = sphere_grid
    far = jnp.asarray([[99.0, 0.0, 0.0]])
    for mode in RaymarchMode:
        got = float(sample(jnp.asarray(d), g, far, mode)[0])
        assert got == pytest.approx(100.0), mode


def test_trace_hits_sphere(sphere_grid):
    g, d = sphere_grid
    origins = jnp.asarray([[0.0, 0.0, 3.0], [3.0, 3.0, 3.0]])
    dirs = -origins / jnp.linalg.norm(origins, axis=-1, keepdims=True)
    pos, dist, hit = trace(jnp.asarray(d), g, origins, dirs)
    assert bool(hit[0]) and bool(hit[1])
    # Hit point should be near the unit sphere surface.
    r = np.linalg.norm(np.asarray(pos), axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=0.15)


def test_trace_miss(sphere_grid):
    g, d = sphere_grid
    origins = jnp.asarray([[0.0, 0.0, 3.0]])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])  # away from the grid
    _, _, hit = trace(jnp.asarray(d), g, origins, dirs)
    assert not bool(hit[0])


def test_normals_point_outward(sphere_grid):
    g, d = sphere_grid
    p = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    n = np.asarray(estimate_normal(jnp.asarray(d), g, p))
    # For a sphere SDF the gradient at the surface is the radial direction.
    np.testing.assert_allclose(n[0], [1, 0, 0], atol=0.2)
    np.testing.assert_allclose(n[1], [0, 1, 0], atol=0.2)


def test_render_image(sphere_grid):
    g, d = sphere_grid
    cam = Camera.orbit(g, width=64, height=64)
    img = np.asarray(render(jnp.asarray(d), g, cam))
    assert img.shape == (64, 64, 3)
    hit_frac = (img.sum(-1) > 0).mean()
    assert 0.03 < hit_frac < 0.9  # sphere visible, background present
    # Center pixel hits the sphere; corner does not.
    assert img[32, 32].sum() > 0
    assert img[0, 0].sum() == 0
    u8 = to_uint8(img)
    assert u8.dtype == np.uint8 and u8.max() <= 255


def test_render_snap_stylized_differs_from_snap(sphere_grid):
    """SNAP_STYLIZED is a distinct SHADING mode, not a sampler alias
    (`draw_raymarching.wgsl:302-306`): fixed light at (-5,5,5), green
    intensity (0.4,1.0,0.4), classic Phong, no shadows/attenuation. The
    image must differ from SNAP and carry the green dominance."""
    g, d = sphere_grid
    cam = Camera.orbit(g, width=64, height=64)
    snap = np.asarray(
        render(jnp.asarray(d), g, cam, mode=RaymarchMode.SNAP)
    )
    styl = np.asarray(
        render(jnp.asarray(d), g, cam, mode=RaymarchMode.SNAP_STYLIZED)
    )
    assert styl.shape == snap.shape
    # Most stylized surface pixels are black — the snap grid's stepped
    # gradient degenerates normals to 0 (the very artifact the wgsl comment
    # describes); only cells where the central difference survives light up.
    hit = styl.sum(-1) > 0
    assert hit.mean() > 0.003
    # Same silhouette (same sampler + trace), different shading.
    assert np.abs(styl - snap).max() > 0.05
    # Green channel dominates on lit surface pixels (intensity 0.4,1.0,0.4).
    lit = styl[hit]
    assert (lit[:, 1] >= lit[:, 0] - 1e-6).all()
    assert (lit[:, 1] >= lit[:, 2] - 1e-6).all()
    assert lit[:, 1].mean() > lit[:, 0].mean() + 0.01


def test_ordered_indices_and_band(sphere_grid):
    g, d = sphere_grid
    order, sd = ordered_indices(jnp.asarray(d))
    sd = np.asarray(sd)
    assert (np.diff(sd) >= 0).all()
    lo, hi = iso_limits(jnp.asarray(d))
    assert float(lo) < 0 < float(hi)
    b0, b1 = voxel_band(jnp.asarray(sd), 0.0, float(2.6 / 24))
    assert 0 < int(b1 - b0) < d.size
    cells = surface_cells(g, d)
    # Every surface cell's |distance| is within one cell width.
    vals = d[cells[:, 0], cells[:, 1], cells[:, 2]]
    assert np.abs(vals).max() <= 2.6 / 24 + 1e-6
    pc = point_cloud(g, d)
    r = np.linalg.norm(pc, axis=1)
    assert np.abs(r - 1.0).max() < 0.2


# ------------------------------------------------------------------ model pass
def test_trace_mesh_sphere_hit():
    """Rays toward an icosphere hit at ~unit distance from a 3-unit eye."""
    from mesh_to_sdf_tpu.render import trace_mesh

    v, f = make_icosphere(subdiv=2)
    vj = jnp.asarray(v)
    ta, tb, tc = vj[f[:, 0]], vj[f[:, 1]], vj[f[:, 2]]
    o = jnp.asarray([[3.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    t, tri, u, vbar, hit = trace_mesh(o, d, ta, tb, tc)
    assert bool(hit[0]) and not bool(hit[1])
    assert abs(float(t[0]) - 2.0) < 0.05  # sphere radius ~1 (icosphere)
    assert int(tri[0]) >= 0


def test_render_model_matches_sdf_silhouette(sphere_grid):
    """Model render: non-empty, centered silhouette ≈ the SDF render's."""
    from mesh_to_sdf_tpu.render import render_model

    g, d = sphere_grid
    v, f = make_icosphere(subdiv=2)
    cam = Camera.orbit(g, width=48, height=48)
    img_m = np.asarray(render_model(v, f, cam, shadows=False))
    img_s = np.asarray(
        render(jnp.asarray(d), g, cam, shadows=False)
    )
    assert img_m.shape == (48, 48, 3)
    hit_m = img_m.sum(-1) > 0.01
    hit_s = img_s.sum(-1) > 0.01
    assert hit_m.any()
    # Silhouettes overlap substantially (same sphere).
    inter = (hit_m & hit_s).sum()
    union = (hit_m | hit_s).sum()
    assert inter / union > 0.75, inter / union


def test_render_model_vertex_colors():
    from mesh_to_sdf_tpu.render import render_model

    v, f = make_icosphere(subdiv=2)
    colors = np.where((v[:, 0] > 0)[:, None],
                      np.array([1.0, 0.0, 0.0], np.float32),
                      np.array([0.0, 0.0, 1.0], np.float32))
    g = Grid.from_bounding_box([-1.3] * 3, [1.3] * 3, [8] * 3)
    cam = Camera.orbit(g, azimuth_deg=90.0, elevation_deg=0.0,
                       width=32, height=32)
    # Eye x-dominant → sees the +x (red) or -x (blue) hemisphere.
    img = np.asarray(render_model(v, f, cam, vertex_colors=colors,
                                  shadows=False))
    hit = img.sum(-1) > 0.01
    mean = img[hit].mean(axis=0)
    if float(np.asarray(cam.eye)[0]) > 0:
        assert mean[0] > mean[2], mean
    else:
        assert mean[2] > mean[0], mean


def test_render_model_and_sdf_composite(sphere_grid):
    """ModelAndSdf: model surface (exact mesh) wins where nearer; output
    differs from pure SDF render but silhouette stays."""
    from mesh_to_sdf_tpu.render import render_model_and_sdf

    g, d = sphere_grid
    v, f = make_icosphere(subdiv=2)
    cam = Camera.orbit(g, width=40, height=40)
    img = np.asarray(
        render_model_and_sdf(v, f, jnp.asarray(d), g, cam, shadows=False)
    )
    assert img.shape == (40, 40, 3)
    hit = img.sum(-1) > 0.01
    assert hit.any()
    # Center pixel hits the (nearer) mesh surface: shaded, not background.
    assert img[20, 20].sum() > 0.05


# ------------------------------------------------------------------ voxel pass
def test_voxel_band_occupancy_matches_surface_cells(sphere_grid):
    """The DDA's cube set == the ordered-index iso-band slice
    (`voxel_render_pass.rs:280-310`)."""
    from mesh_to_sdf_tpu.render import band_occupancy

    g, d = sphere_grid
    occ = np.asarray(band_occupancy(jnp.asarray(d), g))
    cells = surface_cells(g, d)
    ref = np.zeros(g.cell_count, bool)
    ref[cells[:, 0], cells[:, 1], cells[:, 2]] = True
    np.testing.assert_array_equal(occ, ref)


def test_voxel_dda_hits_are_exact_cube_faces(sphere_grid):
    """Every DDA hit lies on a face of its reported cell's cube and the
    face normal is axis-aligned, unit, opposing the ray."""
    from mesh_to_sdf_tpu.render import band_occupancy, dda_trace

    g, d = sphere_grid
    occ = band_occupancy(jnp.asarray(d), g)
    cam = Camera.orbit(g, width=32, height=32)
    o, dirs = cam.rays()
    hit, t_hit, cell, normal = dda_trace(occ, g, o, dirs)
    hit = np.asarray(hit)
    assert hit.any()
    pos = np.asarray(o + t_hit[..., None] * dirs)[hit]
    cc = np.asarray(g.cell_center(cell))[hit]
    nrm = np.asarray(normal)[hit]
    half = np.abs(np.asarray(g.cell_size)) * 0.5
    # Inside the cube (within face tolerance) on every axis…
    off = np.abs(pos - cc) - half[None]
    assert off.max() < 1e-3
    # …and ON the face the normal names.
    face_axis = np.argmax(np.abs(nrm), axis=1)
    on_face = np.abs(
        np.take_along_axis(off, face_axis[:, None], axis=1)
    )
    assert on_face.max() < 1e-3
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0)
    # Entering face: the normal opposes the ray direction.
    dirs_h = np.asarray(dirs)[hit]
    assert (np.sum(nrm * dirs_h, axis=1) < 0).all()


def test_render_voxels_image(sphere_grid):
    """Voxel render: sphere silhouette visible, matches the raymarch
    silhouette closely (same band geometry), corners empty."""
    from mesh_to_sdf_tpu.render import render_voxels

    g, d = sphere_grid
    cam = Camera.orbit(g, width=48, height=48)
    img = np.asarray(render_voxels(jnp.asarray(d), g, cam))
    assert img.shape == (48, 48, 3)
    vox_hit = img.sum(-1) > 0
    assert img[0, 0].sum() == 0
    assert img[24, 24].sum() > 0
    ray = np.asarray(render(jnp.asarray(d), g, cam))
    ray_hit = ray.sum(-1) > 0
    inter = (vox_hit & ray_hit).sum()
    union = (vox_hit | ray_hit).sum()
    assert inter / union > 0.7, inter / union


def test_render_voxels_shadows_darken(sphere_grid):
    from mesh_to_sdf_tpu.render import render_voxels

    g, d = sphere_grid
    cam = Camera.orbit(g, width=32, height=32)
    # Light from far below: upward faces occluded by the sphere itself.
    lp = (0.0, -50.0, 0.0)
    img_s = np.asarray(
        render_voxels(jnp.asarray(d), g, cam, light_pos=lp, shadows=True)
    )
    img_n = np.asarray(
        render_voxels(jnp.asarray(d), g, cam, light_pos=lp, shadows=False)
    )
    hit = img_n.sum(-1) > 0
    assert img_s[hit].mean() < img_n[hit].mean()
