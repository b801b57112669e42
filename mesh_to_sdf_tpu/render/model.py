"""Source-mesh rendering: ray-cast the triangle soup per pixel.

The offline analog of the client's Model / ModelAndSdf render modes
(`mesh_to_sdf_client/src/passes/model_render_pass.rs:22-84`, mode enum
`sdf_program.rs:38-45`): the original glTF geometry drawn with Blinn-Phong
shading and shadows, alone or composited with the raymarched SDF. Where the
client rasterizes with a depth buffer and samples a shadow map
(`shadow_pass.rs:19-61`, `draw_model.wgsl`), this renderer ray-casts the
soup per pixel (nearest-hit) and traces a second occlusion ray toward the
light — the same visual contract, XLA-friendly (fixed-shape scan over
triangle blocks, no data-dependent control flow).

Compositing (ModelAndSdf): both surfaces are traced independently and the
nearer hit wins per pixel — the offline equivalent of sharing one depth
buffer across the model and SDF passes (`sdf_program.rs:471-591`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid
from .raymarch import Camera, MAX_STEPS, _grid_epsilon, estimate_normal, trace
from .sampler import RaymarchMode

# numpy, not jnp: a module-level jnp scalar forces backend init at import.
_INF = np.float32(3.0e38)
#: Pixels per scan chunk (bounds the (chunk, block) pair temporaries).
PIXEL_CHUNK = 4096
TRI_BLOCK = 512


def _moller_trumbore(o, d, a, b, c):
    """General ray-triangle intersection. o/d: (..., 1, 3); a/b/c: (1, B, 3).

    Returns (t, u, v, hit). The aligned test (`geo.rs:156-216`) is a special
    case; the general form is needed for arbitrary camera rays.
    """
    e1 = b - a
    e2 = c - a
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    tvec = o - a
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return t, u, v, hit


@functools.partial(jax.jit, static_argnames=("tri_block", "chunk", "any_hit"))
def trace_mesh(origins, directions, ta, tb, tc, *,
               tri_block: int = TRI_BLOCK, chunk: int = PIXEL_CHUNK,
               any_hit: bool = False):
    """Nearest triangle hit per ray. origins/directions: (..., 3);
    ta/tb/tc: (T, 3). Returns (t (...,), tri (...,) int32, u, v, hit).

    ``any_hit=True`` returns after occlusion only (shadow rays): ``t`` is
    any hit's parameter and ``tri``/u/v are not meaningful.
    """
    shape = origins.shape[:-1]
    o_flat = origins.reshape(-1, 3)
    d_flat = directions.reshape(-1, 3)
    Q = o_flat.shape[0]
    T = ta.shape[0]
    pad_t = (-T) % tri_block
    padv = lambda x: jnp.pad(x, ((0, pad_t), (0, 0)), constant_values=1e18)
    blocks = jax.tree.map(
        lambda x: padv(x).reshape(-1, tri_block, 3), (ta, tb, tc)
    )
    n_blocks = blocks[0].shape[0]

    chunk = min(chunk, max(Q, 1))
    pad_q = (-Q) % chunk
    o_c = jnp.pad(o_flat, ((0, pad_q), (0, 0))).reshape(-1, chunk, 3)
    d_c = jnp.pad(d_flat, ((0, pad_q), (0, 0))).reshape(-1, chunk, 3)

    def chunk_body(args):
        o, d = args

        def scan_body(carry, inp):
            bidx, (a, b, c) = inp
            tmin, imin, umin, vmin = carry
            t, u, v, hit = _moller_trumbore(
                o[:, None, :], d[:, None, :], a[None], b[None], c[None]
            )
            tt = jnp.where(hit, t, _INF)
            arg = jnp.argmin(tt, axis=1).astype(jnp.int32)
            take = lambda x: jnp.take_along_axis(x, arg[:, None], 1)[:, 0]
            tbest = take(tt)
            better = tbest < tmin
            tmin = jnp.where(better, tbest, tmin)
            imin = jnp.where(better, bidx * tri_block + arg, imin)
            umin = jnp.where(better, take(u), umin)
            vmin = jnp.where(better, take(v), vmin)
            return (tmin, imin, umin, vmin), None

        init = (
            jnp.full((chunk,), _INF, jnp.float32),
            jnp.full((chunk,), -1, jnp.int32),
            jnp.zeros((chunk,), jnp.float32),
            jnp.zeros((chunk,), jnp.float32),
        )
        (tmin, imin, umin, vmin), _ = jax.lax.scan(
            scan_body, init,
            (jnp.arange(n_blocks, dtype=jnp.int32), blocks),
        )
        return tmin, imin, umin, vmin

    tmin, imin, umin, vmin = jax.lax.map(chunk_body, (o_c, d_c))
    tmin = tmin.reshape(-1)[:Q].reshape(shape)
    imin = imin.reshape(-1)[:Q].reshape(shape)
    umin = umin.reshape(-1)[:Q].reshape(shape)
    vmin = vmin.reshape(-1)[:Q].reshape(shape)
    hit = tmin < _INF
    return tmin, imin, umin, vmin, hit


def _shade(pos, normal, color, camera: Camera, light, occluded):
    """Blinn-Phong + exponential attenuation — identical formula to the SDF
    renderer so Model and Sdf modes match visually (wgsl `:312-357`)."""
    light_dir = light - pos
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
    diffuse = jnp.maximum(0.0, jnp.sum(normal * light_dir, axis=-1))
    view_dir = jnp.asarray(camera.eye, jnp.float32) - pos
    view_dir = view_dir / jnp.linalg.norm(view_dir, axis=-1, keepdims=True)
    half = light_dir + view_dir
    half = half / jnp.linalg.norm(half, axis=-1, keepdims=True)
    specular = jnp.maximum(0.0, jnp.sum(normal * half, axis=-1))
    lit = jnp.where(occluded, 0.0, 1.0)
    brightness = 0.2 + (diffuse + specular) * lit
    atten = jnp.stack(
        [
            jnp.exp(-1.8 * (1.0 - brightness)),
            jnp.exp(-1.9 * (1.0 - brightness)),
            jnp.exp(-1.9 * (1.0 - brightness)),
        ],
        axis=-1,
    )
    return jnp.clip(color * atten, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("camera", "shadows"))
def _render_model_impl(ta, tb, tc, colors, camera: Camera, light, *,
                       shadows: bool):
    origins, directions = camera.rays()
    t, tri, u, v, hit = trace_mesh(origins, directions, ta, tb, tc)
    pos = origins + t[..., None] * directions

    # Face normal, flipped toward the viewer (the client renders two-sided
    # unless backface culling is enabled, `model_render_pass.rs:60-66`).
    safe = jnp.maximum(tri, 0)
    a = ta[safe]
    b = tb[safe]
    c = tc[safe]
    n = jnp.cross(b - a, c - a)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.where(
        jnp.sum(n * directions, axis=-1, keepdims=True) > 0.0, -n, n
    )

    if colors is None:
        color = jnp.broadcast_to(jnp.asarray([0.6, 0.6, 0.6], jnp.float32),
                                 pos.shape)
    else:
        ca, cb, cc = colors
        w_a = (1.0 - u - v)[..., None]
        color = w_a * ca[safe] + u[..., None] * cb[safe] + v[..., None] * cc[safe]

    if shadows:
        shadow_o = pos + n * 1e-3 * jnp.max(
            jnp.linalg.norm(jnp.stack([a, b, c]), axis=-1)
        )
        ldir = light - pos
        ldir = ldir / jnp.linalg.norm(ldir, axis=-1, keepdims=True)
        _, _, _, _, occ = trace_mesh(shadow_o, ldir, ta, tb, tc, any_hit=True)
    else:
        occ = jnp.zeros(pos.shape[:-1], bool)

    shaded = _shade(pos, n, color, camera, light, occ)
    return t, pos, shaded, hit


def _default_light(camera: Camera, ta):
    ext = jnp.max(ta, axis=0) - jnp.min(ta, axis=0)
    return jnp.asarray(camera.eye, jnp.float32) + jnp.max(ext) * jnp.asarray(
        [0.0, 1.0, 0.0], jnp.float32
    )


def render_model(
    vertices,
    faces,
    camera: Camera,
    *,
    vertex_colors=None,
    light_pos: Optional[Tuple[float, float, float]] = None,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    shadows: bool = True,
) -> jax.Array:
    """Render the source mesh to an (H, W, 3) float image in [0, 1]
    (≙ RenderMode::Model, `model_render_pass.rs:22-84`)."""
    v = jnp.asarray(np.asarray(vertices, np.float32))
    f = np.asarray(faces, np.int64).reshape(-1, 3)
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    colors = None
    if vertex_colors is not None:
        col = jnp.asarray(np.asarray(vertex_colors, np.float32))
        colors = (col[f[:, 0]], col[f[:, 1]], col[f[:, 2]])
    light = (
        jnp.asarray(light_pos, jnp.float32)
        if light_pos is not None else _default_light(camera, ta)
    )
    t, pos, shaded, hit = _render_model_impl(
        ta, tb, tc, colors, camera, light, shadows=shadows
    )
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), shaded.shape)
    return jnp.where(hit[..., None], shaded, bg)


def render_model_and_sdf(
    vertices,
    faces,
    dist: jax.Array,
    grid: Grid,
    camera: Camera,
    iso: float = 0.0,
    *,
    vertex_colors=None,
    mode: RaymarchMode = RaymarchMode.TRILINEAR,
    light_pos: Optional[Tuple[float, float, float]] = None,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    sdf_color: Tuple[float, float, float] = (0.35, 0.45, 0.65),
    shadows: bool = True,
    max_steps: int = MAX_STEPS,
) -> jax.Array:
    """Composite the source mesh and the raymarched SDF surface
    (≙ RenderMode::ModelAndSdf, `sdf_program.rs:38-45`): both are traced
    and the nearer surface wins per pixel — the offline stand-in for the
    shared depth buffer."""
    v = jnp.asarray(np.asarray(vertices, np.float32))
    f = np.asarray(faces, np.int64).reshape(-1, 3)
    ta, tb, tc = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    colors = None
    if vertex_colors is not None:
        col = jnp.asarray(np.asarray(vertex_colors, np.float32))
        colors = (col[f[:, 0]], col[f[:, 1]], col[f[:, 2]])
    light = (
        jnp.asarray(light_pos, jnp.float32)
        if light_pos is not None else _default_light(camera, ta)
    )

    t_model, _, model_px, model_hit = _render_model_impl(
        ta, tb, tc, colors, camera, light, shadows=shadows
    )

    origins, directions = camera.rays()
    pos_s, _, sdf_hit = trace(dist, grid, origins, directions, iso, mode,
                              max_steps)
    t_sdf = jnp.linalg.norm(
        pos_s - jnp.asarray(camera.eye, jnp.float32), axis=-1
    )
    n_s = estimate_normal(dist, grid, pos_s, iso, mode)
    if shadows:
        eps = _grid_epsilon(grid)
        ldir = light - pos_s
        ldir = ldir / jnp.linalg.norm(ldir, axis=-1, keepdims=True)
        _, _, occ_s = trace(
            dist, grid, pos_s + n_s * eps * 4.0, ldir, iso, mode, max_steps
        )
    else:
        occ_s = jnp.zeros(t_sdf.shape, bool)
    sdf_px = _shade(
        pos_s, n_s,
        jnp.broadcast_to(jnp.asarray(sdf_color, jnp.float32), pos_s.shape),
        camera, light, occ_s,
    )

    t_m = jnp.where(model_hit, t_model, _INF)
    t_s = jnp.where(sdf_hit, t_sdf, _INF)
    model_wins = t_m <= t_s
    px = jnp.where(model_wins[..., None], model_px, sdf_px)
    any_hit = model_hit | sdf_hit
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), px.shape)
    return jnp.where(any_hit[..., None], px, bg)
