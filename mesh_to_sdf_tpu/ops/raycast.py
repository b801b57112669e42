"""Grid raycast sign kernel: per-axis line parity.

TPU-native replacement for the reference's BVH raycast phase
(`mesh_to_sdf/src/generate/grid.rs:560-684`): one ray per boundary cell of the
three negative grid faces, along +X/+Y/+Z. The reference traverses a BVH per
ray and bumps an atomic counter for every cell in front of each hit; here each
axis becomes a dense (lines × triangle-block) sweep with a per-cell threshold
comparison — the atomic prefix increment turns into the closed form
``count[l, i] = Σ_j hit[l, j] ∧ (i ≤ floor(t[l, j] / cell_size))`` which
reproduces `grid.rs:601-618` exactly (including the floor/clamp semantics and
negative cell sizes).

Final sign: a cell is inside iff ≥2 of the 3 axis parities are odd
(`grid.rs:622-639`, best-of-3 voting).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..grid import Grid
from . import geometry


@functools.partial(jax.jit, static_argnames=("tri_block", "line_chunk"))
def grid_inside_mask(
    grid: Grid,
    tri_a: jax.Array,  # (T, 3) padded
    tri_b: jax.Array,
    tri_c: jax.Array,
    tri_valid: jax.Array,  # (T,)
    *,
    tri_block: int = 256,
    line_chunk: int = 256,
) -> jax.Array:
    """Boolean (nx, ny, nz) mask: True where the cell is inside the mesh."""
    odd = [
        _axis_parity(grid, axis, tri_a, tri_b, tri_c, tri_valid, tri_block, line_chunk)
        for axis in range(3)
    ]
    votes = (
        odd[0].astype(jnp.int32) + odd[1].astype(jnp.int32) + odd[2].astype(jnp.int32)
    )
    return votes >= 2


def _axis_parity(grid, axis, tri_a, tri_b, tri_c, tri_valid, tri_block, line_chunk):
    """Odd-crossing parity per cell for rays along +axis. Returns (nx,ny,nz)."""
    nx, ny, nz = grid.cell_count
    n = grid.cell_count[axis]
    cs = grid.cell_size[axis]

    # Ray origins: centers of the cells with index 0 along `axis`
    # (`grid.rs:648-684` — rays start on the three negative faces).
    centers = grid.all_cell_centers()
    if axis == 0:
        origins = centers[0]  # (ny, nz, 3)
        lshape = (ny, nz)
    elif axis == 1:
        origins = centers[:, 0]  # (nx, nz, 3)
        lshape = (nx, nz)
    else:
        origins = centers[:, :, 0]  # (nx, ny, 3)
        lshape = (nx, ny)
    L = lshape[0] * lshape[1]
    origins = origins.reshape(L, 3)

    n_blocks = tri_a.shape[0] // tri_block
    blocks = jax.tree.map(
        lambda x: x.reshape((n_blocks, tri_block) + x.shape[1:]),
        (tri_a, tri_b, tri_c, tri_valid),
    )

    # Pad lines to a multiple of line_chunk and map over chunks.
    chunk = min(line_chunk, L)
    pad = (-L) % chunk
    origins_p = jnp.pad(origins, ((0, pad), (0, 0)))
    n_chunks = origins_p.shape[0] // chunk
    origins_p = origins_p.reshape(n_chunks, chunk, 3)

    cell_f = jnp.arange(n, dtype=jnp.float32)  # integer cell coords as f32

    def line_chunk_counts(orig):  # orig: (chunk, 3)
        def body(counts, blk):
            a, b, c, valid = blk
            inside, t = geometry.ray_triangle_aligned_2d(
                orig[:, None, :], a[None, :, :], b[None, :, :], c[None, :, :], axis
            )
            hit = inside & (t > 0.0) & valid[None, :]
            # Cells 0..=floor(t/cs) are in front of the hit (`grid.rs:605-617`).
            b_idx = jnp.floor(t / cs)
            covered = hit[:, :, None] & (cell_f[None, None, :] <= b_idx[:, :, None])
            return counts + jnp.sum(covered, axis=1, dtype=jnp.int32), None

        init = jnp.zeros((chunk, n), jnp.int32)
        counts, _ = jax.lax.scan(body, init, blocks)
        return counts

    counts = jax.lax.map(line_chunk_counts, origins_p).reshape(-1, n)[:L]
    odd = (counts % 2 == 1).reshape(lshape + (n,))

    # Rotate the (lines, ray-axis) layout back into (nx, ny, nz).
    if axis == 0:
        return jnp.transpose(odd, (2, 0, 1))
    if axis == 1:
        return jnp.transpose(odd, (0, 2, 1))
    return odd
