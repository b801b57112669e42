"""Distribution: device meshes, sharded query/grid generation, training.

The reference has no distributed anything (SURVEY.md §2.3); here scaling is
first-class: a (cells, tris) logical mesh, sharded generate_sdf (champion
all-gather + psum parity), x-slab-sharded CPT grid generation with halo
exchange, and a sharded training step whose vertex-gradient all-reduce is
inserted by shard_map's transpose.
"""
from .mesh import (
    CELL_AXIS,
    TRI_AXIS,
    cell_sharding,
    initialize_distributed,
    make_sdf_mesh,
    pad_for_axis,
    replicated,
    tri_sharding,
)
from .sharding import (
    generate_grid_sdf_sharded,
    generate_sdf_sharded,
    sharded_fit_step_fn,
    sharded_sdf_fn,
)
from .grid_sharded import generate_grid_sdf_sharded_cpt

__all__ = [
    "CELL_AXIS", "TRI_AXIS", "cell_sharding", "initialize_distributed",
    "make_sdf_mesh", "pad_for_axis", "replicated", "tri_sharding",
    "generate_grid_sdf_sharded", "generate_sdf_sharded",
    "sharded_fit_step_fn", "sharded_sdf_fn", "generate_grid_sdf_sharded_cpt",
]
