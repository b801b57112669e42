"""Offline visualization: samplers, raymarch renderer, isosurface tools.

Replaces the reference client's GPU render passes (SURVEY.md §2.2 K6-K10)
with array programs: the raymarch fragment shader becomes a vectorized
sphere-trace over the pixel grid; the voxel/point-cloud passes become
ordered-index extraction helpers; PNG files replace the swapchain.
"""
from .sampler import RaymarchMode, sample, sample_snap, sample_trilinear, sample_tetrahedral
from .raymarch import Camera, render, trace, estimate_normal
from .isosurface import ordered_indices, iso_limits, voxel_band, surface_cells, point_cloud
from .image import save_png, to_uint8
from .splat import colorize_distances, render_points, render_sdf_points
from .cubemap import Cubemap, generate_cubemap, sample_cubemap
from .model import render_model, render_model_and_sdf, trace_mesh
from .voxels import band_occupancy, dda_trace, render_voxels

__all__ = [
    "render_model", "render_model_and_sdf", "trace_mesh",
    "RaymarchMode", "sample", "sample_snap", "sample_trilinear",
    "sample_tetrahedral", "Camera", "render", "trace", "estimate_normal",
    "ordered_indices", "iso_limits", "voxel_band", "surface_cells",
    "point_cloud", "save_png", "to_uint8",
    "colorize_distances", "render_points", "render_sdf_points",
    "Cubemap", "generate_cubemap", "sample_cubemap",
    "band_occupancy", "dda_trace", "render_voxels",
]
