"""Render layer: software rasterizer, deferred lighting, CSM shadows.

Replaces the reference's GL HAL + renderer (fyrox-graphics/-gl +
fyrox-impl/src/renderer) with batched XLA kernels (Pallas fast paths where
it counts).
"""

from fyrox_tpu.render import lighting, mesh, pipeline, raster, shadows
from fyrox_tpu.render.mesh import MeshData, make_cone, make_cube, make_plane, make_sphere
from fyrox_tpu.render.pipeline import (RenderConfig, RenderTemplate,
                                       build_render_template, render_frame,
                                       render_frame_demand)

__all__ = ["lighting", "mesh", "pipeline", "raster", "shadows",
           "MeshData", "make_cube", "make_sphere", "make_plane", "make_cone",
           "RenderConfig", "RenderTemplate", "build_render_template",
           "render_frame", "render_frame_demand"]
