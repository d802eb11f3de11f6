"""Cube-textured skybox.

Equivalent of the reference's SkyBox (fyrox-impl/src/scene/skybox.rs:638:
six textures on a unit cube drawn behind all geometry). Here the
background pixels sample the face set directly by camera ray direction —
no cube geometry pass needed; `pixel_ray_dirs` reconstructs the per-pixel
world ray from the camera basis and the skybox is one gather.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.render.probe import _sample_cube, face_texel_dirs

__all__ = ["SkyBox", "pixel_ray_dirs", "apply_skybox", "gradient_faces"]


class SkyBox:
    """Six [S,S,3] faces ordered +X,-X,+Y,-Y,+Z,-Z (skybox.rs field order
    right/left/top/bottom/front/back)."""

    def __init__(self, faces):
        faces = jnp.asarray(faces, jnp.float32)
        assert faces.ndim == 4 and faces.shape[0] == 6
        self.faces = faces

    def sample(self, dirs):
        return _sample_cube(self.faces, dirs)


def gradient_faces(zenith, horizon, size=16):
    """Procedural fallback skybox: vertical gradient baked into faces
    (the pre-round-3 gradient path, now expressed as a SkyBox)."""
    dirs = face_texel_dirs(size)                       # [6,S,S,3]
    t = 1.0 - np.clip(dirs[..., 1], 0.0, 1.0)          # 0 at zenith, 1 below horizon
    z = np.asarray(zenith, np.float32)
    h = np.asarray(horizon, np.float32)
    return jnp.asarray(z[None, None, None] * (1 - t[..., None])
                       + h[None, None, None] * t[..., None])


def pixel_ray_dirs(cam_global, fov_y, aspect, height, width):
    """[H,W,3] world-space view ray per pixel from the camera's global
    matrix (columns = right/up/-forward basis, like camera.view_matrix)."""
    ty = jnp.tan(0.5 * jnp.asarray(fov_y, jnp.float32))
    tx = ty * aspect
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    right = cam_global[:3, 0]
    up = cam_global[:3, 1]
    fwd = -cam_global[:3, 2]
    d = (fwd[None, None]
         + xs[None, :, None] * tx * right[None, None]
         + ys[:, None, None] * ty * up[None, None])
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


def apply_skybox(color, mask, skybox: SkyBox, cam_global, fov_y, aspect):
    """Fill non-covered pixels with the skybox sampled along view rays."""
    h, w = color.shape[-3:-1]
    dirs = pixel_ray_dirs(cam_global, fov_y, aspect, h, w)
    sky = skybox.sample(dirs)
    return jnp.where(mask[..., None], color, sky)
