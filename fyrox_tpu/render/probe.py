"""Reflection probes: six-face environment capture + ambient irradiance.

Equivalent of the reference's ReflectionProbe node + renderer support
(fyrox-impl/src/scene/probe.rs:135; renderer convolution.rs computes the
specular/diffuse convolutions of the captured cube). The TPU version:

  * `capture_probe` renders the scene's emissive/albedo color from the
    probe position into 6 low-res faces (unlit capture — probes update
    rarely, and ambient bounce is a low-frequency signal),
  * `face_irradiance` integrates each face to one RGB irradiance value
    (the heavy convolution collapses to a 6-lobe cosine basis),
  * `apply_probe_ambient` adds albedo * Σ faces irradiance·max(0, n·d)
    to a shaded image — the diffuse IBL term.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.render import raster as raster_mod
from fyrox_tpu.render import shadows as shadows_mod

__all__ = ["capture_probe", "face_irradiance", "apply_probe_ambient",
           "FACE_DIRS"]

FACE_DIRS = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)


def capture_probe(world_tri_positions, tri_attrs, position, face_size=32,
                  tri_valid=None, chunk=64, z_far=200.0):
    """[6, S, S, 3] color faces captured from `position`.

    world_tri_positions [T,3,3] (one world); tri_attrs as for
    raster.rasterize (albedo/emission carry the capture color)."""
    vps = shadows_mod.point_vps(jnp.asarray(position), z_far=z_far)
    faces = []
    for f in range(6):
        clip = raster_mod.transform_clip(world_tri_positions, vps[f][None])
        g = raster_mod.rasterize(clip, tri_attrs, face_size, face_size,
                                 tri_valid=tri_valid, chunk=chunk,
                                 backface_cull=False)
        col = (g.albedo + g.emission) * g.mask[..., None]
        faces.append(col)
    return jnp.stack(faces, 0)


def face_irradiance(faces):
    """[6,3] mean RGB per face (the cosine-lobe diffuse basis)."""
    return jnp.mean(faces, axis=(1, 2))


def apply_probe_ambient(color, gbuf, irradiance, strength=1.0,
                        bounds=None, probe_inv=None):
    """Diffuse IBL: color += albedo * Σ_f irr[f] * max(0, n·dir_f).

    bounds/probe_inv: optionally restrict to pixels whose world position
    falls inside the probe's (inverse-transformed) unit box — the
    reference's probe bounding volume semantics."""
    n = gbuf.normal
    w = jnp.zeros(color.shape[:-1] + (3,))
    dirs = jnp.asarray(FACE_DIRS)
    irr = jnp.asarray(irradiance)
    acc = jnp.zeros_like(color)
    for f in range(6):
        ndl = jnp.clip(jnp.sum(n * dirs[f], -1), 0.0, 1.0)
        acc = acc + irr[f] * ndl[..., None]
    term = gbuf.albedo * acc * (strength / 3.0) * gbuf.mask[..., None]
    if probe_inv is not None:
        from fyrox_tpu.core import transform as tfm
        pl = tfm.transform_point(probe_inv[None, None], gbuf.position)
        inside = jnp.all(jnp.abs(pl) <= 0.5, axis=-1)
        term = term * inside[..., None]
    return color + term
