"""Deferred PBR lighting.

Equivalent of the reference's DeferredLightRenderer (fyrox-impl/src/
renderer/light.rs:254). The reference marks per-light stencil volumes and
shades within them; in the data-parallel rasterizer every pixel shades all
lights with masked contributions (the idiomatic batched formulation — see
SURVEY.md §7 stage 6: fidelity target is the lighting equation, not the
stencil trick).

BRDF: Lambert diffuse + Cook-Torrance GGX specular, the same model the
reference's PBR shaders implement. Point/spot attenuation uses smooth
distance falloff clamped at the light radius; spot cones use the
hotspot/falloff angles of the reference's SpotLight.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

__all__ = ["LightSet", "shade"]

POINT, SPOT, DIRECTIONAL = 0, 1, 2


class LightSet(NamedTuple):
    """SoA lights; [L,...] arrays (static per template, or [W,L] batched)."""
    kind: jnp.ndarray         # [L] int32
    position: jnp.ndarray     # [L,3] (ignored for directional)
    direction: jnp.ndarray    # [L,3] normalized (spot/directional)
    color: jnp.ndarray        # [L,3]
    intensity: jnp.ndarray    # [L]
    radius: jnp.ndarray       # [L] effect radius (point/spot)
    cos_hotspot: jnp.ndarray  # [L] inner cone cos (spot)
    cos_falloff: jnp.ndarray  # [L] outer cone cos (spot)
    enabled: jnp.ndarray      # [L] bool


def _ggx_brdf(n, v, l, albedo, metallic, roughness):
    """Cook-Torrance GGX (same family as the reference's PBR shader)."""
    h = v + l
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-8)
    nl = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    nv = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    nh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    vh = jnp.maximum(jnp.sum(v * h, -1), 0.0)

    a = jnp.maximum(roughness * roughness, 1e-3)
    a2 = a * a
    d = a2 / jnp.maximum(np.pi * (nh * nh * (a2 - 1.0) + 1.0) ** 2, 1e-8)
    k = (roughness + 1.0) ** 2 / 8.0
    g = (nl / jnp.maximum(nl * (1 - k) + k, 1e-8)) * \
        (nv / jnp.maximum(nv * (1 - k) + k, 1e-8))
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    f = f0 + (1.0 - f0) * (1.0 - vh[..., None]) ** 5

    spec = (d * g)[..., None] * f / jnp.maximum(4.0 * nl * nv, 1e-8)[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo / np.pi
    return (diffuse + spec) * nl[..., None]


def shade(gbuf, lights: LightSet, camera_pos, ambient=(0.03, 0.03, 0.03),
          shadow_fn=None):
    """Shade a G-buffer. camera_pos [3] or broadcastable to pixels.

    shadow_fn: optional callable (light_index, world_pos [H,W,3]) → [H,W]
    visibility in [0,1] (CSM lookup for directional lights).
    """
    n = gbuf.normal
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    p = gbuf.position
    v = camera_pos - p
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    albedo = gbuf.albedo
    metallic = gbuf.material[..., 0]
    roughness = gbuf.material[..., 1]

    color = jnp.asarray(ambient, jnp.float32) * albedo + gbuf.emission

    num_lights = lights.kind.shape[0]
    for li in range(num_lights):  # static unroll over the template's lights
        kind = int(lights.kind[li])
        lcol = lights.color[li] * lights.intensity[li]
        if kind == DIRECTIONAL:
            ldir = -lights.direction[li]
            ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-8)
            l = jnp.broadcast_to(ldir, p.shape)
            atten = jnp.ones(p.shape[:-1], jnp.float32)
        else:
            to_l = lights.position[li] - p
            dist = jnp.linalg.norm(to_l, axis=-1)
            l = to_l / jnp.maximum(dist[..., None], 1e-8)
            r = jnp.maximum(lights.radius[li], 1e-4)
            # smooth radius-clamped falloff (UE-style windowed inverse square)
            window = jnp.clip(1.0 - (dist / r) ** 4, 0.0, 1.0) ** 2
            atten = window / (dist * dist + 1.0)
            if kind == SPOT:
                cd = jnp.sum(-l * lights.direction[li], -1)
                cone = jnp.clip(
                    (cd - lights.cos_falloff[li])
                    / jnp.maximum(lights.cos_hotspot[li] - lights.cos_falloff[li],
                                  1e-5), 0.0, 1.0)
                atten = atten * cone
        vis = jnp.ones(p.shape[:-1], jnp.float32)
        if shadow_fn is not None:
            sv = shadow_fn(li, p)
            if sv is not None:
                vis = sv
        brdf = _ggx_brdf(n, v, l, albedo, metallic, roughness)
        contrib = brdf * lcol * (atten * vis *
                                 lights.enabled[li].astype(jnp.float32))[..., None]
        color = color + contrib

    return jnp.where(gbuf.mask[..., None], color, jnp.zeros_like(color))
