"""Lightmapper: baked per-vertex ambient occlusion + direct light.

Equivalent of the reference's CPU ray-traced lightmapper
(fyrox-impl/src/utils/lightmap.rs:855) re-scoped for the engine's dense
vertex pipeline: instead of UV-atlased textures, the bake writes
PER-VERTEX light (the renderer multiplies it into albedo/emission), which
needs no UV generation pass and feeds the same instanced mesh path.

Ray tracing runs batched in JAX (ray-triangle over the scene's triangle
soup, chunked); hemisphere sampling uses a deterministic Fibonacci sphere
like the reference's fixed sampling patterns.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["bake_vertex_ao", "bake_direct_light", "fibonacci_hemisphere"]


def fibonacci_hemisphere(n, normal):
    """[...,N,3] cosine-ish distributed directions above `normal` [...,3]."""
    i = np.arange(n) + 0.5
    phi = np.pi * (1.0 + 5.0 ** 0.5) * i
    z = i / n                       # favors the pole (cosine-weighted-ish)
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    local = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)  # [N,3] +Z up
    local = jnp.asarray(local, jnp.float32)
    # build a tangent frame per normal
    n_ = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True),
                              1e-8)
    helper = jnp.where(jnp.abs(n_[..., 1:2]) < 0.9,
                       jnp.asarray([0.0, 1.0, 0.0]),
                       jnp.asarray([1.0, 0.0, 0.0]))
    t = jnp.cross(helper, n_)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    b = jnp.cross(n_, t)
    return (local[..., 0:1] * t[..., None, :]
            + local[..., 1:2] * b[..., None, :]
            + local[..., 2:3] * n_[..., None, :])


def _ray_hits_any(origins, dirs, tris, max_t, eps=1e-4):
    """[...,] bool: does each ray hit ANY triangle within max_t?
    origins/dirs [...,3]; tris [T,3,3] (Möller–Trumbore, batched)."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    o = origins[..., None, :]
    d = dirs[..., None, :]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, -1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    tvec = o - v0
    u = jnp.sum(tvec * p, -1) * inv
    q = jnp.cross(tvec, e1)
    v = jnp.sum(d * q, -1) * inv
    t = jnp.sum(e2 * q, -1) * inv
    hit = ((jnp.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
           & (t > eps) & (t < max_t))
    return jnp.any(hit, axis=-1)


def bake_vertex_ao(positions, normals, tris_soup, n_rays=32, max_dist=2.0,
                   chunk=512):
    """[V] ambient-occlusion factor in [0,1] (1 = fully open).

    positions/normals [V,3]; tris_soup [T,3,3] world-space occluders
    (lightmap.rs hemisphere visibility integral, per-vertex)."""
    positions = jnp.asarray(positions, jnp.float32)
    normals = jnp.asarray(normals, jnp.float32)
    tris = jnp.asarray(tris_soup, jnp.float32)
    v = positions.shape[0]
    out = []
    offs = positions + normals * 1e-3

    def one_chunk(p, n):
        dirs = fibonacci_hemisphere(n_rays, n)              # [C,N,3]
        occ = _ray_hits_any(p[:, None, :] + 0 * dirs, dirs, tris, max_dist)
        return 1.0 - jnp.mean(occ.astype(jnp.float32), axis=-1)

    fn = jax.jit(one_chunk)
    for s in range(0, v, chunk):
        e = min(s + chunk, v)
        pad = chunk - (e - s)
        p = jnp.pad(offs[s:e], ((0, pad), (0, 0)))
        n = jnp.pad(normals[s:e], ((0, pad), (0, 0)), constant_values=1.0)
        out.append(np.asarray(fn(p, n))[:e - s])
    return np.concatenate(out)


def bake_direct_light(positions, normals, tris_soup, light_dir=None,
                      light_pos=None, intensity=1.0, chunk=512):
    """[V] direct light with shadow rays: directional (light_dir, world →
    light) or point (light_pos). Lambert x visibility, per vertex."""
    positions = jnp.asarray(positions, jnp.float32)
    normals = jnp.asarray(normals, jnp.float32)
    tris = jnp.asarray(tris_soup, jnp.float32)
    v = positions.shape[0]
    offs = positions + normals * 1e-3
    out = []

    def one_chunk(p, n):
        if light_dir is not None:
            ld = -jnp.asarray(light_dir, jnp.float32)
            ld = ld / jnp.maximum(jnp.linalg.norm(ld), 1e-8)
            dirs = jnp.broadcast_to(ld, p.shape)
            max_t = jnp.full(p.shape[:1], 1e6)
            att = 1.0
        else:
            lp = jnp.asarray(light_pos, jnp.float32)
            to_l = lp - p
            dist = jnp.linalg.norm(to_l, axis=-1)
            dirs = to_l / jnp.maximum(dist[..., None], 1e-8)
            max_t = dist - 1e-3
            att = 1.0 / jnp.maximum(dist * dist, 1e-4)
        ndl = jnp.clip(jnp.sum(n * dirs, -1), 0.0, 1.0)
        shadowed = _ray_hits_any(p, dirs, tris, max_t[:, None])
        return intensity * att * ndl * (1.0 - shadowed.astype(jnp.float32))

    fn = jax.jit(one_chunk)
    for s in range(0, v, chunk):
        e = min(s + chunk, v)
        pad = chunk - (e - s)
        p = jnp.pad(offs[s:e], ((0, pad), (0, 0)))
        n = jnp.pad(normals[s:e], ((0, pad), (0, 0)), constant_values=1.0)
        out.append(np.asarray(fn(p, n))[:e - s])
    return np.concatenate(out)
