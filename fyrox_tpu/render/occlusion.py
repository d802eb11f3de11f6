"""Occlusion culling: occluder depth prepass + hierarchical-Z testing.

Equivalent of the reference's GPU-driven occlusion culling
(fyrox-impl/src/renderer/occlusion/mod.rs:60: render AABBs against the
depth buffer, read back per-object visibility). The GL design needs an
async read-back; a TPU rasterizer keeps everything on device:

    1. depth prepass of designated occluder geometry at reduced
       resolution (a quarter-res rasterize of the occluder triangle set),
    2. a max-depth mip pyramid (HZB) over that prepass,
    3. per-node test: project the world AABB, pick the mip level that
       covers its screen rect with ~2x2 texels, compare the AABB's
       nearest depth against the farthest HZB depth — conservatively
       visible unless provably behind.

The result is a [N] bool visibility mask AND-ed into the frustum cull
(render/pipeline.py), exactly where `ObserverVisibilityCache` feeds the
reference's bundle collection.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["build_hzb", "occlusion_visible"]

_FAR = 1.0e9


def build_hzb(depth, levels=None):
    """Max-depth pyramid. depth [H,W] (NDC z, +big where empty) →
    list of [H/2^k, W/2^k] arrays, level 0 = input."""
    h, w = depth.shape
    if levels is None:
        levels = int(np.log2(max(min(h, w), 2)))
    pyr = [depth]
    d = depth
    for _ in range(levels):
        h2, w2 = d.shape[0] // 2, d.shape[1] // 2
        if h2 < 1 or w2 < 1:
            break
        d = jnp.max(d[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2), axis=(1, 3))
        pyr.append(d)
    return pyr


def _sample_level(level, u, v):
    """4-texel conservative max around (u,v) in texel coords."""
    h, w = level.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    out = None
    for du in (0, 1):
        for dv in (0, 1):
            uu = jnp.clip(ui + du, 0, w - 1)
            vv = jnp.clip(vi + dv, 0, h - 1)
            # tiny table lookup via one-hot reductions would be overkill
            # here: N nodes x small pyramid — a take is fine host-side but
            # slow on TPU; levels are small so use one-hot on rows+cols
            ohr = (jnp.arange(h) == vv[..., None]).astype(level.dtype)
            row = jnp.sum(level[None] * ohr[..., None], axis=-2)   # [N,W]
            ohc = (jnp.arange(w) == uu[..., None]).astype(level.dtype)
            val = jnp.sum(row * ohc, axis=-1)
            out = val if out is None else jnp.maximum(out, val)
    return out


def occlusion_visible(wmin, wmax, vp, hzb, width, height, eps=1e-3):
    """[N] bool: node AABBs not provably hidden behind the HZB.

    wmin/wmax [N,3] world AABBs; vp [4,4]; hzb from build_hzb over a
    [height,width] prepass."""
    corners = jnp.stack([
        jnp.stack([jnp.where(m & 1, wmax[:, 0], wmin[:, 0]),
                   jnp.where(m & 2, wmax[:, 1], wmin[:, 1]),
                   jnp.where(m & 4, wmax[:, 2], wmin[:, 2])], -1)
        for m in range(8)], axis=1)                          # [N,8,3]
    ph = jnp.concatenate([corners, jnp.ones_like(corners[..., :1])], -1)
    clip = jnp.sum(vp[None, None] * ph[..., None, :], -1)     # [N,8,4]
    w_c = clip[..., 3]
    crosses_near = jnp.any(w_c <= 1e-6, axis=1)               # conservative
    safe_w = jnp.where(w_c <= 1e-6, 1.0, w_c)
    ndc = clip[..., :3] / safe_w[..., None]
    u = (ndc[..., 0] * 0.5 + 0.5) * width
    v = (0.5 - ndc[..., 1] * 0.5) * height
    zmin = jnp.min(jnp.where(w_c > 1e-6, ndc[..., 2], _FAR), axis=1)
    u0 = jnp.clip(jnp.min(u, axis=1), 0, width - 1)
    u1 = jnp.clip(jnp.max(u, axis=1), 0, width - 1)
    v0 = jnp.clip(jnp.min(v, axis=1), 0, height - 1)
    v1 = jnp.clip(jnp.max(v, axis=1), 0, height - 1)

    # level where the rect spans <= ~2 texels
    span = jnp.maximum(u1 - u0, v1 - v0)
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(span, 1.0))).astype(jnp.int32),
                   0, len(hzb) - 1)
    occ = jnp.full(zmin.shape, -_FAR)
    for li, level in enumerate(hzb):
        s = float(1 << li)
        val = _sample_level(level, u0 / s, v0 / s)
        occ = jnp.where(lvl == li, val, occ)
    hidden = (zmin - eps > occ) & ~crosses_near
    return ~hidden
