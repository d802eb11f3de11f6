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

__all__ = ["build_hzb", "hzb_atlas", "occlusion_visible"]

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


def hzb_atlas(pyr):
    """Concatenate a mip pyramid into ONE flat array + static metadata.

    Returns (flat [sum(h_k*w_k)], offsets [L], widths [L], heights [L]).
    The per-node test then runs a single flat gather per texel instead of
    the round-2/3 per-level one-hot row+column matmuls (which cost
    O(N·H·W) per level — enabling occlusion could cost more than it
    saved; same flat-gather trick as the raster attribute pass)."""
    flat = jnp.concatenate([p.reshape(-1) for p in pyr])
    hs = np.asarray([p.shape[0] for p in pyr], np.int32)
    ws = np.asarray([p.shape[1] for p in pyr], np.int32)
    offsets = np.concatenate([[0], np.cumsum(hs.astype(np.int64)
                                             * ws)[:-1]]).astype(np.int32)
    return flat, offsets, ws, hs


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
    # one flat gather per texel over the concatenated mip atlas — no
    # per-level loop, no one-hot row/column matmuls
    flat, offsets, ws, hs = hzb_atlas(hzb)
    off = jnp.asarray(offsets)[lvl]
    wl = jnp.asarray(ws)[lvl]
    hl = jnp.asarray(hs)[lvl]
    s = jnp.exp2(lvl.astype(jnp.float32))
    ui = (u0 / s).astype(jnp.int32)
    vi = (v0 / s).astype(jnp.int32)
    occ = None
    for du in (0, 1):
        for dv in (0, 1):
            uu = jnp.clip(ui + du, 0, wl - 1)
            vv = jnp.clip(vi + dv, 0, hl - 1)
            val = flat[off + vv * wl + uu]
            occ = val if occ is None else jnp.maximum(occ, val)
    hidden = (zmin - eps > occ) & ~crosses_near
    return ~hidden
