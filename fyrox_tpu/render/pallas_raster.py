"""Pallas tiled/binned rasterizer — the performance path.

Replaces the XLA streaming z-buffer (render/raster.py) for the visibility
pass. Three phases:

  1. XLA prep: screen-space edge/z-plane coefficients per triangle +
     per-tile binning (bbox overlap → top-K triangle ids per tile).
  2. Pallas kernel: grid over screen tiles; each tile loops over its K
     binned triangles entirely in VMEM/registers and maintains a tile-local
     z-buffer + winner index + barycentrics. This is where the O(T·H·W)
     brute force becomes O(K·tile) — the same tile-binning idea as the
     reference's GPU rasterization, recast for the VPU's (8,128) lanes.
  3. XLA attribute pass: per-pixel gather of the winning triangle's vertex
     attributes + perspective-correct interpolation (a handful of fused
     gathers — no need for Pallas here).

Validated bit-for-bit-ish (same visibility set, z within 1e-5) against
render/raster.py by tests/test_pallas_raster.py.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fyrox_tpu.render.raster import GBuffer, clip_near

__all__ = ["rasterize_pallas"]

_BIG = 1e9
_NFEAT = 16  # padded feature row per triangle


def _tri_features(tri_clip, tri_valid, height, width):
    """Per-triangle screen-space constants.

    Returns feats [T,_NFEAT]: a0,b0,c0,a1,b1,c1 (edge-affine barycentrics
    w0,w1 as functions of pixel coords), za,zb,zc (z plane), valid flag.
    """
    w_clip = tri_clip[..., 3]
    degenerate = jnp.any(w_clip <= 1e-6, axis=-1)
    safe_w = jnp.where(w_clip <= 1e-6, 1.0, w_clip)
    ndc = tri_clip[..., :3] / safe_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    sz = ndc[..., 2]

    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    ok = tri_valid & (area < -1e-9) & ~degenerate
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-9, 1.0, area)

    # w0(p) = ((x2-x1)(py-y1) - (y2-y1)(px-x1)) / area
    a0 = -(y2 - y1) * inv_area
    b0 = (x2 - x1) * inv_area
    c0 = ((y2 - y1) * x1 - (x2 - x1) * y1) * inv_area
    # w1(p) = ((x0-x2)(py-y2) - (y0-y2)(px-x2)) / area
    a1 = -(y0 - y2) * inv_area
    b1 = (x0 - x2) * inv_area
    c1 = ((y0 - y2) * x2 - (x0 - x2) * y2) * inv_area
    # z(p) = w0 z0 + w1 z1 + (1-w0-w1) z2
    za = a0 * (sz[:, 0] - sz[:, 2]) + a1 * (sz[:, 1] - sz[:, 2])
    zb = b0 * (sz[:, 0] - sz[:, 2]) + b1 * (sz[:, 1] - sz[:, 2])
    zc = (c0 * (sz[:, 0] - sz[:, 2]) + c1 * (sz[:, 1] - sz[:, 2]) + sz[:, 2])

    feats = jnp.stack([a0, b0, c0, a1, b1, c1, za, zb, zc,
                       ok.astype(jnp.float32)], -1)
    feats = jnp.pad(feats, ((0, 0), (0, _NFEAT - feats.shape[-1])))
    bbox = jnp.stack([jnp.min(sx, -1), jnp.min(sy, -1),
                      jnp.max(sx, -1), jnp.max(sy, -1)], -1)
    return feats, bbox, ok


def _bin_triangles(bbox, ok, height, width, tile_h, tile_w, k_per_tile):
    """Top-K triangle ids per tile by bbox overlap. [nty, ntx, K] int32."""
    nty = height // tile_h
    ntx = width // tile_w
    t = bbox.shape[0]
    ty0 = jnp.arange(nty, dtype=jnp.float32)[:, None] * tile_h
    tx0 = jnp.arange(ntx, dtype=jnp.float32)[None, :] * tile_w
    # overlap [T, nty, ntx]
    ov = ((bbox[:, None, None, 0] < tx0[None] + tile_w)
          & (bbox[:, None, None, 2] >= tx0[None])
          & (bbox[:, None, None, 1] < ty0[None] + tile_h)
          & (bbox[:, None, None, 3] >= ty0[None])
          & ok[:, None, None])
    # earliest-index K winners per tile (stable draw order not needed: depth
    # test resolves; we just need ANY K covering the tile — overflow drops
    # the highest indices)
    score = jnp.where(ov, -jnp.arange(t, dtype=jnp.int32)[:, None, None],
                      jnp.int32(-2 ** 30))
    topv, topi = jax.lax.top_k(jnp.moveaxis(score, 0, -1).reshape(nty, ntx, t),
                               k_per_tile)
    valid = topv > -2 ** 29
    return jnp.where(valid, topi, 0).astype(jnp.int32), valid


def _raster_kernel(feat_ref, z_ref, idx_ref, w0_ref, w1_ref,
                   *, tile_h, tile_w, k_per_tile):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    py = (ti * tile_h + row_i).astype(jnp.float32) + 0.5
    px = (tj * tile_w + col_i).astype(jnp.float32) + 0.5

    z_ref[:] = jnp.full((tile_h, tile_w), _BIG, jnp.float32)
    idx_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
    w0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
    w1_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    def body(k, _):
        f = feat_ref[0, 0, k]                 # [_NFEAT]; f[10] = bin validity
        w0 = f[0] * px + f[1] * py + f[2]
        w1 = f[3] * px + f[4] * py + f[5]
        w2 = 1.0 - w0 - w1
        z = f[6] * px + f[7] * py + f[8]
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                  & (z >= -1.0) & (z <= 1.0)
                  & (f[9] > 0.5) & (f[10] > 0.5))
        better = inside & (z < z_ref[:])
        z_ref[:] = jnp.where(better, z, z_ref[:])
        idx_ref[:] = jnp.where(better, k, idx_ref[:])
        w0_ref[:] = jnp.where(better, w0, w0_ref[:])
        w1_ref[:] = jnp.where(better, w1, w1_ref[:])
        return _

    jax.lax.fori_loop(0, k_per_tile, body, None)


def _visibility_pallas(feats, tile_ids, tile_valid, height, width,
                       tile_h, tile_w, k_per_tile, interpret=False):
    """Run the tile kernel. Returns (z, local_idx, w0, w1) [H,W]."""
    nty = height // tile_h
    ntx = width // tile_w
    feat_tiles = feats[tile_ids]                     # [nty,ntx,K,_NFEAT]
    # fold the bin-slot validity into feature slot 10
    feat_tiles = feat_tiles.at[..., 10].set(tile_valid.astype(jnp.float32))

    grid = (nty, ntx)
    out_shape = [
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.int32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
        jax.ShapeDtypeStruct((height, width), jnp.float32),
    ]
    out_specs = [pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    in_specs = [
        pl.BlockSpec((1, 1, k_per_tile, _NFEAT), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    z, idx, w0, w1 = pl.pallas_call(
        partial(_raster_kernel, tile_h=tile_h, tile_w=tile_w,
                k_per_tile=k_per_tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(feat_tiles)
    return z, idx, w0, w1


def rasterize_pallas(tri_clip, tri_attrs: Dict[str, jnp.ndarray], height,
                     width, tri_valid=None, tile_h=32, tile_w=128,
                     k_per_tile=256, near_clip=True, interpret=False):
    """Drop-in replacement for raster.rasterize (single image; vmap over
    worlds). Requires height % tile_h == 0 and width % tile_w == 0."""
    assert height % tile_h == 0 and width % tile_w == 0
    if tri_valid is None:
        tri_valid = jnp.ones(tri_clip.shape[0], bool)
    if near_clip:
        tri_clip, tri_attrs, tri_valid = clip_near(tri_clip, tri_attrs, tri_valid)
    k_per_tile = min(k_per_tile, tri_clip.shape[0])

    feats, bbox, ok = _tri_features(tri_clip, tri_valid, height, width)
    tile_ids, tile_valid = _bin_triangles(bbox, ok, height, width,
                                          tile_h, tile_w, k_per_tile)
    z, local_idx, w0, w1 = _visibility_pallas(
        feats, tile_ids, tile_valid, height, width, tile_h, tile_w,
        k_per_tile, interpret=interpret)

    # local tile slot → global triangle id
    py_tile = jnp.arange(height) // tile_h
    px_tile = jnp.arange(width) // tile_w
    tid_grid = tile_ids[py_tile[:, None], px_tile[None, :]]   # [H,W,K]
    mask = local_idx >= 0
    safe_local = jnp.maximum(local_idx, 0)
    tri_id = jnp.take_along_axis(tid_grid, safe_local[..., None], axis=-1)[..., 0]

    # perspective-correct interpolation in XLA
    w_clip = tri_clip[..., 3]
    iw = 1.0 / jnp.where(w_clip <= 1e-6, 1.0, w_clip)        # [T,3]
    iw_px = iw[tri_id]                                        # [H,W,3]
    w2 = 1.0 - w0 - w1
    pw0 = w0 * iw_px[..., 0]
    pw1 = w1 * iw_px[..., 1]
    pw2 = w2 * iw_px[..., 2]
    denom = jnp.maximum(pw0 + pw1 + pw2, 1e-12)
    pw0, pw1, pw2 = pw0 / denom, pw1 / denom, pw2 / denom

    out = {}
    for k, v in tri_attrs.items():
        av = v[tri_id]                                        # [H,W,3,C]
        out[k] = (pw0[..., None] * av[..., 0, :]
                  + pw1[..., None] * av[..., 1, :]
                  + pw2[..., None] * av[..., 2, :])
        out[k] = jnp.where(mask[..., None], out[k], 0.0)

    z = jnp.where(mask, z, _BIG)
    return GBuffer(depth=z, albedo=out["albedo"], normal=out["normal"],
                   position=out["position"], material=out["material"],
                   emission=out["emission"], mask=mask)
