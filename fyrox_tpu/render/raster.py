"""Batched software rasterizer (XLA reference path).

Replaces the reference's GL geometry pipeline (fyrox-graphics-gl; G-buffer
fill gbuffer.rs:57) with a data-parallel streaming z-buffer: triangles are
processed in fixed-size chunks under lax.scan; each chunk computes edge
functions against the full pixel grid, picks its per-pixel winner by depth,
and merges into the running G-buffer. O(T·H·W) brute force — the fully
vectorized formulation XLA fuses well; the Pallas tiled/binned kernel
(render/pallas_raster.py) is the performance path and is validated against
this one.

Conventions: clip space from the nalgebra-style projection (RH, NDC z in
[-1,1], y up); viewport maps NDC to pixel centers with y flipped. Back
faces (clockwise in screen space after projection) are culled, matching GL
CCW front faces.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["GBuffer", "rasterize", "transform_clip"]

_BIG = jnp.float32(1e9)


class GBuffer(NamedTuple):
    """Per-pixel outputs. Layout mirrors the reference MRT set
    (gbuffer.rs:23-27: diffuse, normal, ambient/emission, material) with
    world position kept explicitly instead of depth-reconstruction."""
    depth: jnp.ndarray      # [..., H, W] NDC z, +inf where empty
    albedo: jnp.ndarray     # [..., H, W, 3]
    normal: jnp.ndarray     # [..., H, W, 3] world space
    position: jnp.ndarray   # [..., H, W, 3] world space
    material: jnp.ndarray   # [..., H, W, 2] metallic, roughness
    emission: jnp.ndarray   # [..., H, W, 3]
    mask: jnp.ndarray       # [..., H, W] bool coverage
    # interpolated (u, v, albedo_layer, mr_layer) when the scene binds
    # material textures (pipeline samples the scene texture array at
    # shade time); None in untextured scenes
    uvt: object = None      # [..., H, W, 4] or None


def transform_clip(positions, mvp):
    """positions [...,V,3] @ mvp [...,4,4] → clip [...,V,4]."""
    p = jnp.concatenate([positions, jnp.ones_like(positions[..., :1])], -1)
    return jnp.einsum("...ij,...vj->...vi", mvp, p, precision="highest")


def clip_near(tri_clip, tri_attrs, tri_valid, eps=1e-4):
    """Branch-free Sutherland–Hodgman clip against the w = eps plane.

    A triangle crossing the plane yields 1 or 2 triangles; output is the
    fixed 2x expansion [2T,...] with a validity mask (slot 2 only used in
    the two-inside case). Attributes are lerped at the intersections.
    """
    w = tri_clip[..., 3]
    d = w - eps                           # [T,3]
    inside = d >= 0.0
    n_in = jnp.sum(inside.astype(jnp.int32), -1)

    # rotate so the 'unique' vertex sits at slot 0:
    #   n_in==1 → the single inside vertex; n_in==2 → the single outside one
    uniq = jnp.where(n_in == 1, jnp.argmax(inside, -1),
                     jnp.argmax(~inside, -1)).astype(jnp.int32)
    order = (uniq[:, None] + jnp.arange(3, dtype=jnp.int32)[None]) % 3  # [T,3]

    def rot(x):
        return jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)

    v = rot(tri_clip)                     # [T,3,4]
    a = {k: rot(x) for k, x in tri_attrs.items()}
    dd = jnp.take_along_axis(d, order, axis=1)

    def isect(i, j):
        t = dd[:, i] / (dd[:, i] - dd[:, j])
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        vi = v[:, i] + t * (v[:, j] - v[:, i])
        ai = {k: x[:, i] + t * (x[:, j] - x[:, i]) for k, x in a.items()}
        return vi, ai

    i01_v, i01_a = isect(0, 1)
    i02_v, i02_a = isect(0, 2)

    def pick3(c1, vs1, c2, vs2, c3, vs3):
        """per-triangle select among three [T,3,·] candidates by case"""
        out = jnp.where(c1[:, None, None], vs1,
                        jnp.where(c2[:, None, None], vs2, vs3))
        return out

    case3 = n_in == 3
    case1 = n_in == 1
    case2 = n_in == 2

    # first output triangle
    tri1_v = pick3(case3, v,
                   case1, jnp.stack([v[:, 0], i01_v, i02_v], 1),
                   case2, jnp.stack([i01_v, v[:, 1], v[:, 2]], 1))
    tri1_a = {k: pick3(case3, a[k],
                       case1, jnp.stack([a[k][:, 0], i01_a[k], i02_a[k]], 1),
                       case2, jnp.stack([i01_a[k], a[k][:, 1], a[k][:, 2]], 1))
              for k in a}
    tri1_ok = tri_valid & (n_in > 0)
    # second output triangle (only the two-inside case)
    tri2_v = jnp.stack([i01_v, v[:, 2], i02_v], 1)
    tri2_a = {k: jnp.stack([i01_a[k], a[k][:, 2], i02_a[k]], 1) for k in a}
    tri2_ok = tri_valid & case2

    out_v = jnp.concatenate([tri1_v, tri2_v], 0)
    out_a = {k: jnp.concatenate([tri1_a[k], tri2_a[k]], 0) for k in a}
    out_ok = jnp.concatenate([tri1_ok, tri2_ok], 0)
    return out_v, out_a, out_ok


def rasterize(tri_clip, tri_attrs: Dict[str, jnp.ndarray], height, width,
              tri_valid=None, chunk=64, near_clip=True, backface_cull=True):
    """Rasterize triangles into a G-buffer.

    tri_clip: [T,3,4] clip-space vertices (single image; vmap over worlds).
    tri_attrs: dict name → [T,3,C] per-vertex attributes; must contain
      'normal' [T,3,3], 'position' [T,3,3] (world), 'albedo' [T,3,3],
      'material' [T,3,2], 'emission' [T,3,3].
    tri_valid: [T] bool (culled/instance-masked triangles).
    """
    if tri_valid is None:
        tri_valid = jnp.ones(tri_clip.shape[0], bool)
    if near_clip:
        tri_clip, tri_attrs, tri_valid = clip_near(tri_clip, tri_attrs, tri_valid)

    t_total = tri_clip.shape[0]
    pad = (-t_total) % chunk
    if pad:
        tri_clip = jnp.pad(tri_clip, ((0, pad), (0, 0), (0, 0)))
        tri_attrs = {k: jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                     for k, v in tri_attrs.items()}
        tri_valid = jnp.pad(tri_valid, (0, pad))
    t_padded = tri_clip.shape[0]
    n_chunks = t_padded // chunk

    # pixel centers
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))

    attr_dims = {k: v.shape[-1] for k, v in tri_attrs.items()}
    names = sorted(attr_dims)
    packed = jnp.concatenate([tri_attrs[k] for k in names], -1)  # [T,3,Ctot]
    ctot = packed.shape[-1]

    tc = tri_clip.reshape(n_chunks, chunk, 3, 4)
    ta = packed.reshape(n_chunks, chunk, 3, ctot)
    tv = tri_valid.reshape(n_chunks, chunk)

    def chunk_step(carry, inp):
        zbuf, abuf, mbuf = carry
        clip, attrs, valid = inp
        w_clip = clip[..., 3]                              # [C,3]
        behind = w_clip <= 1e-6                            # post-clip: degenerate
        safe_w = jnp.where(behind, 1.0, w_clip)
        ndc = clip[..., :3] / safe_w[..., None]
        # viewport transform (y down in pixel space)
        sx = (ndc[..., 0] * 0.5 + 0.5) * width
        sy = (0.5 - ndc[..., 1] * 0.5) * height
        sz = ndc[..., 2]

        x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
        y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # [C]
        # cull: backfaces (area >= 0 in y-down space == CW == GL backface),
        # any vertex behind the near plane (no clipping in round 1), invalid.
        # Depth-only shadow passes disable culling (a caster must occlude
        # from every direction, matching GL shadow passes without cull).
        if backface_cull:
            ok = valid & (area < -1e-9) & ~jnp.any(behind, axis=-1)
        else:
            ok = valid & (jnp.abs(area) > 1e-9) & ~jnp.any(behind, axis=-1)
        inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-9, 1.0, area)

        def edge(xa, ya, xb, yb):
            # signed area of (a,b,p) — [C,H,W]
            return ((xb - xa)[:, None, None] * (py[None] - ya[:, None, None])
                    - (yb - ya)[:, None, None] * (px[None] - xa[:, None, None]))

        w0 = edge(x1, y1, x2, y2) * inv_area[:, None, None]
        w1 = edge(x2, y2, x0, y0) * inv_area[:, None, None]
        w2 = 1.0 - w0 - w1
        # depth-only (no-cull) passes tolerate a tiny negative barycentric:
        # shared-edge pixels must not leak light through a watertight
        # caster (FP noise on the diagonal otherwise opens pinholes)
        thr = 0.0 if backface_cull else -1e-5
        inside = (w0 >= thr) & (w1 >= thr) & (w2 >= thr) & ok[:, None, None]

        z = (w0 * sz[:, 0, None, None] + w1 * sz[:, 1, None, None]
             + w2 * sz[:, 2, None, None])
        inside = inside & (z >= -1.0) & (z <= 1.0)
        z = jnp.where(inside, z, _BIG)

        # chunk-local winner per pixel
        zmin = jnp.min(z, axis=0)                          # [H,W]
        winner = jnp.argmin(z, axis=0)                     # [H,W]
        hit = zmin < _BIG

        # perspective-correct barycentrics of the winner
        def gsel(a):  # a [C,H,W] → [H,W]
            return jnp.take_along_axis(a, winner[None], axis=0)[0]

        bw0, bw1, bw2 = gsel(w0), gsel(w1), gsel(w2)
        iw = 1.0 / safe_w                                  # [C,3]
        iw_sel = iw[winner]                                # [H,W,3]
        pw0 = bw0 * iw_sel[..., 0]
        pw1 = bw1 * iw_sel[..., 1]
        pw2 = bw2 * iw_sel[..., 2]
        denom = jnp.maximum(pw0 + pw1 + pw2, 1e-12)
        pw0, pw1, pw2 = pw0 / denom, pw1 / denom, pw2 / denom

        attr_sel = attrs[winner]                           # [H,W,3,Ctot]
        interp = (pw0[..., None] * attr_sel[..., 0, :]
                  + pw1[..., None] * attr_sel[..., 1, :]
                  + pw2[..., None] * attr_sel[..., 2, :])  # [H,W,Ctot]

        better = hit & (zmin < zbuf)
        zbuf = jnp.where(better, zmin, zbuf)
        abuf = jnp.where(better[..., None], interp, abuf)
        mbuf = mbuf | better
        return (zbuf, abuf, mbuf), None

    # seed the scan carries from an input-derived zero so they are
    # device-varying under shard_map (a constant-initialized carry has
    # unvarying manual axes and the scan rejects the carry type change)
    dv0 = tc.reshape(-1)[0] * 0.0
    zbuf0 = jnp.full((height, width), _BIG, jnp.float32) + dv0
    abuf0 = jnp.zeros((height, width, ctot), jnp.float32) + dv0
    mbuf0 = jnp.zeros((height, width), bool) | (dv0 > 0.0)
    (zbuf, abuf, mbuf), _ = jax.lax.scan(chunk_step, (zbuf0, abuf0, mbuf0),
                                         (tc, ta, tv))

    # unpack attributes
    out = {}
    off = 0
    for k in names:
        d = attr_dims[k]
        out[k] = abuf[..., off:off + d]
        off += d
    return GBuffer(depth=zbuf, albedo=out["albedo"], normal=out["normal"],
                   position=out["position"], material=out["material"],
                   emission=out["emission"], mask=mbuf,
                   uvt=out.get("uvt"))
