"""Forward/transparent pass as weighted-blended OIT.

Equivalent of the reference's forward render path for transparent bundles
(fyrox-impl/src/renderer/mod.rs:1066-1115, RenderPath::Forward). The GL
renderer sorts transparent geometry back-to-front and alpha-blends; a
data-parallel rasterizer wants no sort, so this uses McGuire-Bavoil
weighted-blended order-independent transparency: every transparent
fragment accumulates premultiplied color with a depth-falloff weight and a
multiplicative revealage, then one composite resolves against the opaque
image. Exact for a single layer, perceptually correct for a few.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["composite_transparent"]


def _lit_color(albedo, normal, position, lights, cam_pos, ambient):
    """Reduced forward shading (Lambert + distance/spot attenuation) for
    transparent surfaces — full GGX runs in the deferred pass only."""
    from fyrox_tpu.render import lighting as lm
    col = albedo * jnp.asarray(ambient)
    if lights is None:
        return albedo
    nl_cnt = lights.position.shape[0]
    for li in range(nl_cnt):
        kind = int(lights.kind[li])
        lcol = lights.color[li] * lights.intensity[li]
        if kind == lm.DIRECTIONAL:
            ldir = -lights.direction[li]
            att = 1.0
        else:
            to_l = lights.position[li] - position
            dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
            ldir = to_l / jnp.maximum(dist, 1e-6)
            att = jnp.clip(1.0 - (dist[..., 0]
                                  / jnp.maximum(lights.radius[li], 1e-6)) ** 2,
                           0.0, 1.0) ** 2
            if kind == lm.SPOT:
                cd = jnp.sum(-ldir * lights.direction[li], -1)
                att = att * jnp.clip(
                    (cd - lights.cos_falloff[li])
                    / jnp.maximum(lights.cos_hotspot[li]
                                  - lights.cos_falloff[li], 1e-6), 0.0, 1.0)
        ndl = jnp.clip(jnp.sum(normal * ldir, -1), 0.0, 1.0)
        en = lights.enabled[li].astype(jnp.float32)
        col = col + albedo * lcol * (ndl * att * en)[..., None] / np.pi
    return col


def composite_transparent(opaque_color, opaque_depth, opaque_mask,
                          tri_clip, tri_attrs: Dict[str, jnp.ndarray],
                          tri_alpha, height, width,
                          lights=None, cam_pos=None,
                          ambient=(0.03, 0.03, 0.03), tri_valid=None,
                          chunk=64):
    """Rasterize transparent triangles over the shaded opaque image.

    tri_clip [Tt,3,4]; tri_attrs: 'albedo'/'normal'/'position' [Tt,3,3];
    tri_alpha [Tt]; opaque_depth = NDC z of the opaque G-buffer (1.0 where
    no geometry). Returns the composited [H,W,3] color.
    """
    t_total = tri_clip.shape[0]
    if t_total == 0:
        return opaque_color
    if tri_valid is None:
        tri_valid = jnp.ones(t_total, bool)
    pad = (-t_total) % chunk
    if pad:
        tri_clip = jnp.pad(tri_clip, ((0, pad), (0, 0), (0, 0)))
        tri_attrs = {k: jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
                     for k, v in tri_attrs.items()}
        tri_alpha = jnp.pad(tri_alpha, (0, pad))
        tri_valid = jnp.pad(tri_valid, (0, pad))
    n_chunks = tri_clip.shape[0] // chunk

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))

    names = ("albedo", "normal", "position")
    packed = jnp.concatenate([tri_attrs[k] for k in names], -1)  # [T,3,9]

    def chunk_step(carry, inp):
        accum, reveal = carry
        clip, attrs, alpha, valid = inp
        w_clip = clip[..., 3]
        behind = w_clip <= 1e-6
        safe_w = jnp.where(behind, 1.0, w_clip)
        ndc = clip[..., :3] / safe_w[..., None]
        sx = (ndc[..., 0] * 0.5 + 0.5) * width
        sy = (0.5 - ndc[..., 1] * 0.5) * height
        sz = ndc[..., 2]
        x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
        y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        # transparent surfaces render both windings (no backface cull on
        # the forward path — a glass pane is visible from both sides)
        ok = valid & (jnp.abs(area) > 1e-9) & ~jnp.any(behind, axis=-1)
        inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-9, 1.0, area)

        def edge(xa, ya, xb, yb):
            return ((px[None] - xa[:, None, None]) * (yb - ya)[:, None, None]
                    - (py[None] - ya[:, None, None]) * (xb - xa)[:, None, None])

        e0 = edge(x1, y1, x2, y2)
        e1 = edge(x2, y2, x0, y0)
        e2 = edge(x0, y0, x1, y1)
        b0 = e0 * inv_area[:, None, None]
        b1 = e1 * inv_area[:, None, None]
        b2 = 1.0 - b0 - b1
        # tiny negative tolerance keeps shared mesh edges watertight
        # (the diagonal of a quad otherwise opens a pinhole line; the
        # double-blend exactly on the seam is the usual OIT tradeoff)
        thr = -1e-5
        inside = ((b0 >= thr) & (b1 >= thr) & (b2 >= thr)
                  & ok[:, None, None])                       # [C,H,W]
        z = (b0 * sz[:, 0, None, None] + b1 * sz[:, 1, None, None]
             + b2 * sz[:, 2, None, None])
        # depth-test against opaque, no write
        vis = inside & ((z < opaque_depth[None]) | ~opaque_mask[None])
        # perspective-correct attribute interpolation
        iw = 1.0 / safe_w
        bw0 = b0 * iw[:, 0, None, None]
        bw1 = b1 * iw[:, 1, None, None]
        bw2 = b2 * iw[:, 2, None, None]
        bws = jnp.maximum(bw0 + bw1 + bw2, 1e-12)
        at = (bw0[..., None] * attrs[:, None, None, 0]
              + bw1[..., None] * attrs[:, None, None, 1]
              + bw2[..., None] * attrs[:, None, None, 2]) / bws[..., None]
        albedo, normal, position = at[..., :3], at[..., 3:6], at[..., 6:9]
        nrm = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
        rgb = _lit_color(albedo, nrm, position, lights, cam_pos, ambient)
        a = alpha[:, None, None] * vis.astype(jnp.float32)   # [C,H,W]
        # McGuire-Bavoil weight: nearer fragments (smaller NDC z) weigh more
        wgt = a * jnp.clip(1.0 - z * 0.5 - 0.5, 0.05, 1.0) * 8.0
        accum = (accum[0] + jnp.sum(wgt[..., None] * rgb * a[..., None], 0),
                 accum[1] + jnp.sum(wgt, 0))
        reveal = reveal * jnp.prod(1.0 - a, 0)
        return (accum, reveal), None

    accum0 = (jnp.zeros((height, width, 3)), jnp.zeros((height, width)))
    reveal0 = jnp.ones((height, width))
    tc = tri_clip.reshape(n_chunks, chunk, 3, 4)
    ta = packed.reshape(n_chunks, chunk, 3, packed.shape[-1])
    tal = tri_alpha.reshape(n_chunks, chunk)
    tv = tri_valid.reshape(n_chunks, chunk)
    (accum, reveal), _ = jax.lax.scan(chunk_step, (accum0, reveal0),
                                      (tc, ta, tal, tv))
    acc_rgb, acc_w = accum
    avg = acc_rgb / jnp.maximum(acc_w, 1e-6)[..., None]
    return opaque_color * reveal[..., None] + avg * (1.0 - reveal[..., None])
