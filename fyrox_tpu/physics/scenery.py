"""Heightfield + trimesh colliders (static scenery shapes).

Completes the reference's ColliderShape set (fyrox-impl/src/scene/
collider.rs:511: Heightfield, Trimesh; parry conversion at
scene/graph/physics/mod.rs:768-816). Both are static-only (like most
rapier scenes) and collide against dynamic shapes through a unified
point-sample formulation:

    sample set per dynamic shape: ball → center+radius, capsule → both
    segment ends+radius, cuboid → 8 corners, convex → hull vertices;
    each sample gets (depth, normal, point) against the scenery surface
    and the deepest `npts` samples form the manifold.

Heightfield: heights [Rz,Rx] over a CENTERED local rectangle
(x ∈ [-sx/2, sx/2], z ∈ [-sz/2, sz/2]); contact via the bilinear tangent
plane under each sample (exact for resting contact on smooth fields —
same scheme as scene/terrain.py, generalized to all shapes and arbitrary
collider pose). Trimesh: padded triangle soup in local space; per-sample
closest-triangle distance with face-normal sign.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["MAX_TRIS", "hf_sample", "points_heightfield", "points_trimesh",
           "sample_points_for"]

MAX_TRIS = 256


# --------------------------------------------------------------------------
# sample-point generation per dynamic shape kind (world space)
# --------------------------------------------------------------------------

def sample_points_for(kind, params, pos, rot, hull=None, n_samples=8):
    """(samples [*,S,3], radius [*]) for the canonical A-side shape.
    kind is a STATIC python int; hull = (verts, vmask) for CONVEX."""
    from fyrox_tpu.physics import shapes as sh
    if kind == sh.BALL:
        return pos[..., None, :], params[..., 0]
    if kind == sh.CAPSULE:
        axis = rot[..., :, 1]
        hh = params[..., 0:1]
        a = pos - axis * hh
        b = pos + axis * hh
        return jnp.stack([a, b], axis=-2), params[..., 1]
    if kind == sh.CUBOID:
        sel = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                           for sz in (-1, 1)], pos.dtype)       # [8,3]
        local = sel * params[..., None, :3]
        world = pos[..., None, :] + jnp.sum(
            rot[..., None, :, :] * local[..., None, :], -1)
        return world, jnp.zeros(params.shape[:-1], pos.dtype)
    if kind == sh.CONVEX:
        verts, vmask = hull
        world = pos[..., None, :] + jnp.sum(
            rot[..., None, :, :] * verts[..., None, :], -1)
        # park padding verts at the shape origin (harmless samples)
        world = jnp.where(vmask[..., None], world, pos[..., None, :])
        return world, jnp.zeros(params.shape[:-1], pos.dtype)
    raise NotImplementedError(kind)


# --------------------------------------------------------------------------
# heightfield
# --------------------------------------------------------------------------

def hf_sample(heights, size_x, size_z, x, z):
    """Bilinear height of a CENTERED local heightfield at (x, z).
    heights [...,Rz,Rx]; x/z [...] local coordinates. Clamps at borders."""
    rz = heights.shape[-2]
    rx = heights.shape[-1]
    u = (x / size_x + 0.5) * (rx - 1)
    v = (z / size_z + 0.5) * (rz - 1)
    u = jnp.clip(u, 0.0, rx - 1.0)
    v = jnp.clip(v, 0.0, rz - 1.0)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, rx - 2)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, rz - 2)
    fu = u - i0
    fv = v - j0
    # per-sample dynamic lookup over a tiny table: one-hot reductions on
    # the LAST axes (gather lowers near-scalar on TPU)
    ohx0 = (jnp.arange(rx) == i0[..., None]).astype(heights.dtype)
    ohx1 = (jnp.arange(rx) == (i0 + 1)[..., None]).astype(heights.dtype)
    ohz0 = (jnp.arange(rz) == j0[..., None]).astype(heights.dtype)
    ohz1 = (jnp.arange(rz) == (j0 + 1)[..., None]).astype(heights.dtype)
    row0 = jnp.sum(heights * ohz0[..., :, None], axis=-2)       # [...,Rx]
    row1 = jnp.sum(heights * ohz1[..., :, None], axis=-2)
    h00 = jnp.sum(row0 * ohx0, -1)
    h10 = jnp.sum(row0 * ohx1, -1)
    h01 = jnp.sum(row1 * ohx0, -1)
    h11 = jnp.sum(row1 * ohx1, -1)
    return ((h00 * (1 - fu) + h10 * fu) * (1 - fv)
            + (h01 * (1 - fu) + h11 * fu) * fv)


def points_heightfield(samples, radius, pos_h, rot_h, heights, size_x, size_z,
                       pred):
    """Per-sample tangent-plane contact against a posed heightfield.

    samples [*,S,3] world; radius [*]; heights [*,Rz,Rx] (per-pair);
    size_x/size_z [*]. Returns (normal [*,3] A→field from the DEEPEST
    sample, points [*,S,3], depth [*,S], active [*,S])."""
    rel = samples - pos_h[..., None, :]
    local = jnp.sum(rot_h[..., None, :, :] * rel[..., :, None], -2)  # R^T p
    x, y, z = local[..., 0], local[..., 1], local[..., 2]
    sx = size_x[..., None]
    sz = size_z[..., None]
    # bilinear height + the cell's ANALYTIC gradient (the slab big-partner
    # path uses the identical formulation, so the two paths agree exactly
    # — central finite differences diverge from this wherever the stencil
    # straddles a cell boundary)
    rz_, rx_ = heights.shape[-2], heights.shape[-1]
    u = jnp.clip((x / sx + 0.5) * (rx_ - 1), 0.0, rx_ - 1.0)
    v = jnp.clip((z / sz + 0.5) * (rz_ - 1), 0.0, rz_ - 1.0)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, rx_ - 2)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, rz_ - 2)
    fu = u - i0
    fv = v - j0
    flat = heights.reshape(heights.shape[:-2] + (rz_ * rx_,))
    idx = j0 * rx_ + i0
    h00 = jnp.take_along_axis(flat, idx, -1)
    h10 = jnp.take_along_axis(flat, idx + 1, -1)
    h01 = jnp.take_along_axis(flat, idx + rx_, -1)
    h11 = jnp.take_along_axis(flat, idx + rx_ + 1, -1)
    gy = ((h00 * (1 - fu) + h10 * fu) * (1 - fv)
          + (h01 * (1 - fu) + h11 * fu) * fv)
    dhdx = ((h10 - h00) * (1 - fv) + (h11 - h01) * fv) * (rx_ - 1) / sx
    dhdz = ((h01 - h00) * (1 - fu) + (h11 - h10) * fu) * (rz_ - 1) / sz
    n_l = jnp.stack([-dhdx, jnp.ones_like(gy), -dhdz], -1)
    n_l = n_l / jnp.maximum(jnp.linalg.norm(n_l, axis=-1, keepdims=True), 1e-8)
    plane_pt = jnp.stack([x, gy, z], -1)
    dist = jnp.sum((local - plane_pt) * n_l, -1)
    depth = radius[..., None] - dist
    inside = ((jnp.abs(x) <= sx * 0.5 + radius[..., None])
              & (jnp.abs(z) <= sz * 0.5 + radius[..., None]))
    contact_l = local - n_l * dist[..., None]
    # back to world
    n_w = jnp.sum(rot_h[..., None, :, :] * n_l[..., None, :], -1)
    p_w = pos_h[..., None, :] + jnp.sum(
        rot_h[..., None, :, :] * contact_l[..., None, :], -1)
    active = (depth > -pred[..., None]) & inside
    deepest = jnp.argmax(jnp.where(active, depth, -1e9), axis=-1)
    oh = (deepest[..., None] == jnp.arange(depth.shape[-1]))
    normal = -jnp.sum(jnp.where(oh[..., None], n_w, 0.0), -2)
    return normal, p_w, depth, active


# --------------------------------------------------------------------------
# trimesh
# --------------------------------------------------------------------------

def _closest_on_triangle(p, a, b, c):
    """Closest point on triangle abc to p (batched, branch-free —
    Ericson's barycentric region walk)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-12)
    v = vb / denom
    w = vc / denom
    inner = a + ab * v[..., None] + w[..., None] * ac
    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-12), 0.0, 1.0)
    p_ab = a + ab * t_ab[..., None]
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-12), 0.0, 1.0)
    p_ac = a + ac * t_ac[..., None]
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-12),
                    0.0, 1.0)
    p_bc = b + (c - b) * t_bc[..., None]
    out = inner
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], p_ab, out)
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], p_ac, out)
    out = jnp.where(((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None],
                    p_bc, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    return out


def points_trimesh(samples, radius, pos_m, rot_m, tris, tmask, pred):
    """Per-sample closest-triangle contact against a posed triangle soup.

    samples [*,S,3] world; tris [*,T,3,3] local; tmask [*,T].
    Returns (normal [*,3], points [*,S,3], depth [*,S], active [*,S])."""
    rel = samples - pos_m[..., None, :]
    local = jnp.sum(rot_m[..., None, :, :] * rel[..., :, None], -2)
    p = local[..., :, None, :]                       # [*,S,1,3]
    a = tris[..., None, :, 0, :]                     # [*,1,T,3]
    b = tris[..., None, :, 1, :]
    c = tris[..., None, :, 2, :]
    q = _closest_on_triangle(p, a, b, c)             # [*,S,T,3]
    d = jnp.linalg.norm(p - q, axis=-1)              # [*,S,T]
    # two-sided surface: a soup has no inside, so depth = r - |dist| and
    # the normal points from the surface toward the sample. Penetration
    # past the surface is prevented by the speculative-contact CCD sweep,
    # not by a signed distance (parry treats trimeshes one-sided via
    # winding; two-sided is the robust choice for arbitrary soups).
    n_tri = jnp.cross(b - a, c - a)
    n_tri = n_tri / jnp.maximum(
        jnp.linalg.norm(n_tri, axis=-1, keepdims=True), 1e-12)
    d = jnp.where(tmask[..., None, :], d, 1e9)
    best = jnp.argmin(d, axis=-1)                    # [*,S]
    oh = (best[..., None] == jnp.arange(d.shape[-1]))
    dist = jnp.sum(jnp.where(oh, d, 0.0), -1)
    q_best = jnp.sum(jnp.where(oh[..., None], q, 0.0), -2)   # [*,S,3]
    n_best = jnp.sum(jnp.where(oh[..., None], n_tri, 0.0), -2)
    dir_raw = local - q_best
    # degenerate (sample on the surface): fall back to the face normal
    # oriented toward the sample's side of the triangle plane
    side = jnp.sign(jnp.sum(dir_raw * n_best, -1))
    side = jnp.where(side == 0, 1.0, side)
    fallback = n_best * side[..., None]
    dlen = jnp.linalg.norm(dir_raw, axis=-1, keepdims=True)
    dir_l = jnp.where(dlen > 1e-6, dir_raw / jnp.maximum(dlen, 1e-9),
                      fallback)
    depth = radius[..., None] - dist
    p_w = pos_m[..., None, :] + jnp.sum(
        rot_m[..., None, :, :] * q_best[..., None, :], -1)
    n_w = jnp.sum(rot_m[..., None, :, :] * dir_l[..., None, :], -1)
    active = depth > -pred[..., None]
    deepest = jnp.argmax(jnp.where(active, depth, -1e9), axis=-1)
    ohp = (deepest[..., None] == jnp.arange(depth.shape[-1]))
    normal = -jnp.sum(jnp.where(ohp[..., None], n_w, 0.0), -2)
    return normal, p_w, depth, active
