"""2D blend spaces: triangulated parameter-space pose blending.

Equivalent of fyrox-animation/src/machine/node/blendspace.rs: a set of
points in a 2D parameter space (e.g. x = strafe speed, y = forward speed),
each point owning a pose source (here: a clip index). Sampling at (x, y)
finds the Delaunay triangle containing the point and blends the three
corner poses with barycentric weights (blendspace.rs:338 `fetch_weights`);
outside the triangulation the closest edge projection is used.

TPU split:
  * `BlendSpaceTemplate` — host numpy: points [P,2], clip per point [P],
    Delaunay triangles [T,3] (Bowyer-Watson at build time; the reference
    triangulates with the `spade` crate on every point edit,
    blendspace.rs:417).
  * `sample_weights` — batched: [W,2] sampling points → 3 corner indices +
    weights per world, computed as one vectorized barycentric test over all
    triangles (no per-triangle Python loop at runtime).

Deviation from the reference, documented: outside the hull, the reference
only accepts edge projections with t ∈ [0,1] and returns *no pose* in the
corner regions beyond a vertex (fetch_weights returns None there). Here t
is clamped to [0,1], which makes corner regions resolve to the nearest
vertex — strictly a superset of the reference's defined behavior and
identical wherever the reference produces a pose.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation import pose as pose_mod

__all__ = ["BlendSpaceTemplate", "build_blend_space", "delaunay",
           "sample_weights", "blendspace_pose"]


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation (host, build time).

    points: [P,2] float. Returns [T,3] int32 triangle corner indices.
    Degenerate inputs (collinear / <3 points) return an empty array; the
    runtime falls back to edge projection like the reference does for
    2-point spaces (blendspace.rs:349).
    """
    pts = np.asarray(points, np.float64)
    p = pts.shape[0]
    if p < 3:
        return np.zeros((0, 3), np.int32)
    # super-triangle enclosing everything
    cmin, cmax = pts.min(0), pts.max(0)
    d = max((cmax - cmin).max(), 1.0) * 20.0
    mid = (cmin + cmax) / 2
    sup = np.asarray([[mid[0] - d, mid[1] - d],
                      [mid[0] + d, mid[1] - d],
                      [mid[0], mid[1] + d]])
    verts = np.concatenate([pts, sup], 0)
    tris = [(p, p + 1, p + 2)]

    def circumcircle_contains(tri, q):
        a, b, c = verts[tri[0]], verts[tri[1]], verts[tri[2]]
        # orientation-normalized in-circumcircle determinant
        m = np.asarray([
            [a[0] - q[0], a[1] - q[1], (a[0] - q[0]) ** 2 + (a[1] - q[1]) ** 2],
            [b[0] - q[0], b[1] - q[1], (b[0] - q[0]) ** 2 + (b[1] - q[1]) ** 2],
            [c[0] - q[0], c[1] - q[1], (c[0] - q[0]) ** 2 + (c[1] - q[1]) ** 2],
        ])
        det = np.linalg.det(m)
        orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return det * np.sign(orient) > 1e-12

    for i in range(p):
        bad = [t for t in tris if circumcircle_contains(t, verts[i])]
        # polygonal hole boundary = edges not shared by two bad triangles
        edges = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (ea, eb), cnt in edges.items():
            if cnt == 1:
                tris.append((ea, eb, i))
    out = [t for t in tris if max(t) < p]
    return (np.asarray(out, np.int32) if out else np.zeros((0, 3), np.int32))


@dataclass
class BlendSpaceTemplate:
    points: np.ndarray      # [P,2] f32 parameter-space positions
    clips: np.ndarray       # [P] int32 clip per point (PlayAnimation source)
    triangles: np.ndarray   # [T,3] int32

    @property
    def num_points(self):
        return int(self.points.shape[0])


def build_blend_space(points, clips) -> BlendSpaceTemplate:
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    return BlendSpaceTemplate(points=pts,
                              clips=np.asarray(clips, np.int32),
                              triangles=delaunay(pts))


def sample_weights(bst: BlendSpaceTemplate, xy):
    """Batched fetch_weights (blendspace.rs:338): xy [W,2] → (idx [W,3] int32
    point indices, w [W,3] f32 weights, normalized)."""
    w_ = xy.shape[0]
    p = bst.num_points
    if p == 0:
        return (jnp.zeros((w_, 3), jnp.int32), jnp.zeros((w_, 3), jnp.float32))
    if p == 1:
        return (jnp.zeros((w_, 3), jnp.int32),
                jnp.broadcast_to(jnp.asarray([1.0, 0, 0], jnp.float32), (w_, 3)))
    pts = jnp.asarray(bst.points)                                   # [P,2]
    if bst.triangles.shape[0] == 0:
        # collinear / two points: project on the chain's segments, pick closest
        a = pts[:-1]                                                # [E,2]
        b = pts[1:]
        edge = b - a                                                # [E,2]
        to_pt = xy[:, None, :] - a[None]                            # [W,E,2]
        t = jnp.sum(to_pt * edge[None], -1) / jnp.maximum(
            jnp.sum(edge * edge, -1)[None], 1e-12)
        t = jnp.clip(t, 0.0, 1.0)
        proj = a[None] + t[..., None] * edge[None]
        dist = jnp.sum((xy[:, None, :] - proj) ** 2, -1)            # [W,E]
        best = jnp.argmin(dist, -1)                                 # [W]
        tb = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
        idx = jnp.stack([best, best + 1, best], -1).astype(jnp.int32)
        w = jnp.stack([1.0 - tb, tb, jnp.zeros_like(tb)], -1)
        return idx, w

    tri = jnp.asarray(bst.triangles)                                # [T,3]
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]        # [T,2]
    # barycentric coords of xy in every triangle (math::get_barycentric_coords_2d)
    v0 = b - a
    v1 = c - a
    v2 = xy[:, None, :] - a[None]                                   # [W,T,2]
    d00 = jnp.sum(v0 * v0, -1)[None]
    d01 = jnp.sum(v0 * v1, -1)[None]
    d11 = jnp.sum(v1 * v1, -1)[None]
    d20 = jnp.sum(v2 * v0[None], -1)
    d21 = jnp.sum(v2 * v1[None], -1)
    denom = jnp.maximum(jnp.abs(d00 * d11 - d01 * d01), 1e-12) * jnp.sign(
        d00 * d11 - d01 * d01 + 1e-30)
    v = (d11 * d20 - d01 * d21) / denom                             # [W,T]
    w3 = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w3
    eps = 1e-5
    inside = (u >= -eps) & (v >= -eps) & (w3 >= -eps)               # [W,T]
    any_inside = jnp.any(inside, -1)
    first = jnp.argmax(inside, -1)                                  # [W]
    tri_idx = tri[first]                                            # [W,3]
    bar = jnp.stack([jnp.take_along_axis(u, first[:, None], 1)[:, 0],
                     jnp.take_along_axis(v, first[:, None], 1)[:, 0],
                     jnp.take_along_axis(w3, first[:, None], 1)[:, 0]], -1)

    # fallback: closest edge of any triangle (blendspace.rs:381), t clamped
    ea = tri[:, [0, 1, 2]].reshape(-1)                              # [3T]
    eb = tri[:, [1, 2, 0]].reshape(-1)
    pa, pb = pts[ea], pts[eb]                                       # [3T,2]
    edge = pb - pa
    to_pt = xy[:, None, :] - pa[None]                               # [W,3T,2]
    t = jnp.sum(to_pt * edge[None], -1) / jnp.maximum(
        jnp.sum(edge * edge, -1)[None], 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = pa[None] + t[..., None] * edge[None]
    dist = jnp.sum((xy[:, None, :] - proj) ** 2, -1)                # [W,3T]
    best = jnp.argmin(dist, -1)
    tb = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
    e_idx = jnp.stack([ea[best], eb[best], ea[best]], -1)           # [W,3]
    e_w = jnp.stack([1.0 - tb, tb, jnp.zeros_like(tb)], -1)

    idx = jnp.where(any_inside[:, None], tri_idx, e_idx).astype(jnp.int32)
    w = jnp.where(any_inside[:, None], bar, e_w)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)
    return idx, w


def blendspace_pose(bst: BlendSpaceTemplate, xy, poses: pose_mod.PoseSet):
    """Evaluate the blend space at xy [W,2] against sampled clip poses:
    3-way weighted blend (eval_pose, blendspace.rs:120) via sequential
    normalized accumulation, matching AnimationPose::blend_with chains."""
    idx, w = sample_weights(bst, xy)
    clips = jnp.asarray(bst.clips)[idx]                             # [W,3]
    acc = pose_mod.select_anim_pose(poses, clips[:, 0])
    cum = w[:, 0]
    for k in range(1, 3):
        pk = pose_mod.select_anim_pose(poses, clips[:, k])
        new_cum = cum + w[:, k]
        frac = jnp.where(new_cum > 1e-8, w[:, k] / jnp.maximum(new_cum, 1e-8), 0.0)
        acc = pose_mod.blend_pose(acc, pk, frac)
        cum = new_cum
    return acc
