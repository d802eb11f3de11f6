"""Batched view frustums.

Equivalent of fyrox-math/src/frustum.rs. A frustum is a [..., 6, 4] array of
normalized planes (a, b, c, d) with the reference's plane order
(frustum.rs:27: 0 left, 1 right, 2 top, 3 bottom, 4 far, 5 near), extracted
from a row-major view-projection matrix via Gribb–Hartmann
(frustum.rs:54-69; nalgebra's m[i] linear index is column-major, so e.g. the
"left" plane (m[3]+m[0], m[7]+m[4], ...) is row3 + row0 of the row-major
matrix).

The AABB test is the p-vertex test, mathematically equivalent to the
reference's point-cloud corner test (frustum.rs:222).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["from_view_projection", "intersects_aabb", "intersects_sphere",
           "contains_point"]

LEFT, RIGHT, TOP, BOTTOM, FAR, NEAR = 0, 1, 2, 3, 4, 5


def _normalize_planes(planes, eps=1e-12):
    n = jnp.linalg.norm(planes[..., :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, eps)


def from_view_projection(vp):
    """Extract 6 planes from a row-major view-projection matrix [..., 4, 4].

    Returns [..., 6, 4] normalized planes; a point p is inside when
    dot(plane.abc, p) + plane.d >= 0 for all planes.
    """
    r0, r1, r2, r3 = vp[..., 0, :], vp[..., 1, :], vp[..., 2, :], vp[..., 3, :]
    planes = jnp.stack(
        [r3 + r0,   # left
         r3 - r0,   # right
         r3 - r1,   # top
         r3 + r1,   # bottom
         r3 - r2,   # far
         r3 + r2],  # near
        axis=-2,
    )
    return _normalize_planes(planes)


def contains_point(planes, p):
    """planes [...,6,4], p [...,3] → bool[...]"""
    d = jnp.einsum("...pi,...i->...p", planes[..., :3], p, precision="highest") + planes[..., 3]
    return jnp.all(d >= 0.0, axis=-1)


def intersects_sphere(planes, centers, radii):
    """Sphere test: inside/intersecting when no plane has the whole sphere behind."""
    d = jnp.einsum("...pi,...i->...p", planes[..., :3], centers, precision="highest") + planes[..., 3]
    return jnp.all(d >= -radii[..., None], axis=-1)


def intersects_aabb(planes, mins, maxs):
    """p-vertex frustum-AABB test.

    For each plane pick the box corner most along the plane normal; the box
    is fully behind the plane iff that corner is behind. Equivalent to the
    reference's "all 8 corners behind some plane" rejection (frustum.rs:222).
    Broadcasts: planes [..., 6, 4] against boxes [..., 3].
    """
    n = planes[..., :3]  # [...,6,3]
    pvert = jnp.where(n >= 0.0, maxs[..., None, :], mins[..., None, :])
    d = jnp.sum(n * pvert, axis=-1) + planes[..., 3]
    return jnp.all(d >= 0.0, axis=-1)
