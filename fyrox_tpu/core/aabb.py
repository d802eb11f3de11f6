"""Batched axis-aligned bounding boxes.

Equivalent of fyrox-math/src/aabb.rs, re-designed as SoA (min, max) array
pairs with broadcasting over leading batch dims. Degenerate/"invalid" boxes
follow the reference convention min=+inf, max=-inf so that `add_point`-style
unions behave correctly.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "invalid", "unit", "from_points", "center", "half_extents", "volume",
    "union", "contains_point", "intersects_aabb", "intersects_sphere",
    "transform", "corners",
]


def invalid(shape=(), dtype=jnp.float32):
    mins = jnp.full(tuple(shape) + (3,), jnp.inf, dtype)
    maxs = jnp.full(tuple(shape) + (3,), -jnp.inf, dtype)
    return mins, maxs


def unit(dtype=jnp.float32):
    return (jnp.full((3,), -0.5, dtype), jnp.full((3,), 0.5, dtype))


def from_points(points, axis=-2):
    """AABB of a point cloud along `axis`."""
    return jnp.min(points, axis=axis), jnp.max(points, axis=axis)


def center(mins, maxs):
    return 0.5 * (mins + maxs)


def half_extents(mins, maxs):
    return 0.5 * (maxs - mins)


def volume(mins, maxs):
    d = jnp.maximum(maxs - mins, 0.0)
    return d[..., 0] * d[..., 1] * d[..., 2]


def union(a_min, a_max, b_min, b_max):
    return jnp.minimum(a_min, b_min), jnp.maximum(a_max, b_max)


def contains_point(mins, maxs, p):
    return jnp.all((p >= mins) & (p <= maxs), axis=-1)


def intersects_aabb(a_min, a_max, b_min, b_max):
    """Overlap test (inclusive), matching aabb.rs `intersect_aabb`."""
    return jnp.all((a_min <= b_max) & (a_max >= b_min), axis=-1)


def intersects_sphere(mins, maxs, centers, radii):
    """Sphere-AABB test via closest point distance."""
    closest = jnp.clip(centers, mins, maxs)
    d2 = jnp.sum((closest - centers) ** 2, axis=-1)
    return d2 <= radii * radii


def corners(mins, maxs):
    """The 8 corner points, shape [..., 8, 3]."""
    # Select min/max per axis by a static bit pattern.
    sel = jnp.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
         [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], dtype=mins.dtype)
    mins_e = mins[..., None, :]
    maxs_e = maxs[..., None, :]
    return mins_e + sel * (maxs_e - mins_e)


def transform(mins, maxs, m):
    """Transform an AABB by an affine matrix, returning the AABB of the image.

    Uses the center/abs-extent method (equivalent to transforming all 8
    corners, as the reference's `transform` does).
    """
    c = center(mins, maxs)
    e = half_extents(mins, maxs)
    lin = m[..., :3, :3]
    new_c = jnp.einsum("...ij,...j->...i", lin, c, precision="highest") + m[..., :3, 3]
    new_e = jnp.einsum("...ij,...j->...i", jnp.abs(lin), e, precision="highest")
    return new_c - new_e, new_c + new_e
