"""Batched ray intersection tests.

Equivalent of fyrox-math/src/ray.rs (882 LoC of scalar tests) re-designed as
vectorized kernels. A ray is (origin [...,3], direction [...,3]); like the
reference, the direction is NOT assumed normalized and intersections report
the parameter t along the (unnormalized) direction, valid for t in [0, 1]
range semantics where the reference uses origin→end rays, or t >= 0 for
infinite rays (we report raw t and a hit mask; callers clamp as needed).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["aabb", "sphere", "triangle", "plane"]

_BIG = 3.0e38


def aabb(origin, direction, mins, maxs, eps=1e-30):
    """Slab test. Returns (hit, t_near, t_far); t_near may be negative when
    the origin is inside the box."""
    inv = 1.0 / jnp.where(jnp.abs(direction) < eps,
                          jnp.where(direction >= 0, eps, -eps), direction)
    t0 = (mins - origin) * inv
    t1 = (maxs - origin) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return hit, tmin, tmax


def sphere(origin, direction, center, radius):
    """Returns (hit, t) with t the nearest non-negative intersection."""
    oc = origin - center
    a = jnp.sum(direction * direction, axis=-1)
    b = 2.0 * jnp.sum(oc * direction, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = jnp.maximum(2.0 * a, 1e-30)
    t0 = (-b - sq) / denom
    t1 = (-b + sq) / denom
    t = jnp.where(t0 >= 0.0, t0, t1)
    hit = (disc >= 0.0) & (t >= 0.0)
    return hit, jnp.where(hit, t, _BIG)


def plane(origin, direction, normal, d):
    """Ray vs plane n·x + d = 0. Returns (hit, t)."""
    denom = jnp.sum(normal * direction, axis=-1)
    t = -(jnp.sum(normal * origin, axis=-1) + d) / jnp.where(
        jnp.abs(denom) < 1e-30, 1e-30, denom)
    hit = (jnp.abs(denom) >= 1e-30) & (t >= 0.0)
    return hit, jnp.where(hit, t, _BIG)


def triangle(origin, direction, v0, v1, v2, eps=1e-9):
    """Möller–Trumbore. Returns (hit, t, u, v) with barycentrics (u, v).

    Double-sided, matching the reference's triangle_intersection
    (ray.rs uses a plane + point-in-triangle test, same hit set).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    tv = origin - v0
    u = jnp.sum(tv * p, axis=-1) * inv_det
    q = jnp.cross(tv, e1)
    v = jnp.sum(direction * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    hit = (jnp.abs(det) >= eps) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return hit, jnp.where(hit, t, _BIG), u, v
