"""Collider shapes: parameters, AABBs, mass properties.

Equivalent of the reference's `ColliderShape` enum (fyrox-impl/src/scene/
collider.rs:511: Ball/Cylinder/Cone/Cuboid/Capsule/Segment/Triangle/Trimesh/
Heightfield/ConvexPolyhedron) whose geometry lives in the external parry
crate. Here shapes are a tag + a fixed-width parameter vector so whole
collider sets evaluate vectorized.

Param layout (params[..., 6], unused slots zero):
  BALL:      [radius]
  CUBOID:    [hx, hy, hz]
  CAPSULE:   [half_height, radius]      axis = local +Y (parry convention)
  CYLINDER:  [half_height, radius]      axis = local +Y
  CONE:      [half_height, radius]      axis = local +Y, apex up
  HALFSPACE: []                         plane normal = local +Y through origin
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["BALL", "CUBOID", "CAPSULE", "CYLINDER", "CONE", "HALFSPACE",
           "CONVEX", "HEIGHTFIELD", "TRIMESH", "SEGMENT", "TRIANGLE",
           "NUM_KINDS", "shape_aabb_half_extents", "mass_properties"]

BALL, CUBOID, CAPSULE, CYLINDER, CONE, HALFSPACE = 0, 1, 2, 3, 4, 5
# extended shapes (collider.rs:511 parity). CONVEX params: [radius_bound];
# geometry lives in PhysicsTemplate.shape_data (padded hull arrays).
# HEIGHTFIELD params: [cell_x, cell_z, radius_bound]; heights in shape_data.
# TRIMESH params: [radius_bound]; triangles in shape_data.
CONVEX, HEIGHTFIELD, TRIMESH = 6, 7, 8
NUM_KINDS = 9
# builder-level shapes that LOWER at add_collider time (they never appear
# in a built template, so NUM_KINDS excludes them — collider.rs:511
# Segment/Triangle rows): SEGMENT → zero-radius capsule between two local
# endpoints; TRIANGLE → single-cell trimesh (static-only, like trimesh).
SEGMENT, TRIANGLE = 9, 10

_HUGE = 1.0e9


def shape_aabb_half_extents(shape_type, params, rot_mat):
    """Conservative world-axis half-extents of a shape rotated by rot_mat
    [..., 3, 3]. Uses the abs-matrix trick for boxes and exact radii for
    round shapes. HALFSPACE gets a huge box (it is culled from broadphase
    by pairing rules, not by AABB)."""
    r = params[..., 0]
    hh = params[..., 0]
    rad = params[..., 1]
    absm = jnp.abs(rot_mat)

    ball = jnp.stack([r, r, r], axis=-1)
    box = jnp.sum(absm * params[..., None, :3], -1)
    # capsule/cylinder/cone: box of [rad, hh(+rad), rad] rotated
    cap_local = jnp.stack([rad, hh + rad, rad], axis=-1)
    cyl_local = jnp.stack([rad, hh, rad], axis=-1)
    cap = jnp.sum(absm * cap_local[..., None, :], -1)
    cyl = jnp.sum(absm * cyl_local[..., None, :], -1)
    huge = jnp.full(ball.shape, _HUGE, ball.dtype)

    # rotation-invariant sphere bounds for the data-backed shapes
    conv = jnp.stack([r, r, r], axis=-1)                       # params[0]
    hf_b = jnp.stack([params[..., 2]] * 3, axis=-1)
    tm_b = conv

    st = shape_type[..., None]
    out = jnp.where(st == BALL, ball,
          jnp.where(st == CUBOID, box,
          jnp.where(st == CAPSULE, cap,
          jnp.where((st == CYLINDER) | (st == CONE), cyl,
          jnp.where(st == CONVEX, conv,
          jnp.where(st == HEIGHTFIELD, hf_b,
          jnp.where(st == TRIMESH, tm_b, huge)))))))
    return out


def mass_properties(shape_type: int, params: np.ndarray, density: float):
    """Host-side (build time) mass + local inertia tensor of one shape.

    Formulas match parry's MassProperties for the solid primitives, so body
    masses line up with the reference's rapier bodies.
    Returns (mass, inertia_local [3,3]).
    """
    p = np.asarray(params, np.float64)
    if shape_type == BALL:
        r = p[0]
        m = density * 4.0 / 3.0 * np.pi * r ** 3
        i = 0.4 * m * r * r
        return m, np.diag([i, i, i])
    if shape_type == CUBOID:
        hx, hy, hz = p[:3]
        m = density * 8.0 * hx * hy * hz
        ix = m / 3.0 * (hy * hy + hz * hz)
        iy = m / 3.0 * (hx * hx + hz * hz)
        iz = m / 3.0 * (hx * hx + hy * hy)
        return m, np.diag([ix, iy, iz])
    if shape_type == CAPSULE:
        hh, r = p[0], p[1]
        h = 2.0 * hh
        m_cyl = density * np.pi * r * r * h
        m_sph = density * 4.0 / 3.0 * np.pi * r ** 3
        m = m_cyl + m_sph
        # cylinder part (axis = y)
        i_cyl_y = 0.5 * m_cyl * r * r
        i_cyl_x = m_cyl * (3.0 * r * r + h * h) / 12.0
        # two hemispheres = one sphere displaced to the ends
        i_sph = 0.4 * m_sph * r * r
        d = hh + 3.0 * r / 8.0
        i_sph_x = i_sph + m_sph * d * d  # parallel axis for the pair
        ix = i_cyl_x + i_sph_x
        iy = i_cyl_y + i_sph
        return m, np.diag([ix, iy, ix])
    if shape_type == CYLINDER:
        hh, r = p[0], p[1]
        h = 2.0 * hh
        m = density * np.pi * r * r * h
        iy = 0.5 * m * r * r
        ix = m * (3.0 * r * r + h * h) / 12.0
        return m, np.diag([ix, iy, ix])
    if shape_type == CONE:
        hh, r = p[0], p[1]
        h = 2.0 * hh
        m = density * np.pi * r * r * h / 3.0
        iy = 0.3 * m * r * r
        ix = m * (3.0 / 20.0 * r * r + 3.0 / 80.0 * h * h) + m * (h / 4.0) ** 2
        return m, np.diag([ix, iy, ix])
    if shape_type == HALFSPACE:
        return 0.0, np.zeros((3, 3))
    if shape_type in (HEIGHTFIELD, TRIMESH):
        # static-only scenery shapes carry no mass
        return 0.0, np.zeros((3, 3))
    if shape_type == CONVEX:
        # computed from hull geometry by the builder (convex.hull_mass);
        # params alone cannot describe it
        return 0.0, np.zeros((3, 3))
    raise ValueError(f"unsupported shape type {shape_type}")
