"""Batched node transforms.

Implements the reference engine's full local-transform model
(fyrox-impl/src/scene/transform.rs:421 `calculate_local_transform`):

    Transform = T * Roff * Rp * Rpre * R * Rpost⁻¹ * Rp⁻¹ * Soff * Sp * S * Sp⁻¹

where T is translation, Roff/Rp rotation offset/pivot, Rpre/R/Rpost the
pre/local/post rotations (note the reference stores the *inverse* of the post
rotation matrix, transform.rs:160), Soff/Sp scaling offset/pivot, S scale.

Rather than composing ten 4x4 matrices we use the closed form:

    linear      = Rtot @ diag(s)              with Rtot = Rpre @ R @ Rpost⁻¹
    translation = Rtot @ (soff + sp - s*sp - rp) + t + roff + rp

All functions broadcast over leading batch dims. A transform is an SoA dict
of arrays; most scenes only use position/rotation/scale, so `compose` has a
fast path when the pivot/offset arrays are None.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from fyrox_tpu.core import quat

__all__ = ["Transform", "local_matrix", "compose_trs", "mat4_mul", "mat4_identity",
           "make_translation", "make_scale", "decompose_mat4", "transform_point",
           "transform_vector", "invert_affine"]


class Transform(NamedTuple):
    """SoA batched transform. Leading dims arbitrary; trailing dim 3 or 4 (quat).

    Mirrors the field set of the reference Transform (scene/transform.rs:90-119).
    Pivot/offset fields may be None meaning all-zeros (fast path).
    """
    position: jnp.ndarray            # [..., 3]
    rotation: jnp.ndarray            # [..., 4] unit quat xyzw
    scale: jnp.ndarray               # [..., 3]
    pre_rotation: Optional[jnp.ndarray] = None     # [..., 4]
    post_rotation: Optional[jnp.ndarray] = None    # [..., 4]
    rotation_offset: Optional[jnp.ndarray] = None  # [..., 3]
    rotation_pivot: Optional[jnp.ndarray] = None   # [..., 3]
    scaling_offset: Optional[jnp.ndarray] = None   # [..., 3]
    scaling_pivot: Optional[jnp.ndarray] = None    # [..., 3]

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Transform":
        shape = tuple(shape)
        return Transform(
            position=jnp.zeros(shape + (3,), dtype),
            rotation=quat.identity(shape, dtype),
            scale=jnp.ones(shape + (3,), dtype),
        )


def mat4_identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(shape) + (4, 4))


def mat4_mul(a, b):
    """Batched 4x4 matrix product a @ b."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], -2)


def make_translation(t):
    m = mat4_identity(t.shape[:-1], t.dtype)
    return m.at[..., :3, 3].set(t)


def make_scale(s):
    m = mat4_identity(s.shape[:-1], s.dtype)
    return m.at[..., 0, 0].set(s[..., 0]).at[..., 1, 1].set(s[..., 1]).at[..., 2, 2].set(s[..., 2])


def _assemble(linear, translation):
    """[...,3,3] + [...,3] → [...,4,4] affine matrix."""
    batch = linear.shape[:-2]
    m = jnp.zeros(batch + (4, 4), linear.dtype)
    m = m.at[..., :3, :3].set(linear)
    m = m.at[..., :3, 3].set(translation)
    m = m.at[..., 3, 3].set(1.0)
    return m


def compose_trs(position, rotation, scale):
    """Fast path: plain T*R*S local matrix (no pivots/offsets)."""
    r = quat.to_mat3(rotation)
    linear = r * scale[..., None, :]  # column scaling == R @ diag(s)
    return _assemble(linear, position)


def local_matrix(t: Transform):
    """Local matrix per the reference formula (transform.rs:421-453)."""
    if (t.pre_rotation is None and t.post_rotation is None
            and t.rotation_offset is None and t.rotation_pivot is None
            and t.scaling_offset is None and t.scaling_pivot is None):
        return compose_trs(t.position, t.rotation, t.scale)

    shape = t.position.shape
    zeros = jnp.zeros(shape, t.position.dtype)

    def _v(x):
        return zeros if x is None else x

    rot = quat.to_mat3(t.rotation)
    if t.pre_rotation is not None:
        pre = quat.to_mat3(t.pre_rotation)
        rot = jnp.sum(pre[..., :, :, None] * rot[..., None, :, :], -2)
    if t.post_rotation is not None:
        # reference stores inverse(post_rotation) (transform.rs:160-163)
        post_inv = jnp.swapaxes(quat.to_mat3(t.post_rotation), -1, -2)
        rot = jnp.sum(rot[..., :, :, None] * post_inv[..., None, :, :], -2)

    rp = _v(t.rotation_pivot)
    roff = _v(t.rotation_offset)
    sp = _v(t.scaling_pivot)
    soff = _v(t.scaling_offset)
    s = t.scale

    linear = rot * s[..., None, :]
    inner = soff + sp - s * sp - rp
    translation = jnp.sum(rot * inner[..., None, :], -1) + t.position + roff + rp
    return _assemble(linear, translation)


def transform_point(m, p):
    """Apply affine [...,4,4] to points [...,3]."""
    return jnp.sum(m[..., :3, :3] * p[..., None, :], -1) + m[..., :3, 3]


def transform_vector(m, v):
    """Apply linear part of affine matrix to vectors (no translation)."""
    return jnp.sum(m[..., :3, :3] * v[..., None, :], -1)


def invert_affine(m):
    """Inverse of an affine transform (rotation*scale + translation)."""
    lin = m[..., :3, :3]
    inv_lin = jnp.linalg.inv(lin)
    inv_t = -jnp.sum(inv_lin * m[..., :3, 3][..., None, :], -1)
    return _assemble(inv_lin, inv_t)


def decompose_mat4(m):
    """Decompose affine matrix into (position, rotation quat, scale).

    Mirrors how the reference decomposes rapier isometries back into node
    local transforms (physics/mod.rs:1447-1475). Assumes no shear and
    positive scale.
    """
    position = m[..., :3, 3]
    lin = m[..., :3, :3]
    scale = jnp.linalg.norm(lin, axis=-2)  # column norms
    r = lin / jnp.maximum(scale[..., None, :], 1e-12)
    rotation = quat.from_mat3(r)
    return position, rotation, scale
