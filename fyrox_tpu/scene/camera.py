"""Batched cameras: view/projection matrices and frustums.

Equivalent of fyrox-impl/src/scene/camera.rs. Conventions copied from the
reference:
  * view = look_at_rh(pos, pos + look, up) (camera.rs:459) where look/up are
    the +Z/+Y basis columns of the node's global transform (base.rs:787-801)
  * perspective = nalgebra new_perspective(aspect, fov, znear, zfar)
    (camera.rs:89-105; RH, -1..1 NDC, fov vertical, default 75°/0.025/2048)
  * ortho = new_orthographic(-vs*aspect, vs*aspect, -vs, vs, zn, zf)
"""
from __future__ import annotations

import jax.numpy as jnp

from fyrox_tpu.core import frustum as frustum_mod

__all__ = ["perspective", "orthographic", "look_at_rh", "view_matrix",
           "view_projection", "camera_frustums"]


def perspective(fov_y, aspect, z_near, z_far):
    """Row-major RH perspective with [-1,1] depth (nalgebra convention).
    Broadcasts over leading dims of the scalar args."""
    fov_y, aspect = jnp.asarray(fov_y), jnp.asarray(aspect)
    z_near, z_far = jnp.asarray(z_near), jnp.asarray(z_far)
    shape = jnp.broadcast_shapes(fov_y.shape, aspect.shape, z_near.shape, z_far.shape)
    f = 1.0 / jnp.tan(0.5 * fov_y)
    m = jnp.zeros(shape + (4, 4), jnp.result_type(fov_y, jnp.float32))
    m = m.at[..., 0, 0].set(f / aspect)
    m = m.at[..., 1, 1].set(f)
    m = m.at[..., 2, 2].set((z_far + z_near) / (z_near - z_far))
    m = m.at[..., 2, 3].set(2.0 * z_far * z_near / (z_near - z_far))
    m = m.at[..., 3, 2].set(-1.0)
    return m


def orthographic(vertical_size, aspect, z_near, z_far):
    """RH orthographic, symmetric about the view axis (camera.rs:139-170)."""
    vertical_size, aspect = jnp.asarray(vertical_size), jnp.asarray(aspect)
    z_near, z_far = jnp.asarray(z_near), jnp.asarray(z_far)
    shape = jnp.broadcast_shapes(vertical_size.shape, aspect.shape,
                                 z_near.shape, z_far.shape)
    right = vertical_size * aspect
    top = vertical_size
    m = jnp.zeros(shape + (4, 4), jnp.result_type(vertical_size, jnp.float32))
    m = m.at[..., 0, 0].set(1.0 / right)
    m = m.at[..., 1, 1].set(1.0 / top)
    m = m.at[..., 2, 2].set(-2.0 / (z_far - z_near))
    m = m.at[..., 2, 3].set(-(z_far + z_near) / (z_far - z_near))
    m = m.at[..., 3, 3].set(1.0)
    return m


def look_at_rh(eye, target, up):
    """Row-major RH look-at view matrix (nalgebra look_at_rh)."""
    f = target - eye
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    s = jnp.cross(f, up)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-12)
    u = jnp.cross(s, f)
    shape = f.shape[:-1]
    m = jnp.zeros(shape + (4, 4), f.dtype)
    m = m.at[..., 0, :3].set(s)
    m = m.at[..., 1, :3].set(u)
    m = m.at[..., 2, :3].set(-f)
    m = m.at[..., 0, 3].set(-jnp.sum(s * eye, axis=-1))
    m = m.at[..., 1, 3].set(-jnp.sum(u * eye, axis=-1))
    m = m.at[..., 2, 3].set(jnp.sum(f * eye, axis=-1))
    m = m.at[..., 3, 3].set(1.0)
    return m


def view_matrix(global_transform):
    """View matrix of a camera node from its global transform, replicating
    Camera::calculate_matrices (camera.rs:454-460): look along the +Z basis
    column, up = +Y basis column."""
    pos = global_transform[..., :3, 3]
    look = global_transform[..., :3, 2]
    up = global_transform[..., :3, 1]
    return look_at_rh(pos, pos + look, up)


def view_projection(global_transform, fov_y, aspect, z_near, z_far,
                    ortho=False, vertical_size=None):
    view = view_matrix(global_transform)
    if ortho:
        proj = orthographic(vertical_size, aspect, z_near, z_far)
    else:
        proj = perspective(fov_y, aspect, z_near, z_far)
    return jnp.einsum("...ij,...jk->...ik", proj, view, precision="highest")


def camera_frustums(vp):
    """Frustum planes for a batch of view-projection matrices."""
    return frustum_mod.from_view_projection(vp)
