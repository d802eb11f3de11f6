"""Batched quaternion math.

Layout is ``(x, y, z, w)`` (vector part first, scalar last) to match the
storage order of nalgebra's ``UnitQuaternion`` used throughout the reference
engine (fyrox uses nalgebra 0.35, fyrox-core/Cargo.toml:23).

All functions broadcast over arbitrary leading batch dimensions; the last
axis is always 4 (quaternion) or 3 (vector).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "identity",
    "normalize",
    "conjugate",
    "inverse",
    "mul",
    "rotate",
    "from_axis_angle",
    "from_euler",
    "to_mat3",
    "from_mat3",
    "nlerp",
    "slerp",
    "dot",
    "face_towards",
    "angle",
]


def identity(shape=(), dtype=jnp.float32):
    """Identity quaternion, broadcast to ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(q, eps=1e-12):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def conjugate(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def inverse(q):
    """Inverse of a unit quaternion (== conjugate)."""
    return conjugate(q)


def mul(a, b):
    """Hamilton product a*b: rotation b applied first, then a.

    Matches nalgebra's `UnitQuaternion` multiplication (used for rotation
    composition in the reference's transform math).
    """
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product expansion: v + 2*w*(u×v) + 2*(u×(u×v)).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def from_axis_angle(axis, angle_rad):
    """Unit quaternion from (normalized) axis and angle (radians)."""
    angle_rad = jnp.asarray(angle_rad)
    half = 0.5 * angle_rad[..., None]
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.concatenate([axis * s, c], axis=-1)


def from_euler(roll, pitch, yaw):
    """Matches nalgebra `UnitQuaternion::from_euler_angles(roll, pitch, yaw)`:
    intrinsic rotations about X (roll), then Y (pitch), then Z (yaw);
    composed as q = Rz(yaw) * Ry(pitch) * Rx(roll).
    """
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def to_mat3(q):
    """Rotation matrix [..., 3, 3] from unit quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_mat3(m):
    """Unit quaternion from rotation matrix [..., 3, 3].

    Branch-free Shepperd's method: compute all four candidate forms and
    select the numerically best one (largest pivot) with `where`.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-20))

    sw = _safe_sqrt(1.0 + tr)            # pivot w
    qw0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), sw * sw], -1) / (
        2.0 * sw[..., None]
    )
    sx = _safe_sqrt(1.0 + m00 - m11 - m22)  # pivot x
    qx0 = jnp.stack([sx * sx, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (
        2.0 * sx[..., None]
    )
    sy = _safe_sqrt(1.0 - m00 + m11 - m22)  # pivot y
    qy0 = jnp.stack([(m01 + m10), sy * sy, (m12 + m21), (m02 - m20)], -1) / (
        2.0 * sy[..., None]
    )
    sz = _safe_sqrt(1.0 - m00 - m11 + m22)  # pivot z
    qz0 = jnp.stack([(m02 + m20), (m12 + m21), sz * sz, (m10 - m01)], -1) / (
        2.0 * sz[..., None]
    )

    cond_w = (tr > 0.0)[..., None]
    cond_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_y = (m11 >= m22)[..., None]
    q = jnp.where(cond_w, qw0, jnp.where(cond_x, qx0, jnp.where(cond_y, qy0, qz0)))
    return normalize(q)


def nlerp(a, b, t):
    """Normalized lerp with shortest-path sign fix.

    This is the quaternion blend used by the reference's animation pose
    blending (fyrox-animation/src/value.rs `blend_with` uses nlerp).
    """
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(a) - 1 else jnp.asarray(t)
    sign = jnp.where(dot(a, b) < 0.0, -1.0, 1.0)[..., None]
    return normalize(a + (sign * b - a) * t)


def slerp(a, b, t, eps=1e-6):
    """Spherical lerp with shortest-path handling; falls back to nlerp for
    nearly-parallel quaternions."""
    t = jnp.asarray(t)
    if jnp.ndim(t) == jnp.ndim(a) - 1:
        t = t[..., None]
    d = dot(a, b)
    sign = jnp.where(d < 0.0, -1.0, 1.0)
    b = b * sign[..., None]
    d = jnp.clip(jnp.abs(d), -1.0, 1.0)
    theta = jnp.arccos(d)[..., None]
    sin_theta = jnp.sin(theta)
    near = sin_theta < eps
    wa = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    wb = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return normalize(wa * a + wb * b)


def angle(q):
    """Rotation angle (radians, in [0, pi]) represented by a unit quaternion."""
    return 2.0 * jnp.arccos(jnp.clip(jnp.abs(q[..., 3]), 0.0, 1.0))


def face_towards(direction, up):
    """Matches nalgebra `UnitQuaternion::face_towards(dir, up)`: the resulting
    rotation maps the +Z axis to `direction` (look-at convention used by the
    reference's cameras and lights)."""
    z = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = jnp.cross(z, x)
    m = jnp.stack([x, y, z], axis=-1)  # columns
    return from_mat3(m)


# --------------------------------------------------------------------------
# tiny-matrix products as broadcast-multiply-sum. XLA lowers batched 3x3
# einsums to MXU dot_generals padded to 128x128 tiles — measured ~13 ms for
# one [32,21k] batch of 3x3 matmuls on v5e, vs ~free as a VPU
# broadcast-reduce. Every hot-path small-matrix product must go through
# these (or an equivalent formulation), never jnp.einsum/@.
# --------------------------------------------------------------------------

def mv(m, v):
    """[..., i, j] @ [..., j] -> [..., i] (leading dims broadcast)."""
    return jnp.sum(m * v[..., None, :], -1)


def mtv(m, v):
    """m^T @ v: [..., j, i], [..., j] -> [..., i]."""
    return jnp.sum(m * v[..., :, None], -2)


def mvb(m, v):
    """[..., i, j] applied to a point batch [..., k, j] -> [..., k, i]."""
    return jnp.sum(m[..., None, :, :] * v[..., None, :], -1)


def sandwich_inv_inertia(rmat, inv_inertia_local):
    """R @ I^-1_local @ R^T for [..., 3, 3] world rotations and a
    broadcastable local inverse inertia ([B,3,3] or [...,3,3])."""
    tmp = jnp.sum(rmat[..., :, :, None] * inv_inertia_local[..., None, :, :],
                  -2)                                    # [..., i, k]
    return jnp.sum(tmp[..., :, None, :] * rmat[..., None, :, :], -1)
