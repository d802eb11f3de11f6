"""Plane-form (structure-of-planes) math for the TPU physics fast path.

TPU memory tiles are (8 sublanes, 128 lanes) over the two minor axes. Any
tensor whose minor axis is a geometry dim — [W,K,3] vectors, [W,K,4]
quats, [W,K,3,3] matrices — pads that axis to 128 lanes, a 10-40x HBM
blowup that made the round-2 solver/narrowphase bandwidth-bound (measured
~30 ms/step at W=32 where the flop count justifies ~2 ms).

This module represents geometry as *planes*: a vec3 is a tuple of three
[W,K] f32 arrays, a quaternion four, a 3x3 matrix nine. Every op is
elementwise over clean lane-major 2D arrays that XLA fuses freely.

Conventions match fyrox_tpu.core.quat (xyzw quats, nalgebra semantics;
fyrox-core uses nalgebra 0.35, fyrox-core/Cargo.toml:23).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "v3", "splat", "add3", "sub3", "scale3", "mul3", "dot3", "cross3",
    "norm3", "normalize3", "where3", "neg3",
    "qmul", "qrotate", "qrotate_inv", "q_to_rot9",
    "rot9_apply", "rot9_apply_t", "rot9_col", "rot9_mul",
    "where_n", "stack_last", "unstack_last",
]


def v3(x, y, z):
    return (x, y, z)


def splat(val, like):
    """Constant plane broadcast against `like`."""
    return jnp.broadcast_to(jnp.asarray(val, like.dtype), like.shape)


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def neg3(a):
    return (-a[0], -a[1], -a[2])


def scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def mul3(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def norm3(a, eps=0.0):
    n2 = dot3(a, a)
    return jnp.sqrt(n2 + eps) if eps else jnp.sqrt(n2)


def normalize3(a, eps=1e-9, fallback=(0.0, 1.0, 0.0)):
    n = norm3(a)
    inv = 1.0 / jnp.maximum(n, eps)
    ok = n > eps
    return (jnp.where(ok, a[0] * inv, fallback[0]),
            jnp.where(ok, a[1] * inv, fallback[1]),
            jnp.where(ok, a[2] * inv, fallback[2])), n


def where3(c, a, b):
    return (jnp.where(c, a[0], b[0]),
            jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def where_n(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def qmul(a, b):
    """Hamilton product (xyzw tuples), matching core.quat.mul."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz)


def qrotate(q, v):
    """Rotate v by unit quat q: v + 2w(u x v) + 2(u x (u x v))."""
    u = (q[0], q[1], q[2])
    w = q[3]
    uv = cross3(u, v)
    uuv = cross3(u, uv)
    return (v[0] + 2.0 * (w * uv[0] + uuv[0]),
            v[1] + 2.0 * (w * uv[1] + uuv[1]),
            v[2] + 2.0 * (w * uv[2] + uuv[2]))


def qrotate_inv(q, v):
    return qrotate((-q[0], -q[1], -q[2], q[3]), v)


def q_to_rot9(q):
    """Quat → rotation matrix as a 9-tuple (r00,r01,r02,r10,...,r22),
    row-major; column j is the world direction of local axis j."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def rot9_apply(r, v):
    """R @ v (local → world)."""
    return (r[0] * v[0] + r[1] * v[1] + r[2] * v[2],
            r[3] * v[0] + r[4] * v[1] + r[5] * v[2],
            r[6] * v[0] + r[7] * v[1] + r[8] * v[2])


def rot9_apply_t(r, v):
    """R^T @ v (world → local)."""
    return (r[0] * v[0] + r[3] * v[1] + r[6] * v[2],
            r[1] * v[0] + r[4] * v[1] + r[7] * v[2],
            r[2] * v[0] + r[5] * v[1] + r[8] * v[2])


def rot9_col(r, j):
    """Column j of R = world direction of local axis j (static j)."""
    return (r[j], r[3 + j], r[6 + j])


def rot9_mul(a, b):
    """A @ B for two 9-tuples."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(a[3 * i] * b[j] + a[3 * i + 1] * b[3 + j]
                       + a[3 * i + 2] * b[6 + j])
    return tuple(out)


def stack_last(planes):
    """Tuple of [W,K] planes → [W,K,len] (boundary use only)."""
    return jnp.stack(planes, axis=-1)


def unstack_last(x):
    """[W,K,D] → tuple of D planes (boundary use only)."""
    return tuple(x[..., i] for i in range(x.shape[-1]))
