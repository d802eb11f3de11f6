"""Core batched math: the fyrox-core + fyrox-math equivalent layer."""

from fyrox_tpu.core import (aabb, curve, frustum, quat, ray, transform,
                            triangulator)

__all__ = ["aabb", "curve", "frustum", "quat", "ray", "transform",
           "triangulator"]
