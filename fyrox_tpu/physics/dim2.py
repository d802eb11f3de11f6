"""2D physics: the dim2-native shape vocabulary.

Equivalent of the reference's scene/dim2/ module (collider.rs:195
ColliderShape: Ball/Cuboid/Capsule/Segment/Triangle/Trimesh/Heightfield
over rapier2d). TPU redesign: a z-locked 3D world IS a 2D world — the
contact math in the XY slice is identical — so every 2D shape maps to a
z-extruded 3D shape on the (already fast) 3D pipeline, and the builder
enforces the dim2 body locks (z translation + x/y rotation). This keeps
ONE solver/broadphase for both dimensions instead of a second engine.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from fyrox_tpu.physics import shapes as sh
from fyrox_tpu.physics.world import DYNAMIC, PhysicsBuilder

__all__ = ["Physics2DBuilder", "EXTRUDE_HALF"]

EXTRUDE_HALF = 10.0   # z half-depth of extruded shapes: any value larger
                      # than one cell keeps broadphase z-overlap always-on


class Physics2DBuilder:
    """2D facade over PhysicsBuilder (scene/dim2/physics semantics).

    Positions are (x, y); rotations are angles about +z. `build()`
    returns the regular PhysicsTemplate — step it with the normal
    engine/world machinery."""

    def __init__(self, **kw):
        self.pb = PhysicsBuilder(**kw)

    # -- bodies -------------------------------------------------------------
    def add_body(self, node=-1, body_type=DYNAMIC, position=(0.0, 0.0),
                 angle=0.0, **kw) -> int:
        q = (0.0, 0.0, math.sin(angle * 0.5), math.cos(angle * 0.5))
        return self.pb.add_body(node=node, body_type=body_type,
                                position=(position[0], position[1], 0.0),
                                rotation=q, dim2=True, **kw)

    # -- the dim2 shape set (dim2/collider.rs:195) --------------------------
    def add_circle(self, body, radius, **kw) -> int:
        return self.pb.add_collider(body, sh.BALL, [radius], **kw)

    def add_rectangle(self, body, half_x, half_y, **kw) -> int:
        return self.pb.add_collider(body, sh.CUBOID,
                                    [half_x, half_y, EXTRUDE_HALF], **kw)

    def add_capsule(self, body, half_height, radius, **kw) -> int:
        """2D capsule along +y (dim2 CapsuleShape default axis)."""
        return self.pb.add_collider(body, sh.CAPSULE,
                                    [half_height, radius], **kw)

    def add_segment(self, body, a, b, thickness=0.05, **kw) -> int:
        """Segment a→b as a thin rotated box (SegmentShape)."""
        ax, ay = a
        bx, by = b
        mid = ((ax + bx) * 0.5, (ay + by) * 0.5, 0.0)
        dx, dy = bx - ax, by - ay
        length = math.hypot(dx, dy)
        ang = math.atan2(dy, dx)
        q = (0.0, 0.0, math.sin(ang * 0.5), math.cos(ang * 0.5))
        return self.pb.add_collider(
            body, sh.CUBOID, [length * 0.5, thickness, EXTRUDE_HALF],
            offset=mid, offset_rot=q, **kw)

    def add_triangle(self, body, a, b, c, **kw) -> int:
        """TriangleShape as a z-extruded convex prism."""
        pts = []
        for (x, y) in (a, b, c):
            pts.append((x, y, -EXTRUDE_HALF))
            pts.append((x, y, EXTRUDE_HALF))
        return self.pb.add_collider(body, sh.CONVEX,
                                    points=np.asarray(pts, np.float32),
                                    **kw)

    def add_heightfield(self, body, heights, size_x, **kw) -> int:
        """1D heightfield (dim2 HeightfieldShape): heights[Rx] over a
        centered x range, extruded along z."""
        h = np.asarray(heights, np.float32)
        h2 = np.stack([h, h], 0)                  # [2, Rx] flat in z
        return self.pb.add_collider(body, sh.HEIGHTFIELD, heights=h2,
                                    size=(size_x, 2.0 * EXTRUDE_HALF), **kw)

    def add_polyline(self, body, points, thickness=0.05, **kw) -> list:
        """TrimeshShape's dim2 reality is a polyline: one thin box per
        segment."""
        out = []
        for a, b in zip(points, points[1:]):
            out.append(self.add_segment(body, a, b, thickness=thickness,
                                        **kw))
        return out

    def add_halfspace(self, body, **kw) -> int:
        """Flat ground (y=0 plane) — shared with 3D."""
        return self.pb.add_collider(body, sh.HALFSPACE, [], **kw)

    # -- joints: 2D revolute = 3D revolute about +z -------------------------
    def add_revolute_joint(self, body_a, body_b, anchor_a=(0.0, 0.0),
                           anchor_b=(0.0, 0.0)) -> int:
        from fyrox_tpu.physics.joints import JointKind
        return self.pb.add_joint(JointKind.REVOLUTE, body_a, body_b,
                                 anchor_a=(anchor_a[0], anchor_a[1], 0.0),
                                 anchor_b=(anchor_b[0], anchor_b[1], 0.0),
                                 axis=(0.0, 0.0, 1.0))

    def build(self):
        return self.pb.build()
