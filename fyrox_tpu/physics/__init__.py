"""Physics layer: batched rigid-body simulation.

TPU-native replacement for the reference's rapier3d wrappers
(fyrox-impl/src/scene/graph/physics/mod.rs). The broadphase, narrowphase,
and solver that live in the external rapier crate are re-implemented here
as dense batched kernels (SURVEY.md §2.10 [NATIVE-DEP]).
"""

from fyrox_tpu.physics import narrowphase, shapes, solver, world
from fyrox_tpu.physics.shapes import (BALL, CAPSULE, CONE, CUBOID, CYLINDER,
                                      HALFSPACE, SEGMENT, TRIANGLE)
from fyrox_tpu.physics.world import (BodyType, PhysicsBuilder, PhysicsState,
                                     PhysicsTemplate, init_physics_state,
                                     step_physics)

__all__ = ["narrowphase", "shapes", "solver", "world",
           "BALL", "CUBOID", "CAPSULE", "CYLINDER", "CONE", "HALFSPACE",
           "SEGMENT", "TRIANGLE",
           "BodyType", "PhysicsBuilder", "PhysicsState", "PhysicsTemplate",
           "init_physics_state", "step_physics"]
