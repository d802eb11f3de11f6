"""Scene layer: templates (static topology) + WorldState (batched dynamics)."""

from fyrox_tpu.scene import builder, camera, graph, ragdoll, state, template
from fyrox_tpu.scene.builder import SceneBuilder
from fyrox_tpu.scene.ragdoll import RagdollBuilder, RagdollTemplate, drive_kinematic
from fyrox_tpu.scene.state import WorldState, init_state
from fyrox_tpu.scene.template import NodeType, SceneTemplate

__all__ = ["builder", "camera", "graph", "ragdoll", "state", "template",
           "SceneBuilder", "WorldState", "init_state", "NodeType",
           "SceneTemplate", "RagdollBuilder", "RagdollTemplate",
           "drive_kinematic"]
