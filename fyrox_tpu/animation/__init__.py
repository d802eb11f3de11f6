"""Animation layer: tracks/clips, poses, ABSM machines, skinning.

TPU-native equivalent of fyrox-animation + the scene-side glue
(fyrox-impl/src/scene/animation/).
"""

from fyrox_tpu.animation import (blendspace, machine, player, pose,
                                 rootmotion, skinning, track)
from fyrox_tpu.animation.blendspace import (BlendSpaceTemplate,
                                            build_blend_space)
from fyrox_tpu.animation.machine import (MachineBuilder, MachineState,
                                         MachineTemplate, init_machine_state)
from fyrox_tpu.animation.rootmotion import (RootMotionSettings,
                                            build_root_motion,
                                            extract_root_motion,
                                            init_root_motion_state)
from fyrox_tpu.animation.skinning import SkinTemplate
from fyrox_tpu.animation.track import (AnimationSet, AnimationSetBuilder,
                                       AnimationState, init_animation_state)

__all__ = ["blendspace", "machine", "player", "pose", "rootmotion",
           "skinning", "track",
           "AnimationSet", "AnimationSetBuilder", "AnimationState",
           "init_animation_state", "MachineBuilder", "MachineState",
           "MachineTemplate", "init_machine_state", "SkinTemplate",
           "BlendSpaceTemplate", "build_blend_space", "RootMotionSettings",
           "build_root_motion", "extract_root_motion",
           "init_root_motion_state"]
