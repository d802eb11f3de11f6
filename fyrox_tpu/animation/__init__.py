"""Animation layer: tracks/clips, poses, ABSM machines, skinning.

TPU-native equivalent of fyrox-animation + the scene-side glue
(fyrox-impl/src/scene/animation/).
"""

from fyrox_tpu.animation import machine, player, pose, skinning, track
from fyrox_tpu.animation.machine import (MachineBuilder, MachineState,
                                         MachineTemplate, init_machine_state)
from fyrox_tpu.animation.skinning import SkinTemplate
from fyrox_tpu.animation.track import (AnimationSet, AnimationSetBuilder,
                                       AnimationState, init_animation_state)

__all__ = ["machine", "player", "pose", "skinning", "track",
           "AnimationSet", "AnimationSetBuilder", "AnimationState",
           "init_animation_state", "MachineBuilder", "MachineState",
           "MachineTemplate", "init_machine_state", "SkinTemplate"]
