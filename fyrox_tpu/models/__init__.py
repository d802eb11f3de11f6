"""Benchmark / example scenes ("model families")."""

from fyrox_tpu.models.character import (build_character_scene, build_flagship,
                                        build_pile_scene)

__all__ = ["build_flagship", "build_character_scene", "build_pile_scene"]
