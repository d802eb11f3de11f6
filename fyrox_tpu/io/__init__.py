"""IO layer: Visitor-format (.rgs) serialization + scene loading +
state checkpointing."""

from fyrox_tpu.io import rgs_scene, visitor
from fyrox_tpu.io.rgs_scene import load_scene
from fyrox_tpu.io.visitor import VisitorNode, read_rgs, write_rgs

__all__ = ["visitor", "rgs_scene", "load_scene", "VisitorNode",
           "read_rgs", "write_rgs"]
