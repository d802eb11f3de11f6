"""Sprite-sheet (flipbook) animation, batched.

Equivalent of fyrox-animation/src/spritesheet/ (SpriteSheetAnimation
:165: frame grid over a texture, fps playback, looping, frame ranges).
State is just a per-world clock; frames and UV rectangles derive from it.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["SpriteSheetAnimation", "current_frame", "frame_uv_rect"]


@dataclass
class SpriteSheetAnimation:
    """Frame grid: `columns x rows` cells, playing [first_frame,
    last_frame] at `fps`."""
    columns: int
    rows: int
    fps: float = 10.0
    first_frame: int = 0
    last_frame: int = -1          # -1 = all cells
    looping: bool = True

    @property
    def num_frames(self):
        last = self.last_frame if self.last_frame >= 0 else self.columns * self.rows - 1
        return last - self.first_frame + 1


def current_frame(sheet: SpriteSheetAnimation, time):
    """Frame index at time(s) [..] — wraps when looping, clamps otherwise."""
    raw = jnp.floor(jnp.asarray(time) * sheet.fps).astype(jnp.int32)
    n = sheet.num_frames
    idx = jnp.mod(raw, n) if sheet.looping else jnp.clip(raw, 0, n - 1)
    return sheet.first_frame + idx


def frame_uv_rect(sheet: SpriteSheetAnimation, frame):
    """UV rectangle (u0, v0, u1, v1) of a frame index; batched."""
    col = jnp.mod(frame, sheet.columns)
    row = frame // sheet.columns
    du = 1.0 / sheet.columns
    dv = 1.0 / sheet.rows
    u0 = col.astype(jnp.float32) * du
    v0 = row.astype(jnp.float32) * dv
    return jnp.stack([u0, v0, u0 + du, v0 + dv], -1)
