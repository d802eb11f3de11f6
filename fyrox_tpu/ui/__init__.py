"""UI layer: retained-mode widget tree, layout, messages (fyrox-ui core)
plus the draw-command rasterizer (renderer/ui_renderer.rs equivalent)."""

from fyrox_tpu.ui.core import (DrawCommand, Rect, UiMessage, UserInterface,
                               Widget)
from fyrox_tpu.ui.renderer import compose_over, render_ui

__all__ = ["UserInterface", "Widget", "UiMessage", "Rect", "DrawCommand",
           "render_ui", "compose_over"]
