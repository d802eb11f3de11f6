"""UI layer: retained-mode widget tree, layout, messages (fyrox-ui core)."""

from fyrox_tpu.ui.core import (DrawCommand, Rect, UiMessage, UserInterface,
                               Widget)

__all__ = ["UserInterface", "Widget", "UiMessage", "Rect", "DrawCommand"]
