"""Retained-mode UI core.

Equivalent of fyrox-ui's foundations (fyrox-ui/src/lib.rs): a widget tree on
the generational pool, routed message queue (`poll_message`, lib.rs:2345),
and the two-pass measure/arrange layout (`measure_node` lib.rs:1830,
`arrange_node` :1745, `update_layout` :1507). Widgets emit draw commands
only (draw.rs) — rendering is done elsewhere (the engine's ui_renderer
equivalent can rasterize the command list with the same Pallas rasterizer).

Host-side by design, like the reference: UI is authoring/HUD logic, not the
batched hot loop.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from fyrox_tpu.core.pool import Handle, Pool

__all__ = ["Widget", "UserInterface", "UiMessage", "Rect", "DrawCommand"]

INF = float("inf")


@dataclass
class Rect:
    x: float = 0.0
    y: float = 0.0
    w: float = 0.0
    h: float = 0.0

    def contains(self, px, py):
        return self.x <= px <= self.x + self.w and self.y <= py <= self.y + self.h


@dataclass
class UiMessage:
    """Routed widget message (message.rs equivalent)."""
    destination: Handle
    data: Dict
    direction: str = "to_widget"   # or "from_widget"
    handled: bool = False


@dataclass
class DrawCommand:
    kind: str                      # 'rect', 'text', 'border'
    bounds: Rect = field(default_factory=Rect)
    color: Tuple[float, float, float, float] = (1, 1, 1, 1)
    text: str = ""
    thickness: float = 1.0


@dataclass
class Widget:
    """Base widget data (fyrox-ui widget.rs equivalent). Subclass behavior
    comes from `kind` + the per-kind measure/arrange/draw/message hooks."""
    name: str = ""
    kind: str = "border"
    parent: Handle = field(default_factory=Handle.none)
    children: List[Handle] = field(default_factory=list)
    # layout inputs
    width: float = INF             # NaN/INF = auto
    height: float = INF
    min_size: Tuple[float, float] = (0.0, 0.0)
    max_size: Tuple[float, float] = (INF, INF)
    margin: Tuple[float, float, float, float] = (0, 0, 0, 0)  # l,t,r,b
    visible: bool = True
    # widget-kind payload
    text: str = ""
    background: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 1.0)
    foreground: Tuple[float, float, float, float] = (0.9, 0.9, 0.9, 1.0)
    orientation: str = "vertical"  # stack panels
    font_size: float = 14.0
    on_click: Optional[Callable] = None
    # layout outputs
    desired_size: Tuple[float, float] = (0.0, 0.0)
    actual_rect: Rect = field(default_factory=Rect)


class UserInterface:
    """Widget tree + layout + message routing (lib.rs:733)."""

    def __init__(self, screen_size=(800.0, 600.0)):
        self.nodes: Pool = Pool()
        self.root = self.nodes.spawn(Widget(name="__ROOT__", kind="canvas"))
        self.screen_size = screen_size
        self._queue: List[UiMessage] = []

    # -- tree ---------------------------------------------------------------
    def add(self, widget: Widget, parent: Optional[Handle] = None) -> Handle:
        parent = parent or self.root
        h = self.nodes.spawn(widget)
        widget.parent = parent
        self.nodes.borrow(parent).children.append(h)
        return h

    def remove(self, handle: Handle):
        w = self.nodes.borrow(handle)
        for c in list(w.children):
            self.remove(c)
        parent = self.nodes.try_borrow(w.parent)
        if parent is not None and handle in parent.children:
            parent.children.remove(handle)
        self.nodes.free(handle)

    # -- messages -----------------------------------------------------------
    def send_message(self, msg: UiMessage):
        self._queue.append(msg)

    def poll_message(self) -> Optional[UiMessage]:
        """lib.rs:2345 — drain one routed message."""
        return self._queue.pop(0) if self._queue else None

    def process_os_event(self, event: Dict):
        """Hit-test clicks → click messages → on_click callbacks."""
        if event.get("type") == "click":
            x, y = event["x"], event["y"]
            hit = self._hit_test(self.root, x, y)
            if hit is not None:
                w = self.nodes.borrow(hit)
                msg = UiMessage(destination=hit,
                                data={"type": "click", "x": x, "y": y},
                                direction="from_widget")
                self.send_message(msg)
                if w.on_click is not None:
                    w.on_click(self, hit)

    def _hit_test(self, h: Handle, x, y) -> Optional[Handle]:
        w = self.nodes.borrow(h)
        if not w.visible:
            return None
        best = None
        if w.actual_rect.contains(x, y):
            best = h
        for c in w.children:
            deeper = self._hit_test(c, x, y)
            if deeper is not None:
                best = deeper
        return best

    # -- layout: measure / arrange (lib.rs:1830, :1745) ----------------------
    def update_layout(self):
        sw, sh = self.screen_size
        self.measure(self.root, (sw, sh))
        self.arrange(self.root, Rect(0, 0, sw, sh))

    def measure(self, h: Handle, available):
        w = self.nodes.borrow(h)
        if not w.visible:
            w.desired_size = (0.0, 0.0)
            return w.desired_size
        ml, mt, mr, mb = w.margin
        avail = (max(available[0] - ml - mr, 0.0),
                 max(available[1] - mt - mb, 0.0))
        fixed_w = w.width if np.isfinite(w.width) else None
        fixed_h = w.height if np.isfinite(w.height) else None
        inner = (fixed_w if fixed_w is not None else avail[0],
                 fixed_h if fixed_h is not None else avail[1])

        if w.kind == "stack":
            main = 0.0
            cross = 0.0
            for c in w.children:
                cs = self.measure(c, inner)
                if w.orientation == "vertical":
                    main += cs[1]
                    cross = max(cross, cs[0])
                else:
                    main += cs[0]
                    cross = max(cross, cs[1])
            content = ((cross, main) if w.orientation == "vertical"
                       else (main, cross))
        elif w.kind == "text":
            content = (len(w.text) * w.font_size * 0.55 if w.text else 0.0,
                       w.font_size * 1.3)
        else:  # border/button/canvas: fit children
            content = (0.0, 0.0)
            for c in w.children:
                cs = self.measure(c, inner)
                content = (max(content[0], cs[0]), max(content[1], cs[1]))
            if w.kind == "button" and w.text:
                content = (max(content[0], len(w.text) * w.font_size * 0.55 + 12),
                           max(content[1], w.font_size * 1.3 + 8))

        dw = fixed_w if fixed_w is not None else content[0]
        dh = fixed_h if fixed_h is not None else content[1]
        dw = min(max(dw, w.min_size[0]), w.max_size[0])
        dh = min(max(dh, w.min_size[1]), w.max_size[1])
        w.desired_size = (dw + ml + mr, dh + mt + mb)
        return w.desired_size

    def arrange(self, h: Handle, final: Rect):
        w = self.nodes.borrow(h)
        if not w.visible:
            w.actual_rect = Rect(final.x, final.y, 0, 0)
            return
        ml, mt, mr, mb = w.margin
        rect = Rect(final.x + ml, final.y + mt,
                    max(final.w - ml - mr, 0.0), max(final.h - mt - mb, 0.0))
        if np.isfinite(w.width):
            rect.w = min(rect.w, w.width)
        if np.isfinite(w.height):
            rect.h = min(rect.h, w.height)
        w.actual_rect = rect

        if w.kind == "stack":
            offset = 0.0
            for c in w.children:
                cw = self.nodes.borrow(c)
                if w.orientation == "vertical":
                    self.arrange(c, Rect(rect.x, rect.y + offset, rect.w,
                                         cw.desired_size[1]))
                    offset += cw.desired_size[1]
                else:
                    self.arrange(c, Rect(rect.x + offset, rect.y,
                                         cw.desired_size[0], rect.h))
                    offset += cw.desired_size[0]
        else:
            for c in w.children:
                self.arrange(c, rect)

    # -- draw command emission (draw.rs) --------------------------------------
    def draw(self) -> List[DrawCommand]:
        cmds: List[DrawCommand] = []
        self._draw_node(self.root, cmds)
        return cmds

    def _draw_node(self, h: Handle, cmds: List[DrawCommand]):
        w = self.nodes.borrow(h)
        if not w.visible:
            return
        if w.kind in ("border", "button", "stack"):
            cmds.append(DrawCommand("rect", w.actual_rect, w.background))
            if w.kind in ("border", "button"):
                cmds.append(DrawCommand("border", w.actual_rect, w.foreground))
        if w.kind in ("text", "button") and w.text:
            cmds.append(DrawCommand("text", w.actual_rect, w.foreground,
                                    text=w.text))
        for c in w.children:
            self._draw_node(c, cmds)

    def update(self, dt: float = 0.0):
        """Engine post_update equivalent: relayout + message pump hooks."""
        self.update_layout()
