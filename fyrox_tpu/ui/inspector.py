"""Inspector: reflection-driven property grid.

Equivalent of fyrox-ui's Inspector widget family (fyrox-ui/src/inspector/
— the property grid the editor binds to any Reflect object). Here the
rows come from `core/reflect.enumerate_paths`: one grid row per leaf
field, name column + value column, with `refresh` re-reading values and
`set_value` writing through the functional `reflect.set_path` (the
Inspector's PropertyChanged message analog).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from fyrox_tpu.core import reflect
from fyrox_tpu.ui.core import UiMessage, UserInterface, Widget

__all__ = ["Inspector"]


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.4g}"
    if isinstance(v, np.ndarray):
        return "(" + ", ".join(f"{float(x):.3g}" for x in np.ravel(v)[:4]) + ")"
    return str(v)


class Inspector:
    """Property grid bound to a target object.

    ins = Inspector(ui, target, parent)   # builds rows
    ins.refresh()                          # re-read values into the grid
    ins.set_value("inner.value", 3.0)      # functional write + message
    """

    def __init__(self, ui: UserInterface, target: Any, parent=None,
                 max_depth=3, row_height=18.0):
        self.ui = ui
        self.target = target
        self.paths: List[str] = reflect.enumerate_paths(target,
                                                        max_depth=max_depth)
        self.root = ui.add(Widget(kind="grid",
                                  columns=[("stretch",), ("stretch",)],
                                  rows=[("strict", row_height)]
                                  * max(len(self.paths), 1)), parent)
        self._value_widgets: Dict[str, Any] = {}
        for i, p in enumerate(self.paths):
            ui.add(Widget(kind="text", text=p, grid_row=i, grid_column=0),
                   self.root)
            vw = ui.add(Widget(kind="text", text=_fmt(reflect.get_path(target, p)),
                               grid_row=i, grid_column=1), self.root)
            self._value_widgets[p] = vw

    def refresh(self):
        """Re-read every bound field (Inspector sync pass)."""
        for p, h in self._value_widgets.items():
            self.ui.nodes.borrow(h).text = _fmt(reflect.get_path(self.target, p))

    def set_value(self, path: str, value):
        """Functional write-through + PropertyChanged-style message."""
        self.target = reflect.set_path(self.target, path, value)
        self.ui.send_message(UiMessage(
            destination=self._value_widgets.get(path, self.root),
            data={"type": "property_changed", "path": path, "value": value},
            direction="from_widget"))
        self.refresh()
        return self.target
