"""UI widget tranche 6: search bar, wrap panel, image, vector image,
range editor, toggle button, scroll bar, screen, decorator
(fyrox-ui/src/{searchbar.rs, wrap_panel.rs, image.rs, vector_image.rs,
range.rs, toggle.rs, scroll_bar.rs, screen.rs, decorator.rs}).
"""
import numpy as np

from fyrox_tpu.ui.core import Rect, UserInterface, Widget


def _click(ui, x, y):
    ui.process_os_event({"type": "click", "x": x, "y": y})


def _drain(ui):
    out = []
    while True:
        m = ui.poll_message()
        if m is None:
            break
        out.append(m)
    return out


class TestSearchBar:
    def test_typing_emits_search_messages(self):
        ui = UserInterface((300, 100))
        sb = ui.add(Widget(kind="searchbar", width=200, height=20))
        ui.update_layout()
        _click(ui, 10, 10)
        assert ui.focus == sb
        for ch in "cam":
            ui.process_os_event({"type": "key", "key": "Char", "char": ch})
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "search_text_changed"]
        assert msgs and msgs[-1].data["text"] == "cam"
        assert ui.nodes.borrow(sb).text == "cam"


class TestWrapPanel:
    def test_children_wrap_into_lines(self):
        ui = UserInterface((300, 300))
        wp = ui.add(Widget(kind="wrap", orientation="horizontal",
                           width=100, height=200))
        kids = [ui.add(Widget(kind="border", width=40, height=20), wp)
                for _ in range(4)]
        ui.update_layout()
        rects = [ui.nodes.borrow(k).actual_rect for k in kids]
        # two per line (3rd would overflow 100px), lines stacked
        assert rects[0].y == rects[1].y
        assert rects[2].y > rects[0].y
        assert rects[2].x == rects[0].x
        assert rects[3].y == rects[2].y


class TestImageAndVector:
    def test_image_measures_texture_and_draws(self):
        tex = np.zeros((16, 24, 4), np.float32)
        ui = UserInterface((200, 200))
        im = ui.add(Widget(kind="image", texture=tex))
        ui.update_layout()
        assert ui.nodes.borrow(im).desired_size == (24.0, 16.0)
        cmds = [c for c in ui.draw() if c.kind == "image"]
        assert len(cmds) == 1 and cmds[0].texture is tex

    def test_vector_image_emits_lines(self):
        ui = UserInterface((200, 200))
        ui.add(Widget(kind="vector_image",
                      primitives=[("line", 0, 0, 10, 10),
                                  ("rect", 2, 2, 5, 5)]))
        ui.update_layout()
        kinds = [c.kind for c in ui.draw()]
        assert "line" in kinds
        lines = [c for c in ui.draw() if c.kind == "line"]
        assert lines[0].points == [(0.0, 0.0), (10.0, 10.0)]


class TestRange:
    def test_click_moves_nearest_handle(self):
        ui = UserInterface((200, 100))
        rg = ui.add(Widget(kind="range", width=100, height=16,
                           min_value=0.0, max_value=10.0,
                           value=2.0, value2=8.0))
        ui.update_layout()
        _click(ui, 10, 8)       # near start handle
        w = ui.nodes.borrow(rg)
        assert w.value < 2.0 and w.value2 == 8.0
        _click(ui, 95, 8)       # near end handle
        assert w.value2 > 8.0
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "range_changed"]
        assert len(msgs) == 2
        assert msgs[-1].data["end"] == w.value2

    def test_handles_cannot_cross(self):
        ui = UserInterface((200, 100))
        rg = ui.add(Widget(kind="range", width=100, height=16,
                           min_value=0.0, max_value=10.0,
                           value=4.9, value2=5.1))
        ui.update_layout()
        _click(ui, 99, 8)       # nearest = end; start stays below it
        w = ui.nodes.borrow(rg)
        assert w.value <= w.value2


class TestToggle:
    def test_click_toggles_and_recolors(self):
        ui = UserInterface((200, 100))
        tg = ui.add(Widget(kind="toggle", text="Mute"))
        ui.update_layout()
        r = ui.nodes.borrow(tg).actual_rect
        _click(ui, r.x + 2, r.y + 2)
        assert ui.nodes.borrow(tg).checked
        msgs = [m for m in _drain(ui) if m.data.get("type") == "toggled"]
        assert msgs and msgs[0].data["value"] is True
        on_rects = [c for c in ui.draw() if c.kind == "rect"]
        assert any(c.color == (0.2, 0.45, 0.3, 1.0) for c in on_rects)


class TestScrollBar:
    def test_vertical_click_sets_value(self):
        ui = UserInterface((200, 200))
        sb = ui.add(Widget(kind="scrollbar", orientation="vertical",
                           height=100, min_value=0.0, max_value=50.0))
        ui.update_layout()
        r = ui.nodes.borrow(sb).actual_rect
        _click(ui, r.x + 5, r.y + r.h * 0.5)
        v = ui.nodes.borrow(sb).value
        assert abs(v - 25.0) < 1.0
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "value_changed"]
        assert msgs and abs(msgs[0].data["value"] - v) < 1e-9

    def test_thumb_tracks_value(self):
        ui = UserInterface((200, 200))
        sb = ui.add(Widget(kind="scrollbar", orientation="horizontal",
                           width=100, min_value=0.0, max_value=1.0))
        ui.nodes.borrow(sb).value = 1.0
        ui.update_layout()
        r = ui.nodes.borrow(sb).actual_rect
        thumbs = [c for c in ui.draw()
                  if c.kind == "rect" and c.bounds.w == 18.0]
        assert thumbs and thumbs[-1].bounds.x > r.x + r.w * 0.5


class TestScreenAndDecorator:
    def test_screen_fills_screen(self):
        ui = UserInterface((640, 480))
        sc = ui.add(Widget(kind="screen"))
        child = ui.add(Widget(kind="border"), sc)
        ui.update_layout()
        r = ui.nodes.borrow(sc).actual_rect
        assert (r.w, r.h) == (640, 480)
        cr = ui.nodes.borrow(child).actual_rect
        assert (cr.w, cr.h) == (640, 480)

    def test_decorator_switches_brush_on_state(self):
        ui = UserInterface((100, 100))
        dec = ui.add(Widget(kind="decorator",
                            background=(0.1, 0.1, 0.1, 1.0),
                            width=50, height=20))
        ui.update_layout()
        off = [c for c in ui.draw() if c.kind == "rect"][0].color
        ui.nodes.borrow(dec).checked = True
        on = [c for c in ui.draw() if c.kind == "rect"][0].color
        assert off == (0.1, 0.1, 0.1, 1.0)
        assert on == (0.25, 0.3, 0.45, 1.0)
