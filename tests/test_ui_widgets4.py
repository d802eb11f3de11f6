"""UI widget tranche 4: tab control, expander, color picker, file
browser, style system (fyrox-ui/src/{tab_control.rs, expander.rs,
color.rs, file_browsers/, style/}).
"""
import os

import numpy as np

from fyrox_tpu.ui.core import Rect, UserInterface, Widget


def _click(ui, x, y):
    ui.process_os_event({"type": "click", "x": x, "y": y})


def _drain(ui):
    out = []
    while True:
        m = ui.poll_message()
        if m is None:
            return out
        out.append(m)


class TestTabs:
    def test_switch_tab_shows_other_page(self):
        ui = UserInterface((400, 300))
        tabs = ui.add(Widget(kind="tabs", width=300, height=200,
                             tab_headers=["ONE", "TWO"]))
        p1 = ui.add(Widget(kind="text", text="PAGEONE"), tabs)
        p2 = ui.add(Widget(kind="text", text="PAGETWO"), tabs)
        ui.update_layout()
        texts = [c.text for c in ui.draw() if c.kind == "text"]
        assert "PAGEONE" in texts and "PAGETWO" not in texts
        r = ui.nodes.borrow(tabs).actual_rect
        hw1 = 3 * 14 * 0.55 + 16                 # "ONE" header width
        _click(ui, r.x + hw1 + 4, r.y + 4)       # click "TWO" header
        assert ui.nodes.borrow(tabs).active_tab == 1
        msgs = [m for m in _drain(ui) if m.data.get("type") == "tab_changed"]
        assert msgs and msgs[0].data["index"] == 1
        texts = [c.text for c in ui.draw() if c.kind == "text"]
        assert "PAGETWO" in texts and "PAGEONE" not in texts
        # inactive page is not clickable (zero rect)
        assert ui.nodes.borrow(p1).actual_rect.w == 0


class TestExpander:
    def test_header_click_toggles_content(self):
        ui = UserInterface((300, 300))
        ex = ui.add(Widget(kind="expander", text="DETAILS", width=200))
        ui.add(Widget(kind="text", text="BODY"), ex)
        ui.update_layout()
        assert any(c.text == "BODY" for c in ui.draw() if c.kind == "text")
        h_open = ui.nodes.borrow(ex).desired_size[1]
        r = ui.nodes.borrow(ex).actual_rect
        _click(ui, r.x + 4, r.y + 4)
        assert not ui.nodes.borrow(ex).expanded
        assert not any(c.text == "BODY" for c in ui.draw()
                       if c.kind == "text")
        ui.update_layout()
        assert ui.nodes.borrow(ex).desired_size[1] < h_open


class TestColorPicker:
    def test_hue_and_value_clicks_change_color(self):
        ui = UserInterface((300, 300))
        cp = ui.add(Widget(kind="colorpicker", width=200))
        ui.update_layout()
        r = ui.nodes.borrow(cp).actual_rect
        strip_w = r.w - 34.0
        _click(ui, r.x + strip_w * 0.33, r.y + 6)       # hue ~ green
        w = ui.nodes.borrow(cp)
        assert w.color_value[1] > 0.5                   # green dominant
        msgs = [m for m in _drain(ui) if m.data.get("type") == "color_changed"]
        assert msgs
        _click(ui, r.x + strip_w * 0.1, r.y + 20)       # low value strip
        w = ui.nodes.borrow(cp)
        assert max(w.color_value[:3]) < 0.3             # dimmed

    def test_swatch_drawn_with_current_color(self):
        ui = UserInterface((300, 300))
        cp = ui.add(Widget(kind="colorpicker", width=200,
                           color_value=(0.1, 0.2, 0.9, 1.0)))
        ui.update_layout()
        assert any(c.kind == "rect" and c.color == (0.1, 0.2, 0.9, 1.0)
                   for c in ui.draw())


class TestFileBrowser:
    def test_navigate_and_select(self, tmp_path):
        (tmp_path / "sub").mkdir()
        (tmp_path / "a.txt").write_text("x")
        (tmp_path / "sub" / "inner.rgs").write_text("y")
        ui = UserInterface((400, 400))
        fb = ui.add(Widget(kind="filebrowser", width=300, height=300))
        ui.browse(fb, str(tmp_path))
        lst = ui.nodes.borrow(fb).children[0]
        lw = ui.nodes.borrow(lst)
        assert lw.items == ["..", "sub/", "a.txt"]
        # click into the sub directory
        lr = lw.actual_rect
        row_h = lw.font_size * 1.4
        _click(ui, lr.x + 5, lr.y + row_h * 1.5)        # "sub/"
        assert ui.nodes.borrow(fb).path == str(tmp_path / "sub")
        lw = ui.nodes.borrow(lst)
        assert lw.items == ["..", "inner.rgs"]
        # select the file
        lr = lw.actual_rect
        _click(ui, lr.x + 5, lr.y + row_h * 1.5)        # "inner.rgs"
        msgs = [m for m in _drain(ui) if m.data.get("type") == "file_selected"]
        assert msgs and msgs[-1].data["path"] == str(
            tmp_path / "sub" / "inner.rgs")
        # ".." goes back up
        _click(ui, lr.x + 5, lr.y + row_h * 0.5)
        assert ui.nodes.borrow(fb).path == str(tmp_path)


class TestStyles:
    def test_named_style_applies_defaults_only(self):
        ui = UserInterface((300, 300))
        ui.define_style("danger", background=(0.5, 0.0, 0.0, 1.0),
                        font_size=18.0)
        a = ui.add(Widget(kind="button", text="GO", style="danger"))
        b = ui.add(Widget(kind="button", text="GO", style="danger",
                          font_size=10.0))       # explicit override wins
        assert ui.nodes.borrow(a).background == (0.5, 0.0, 0.0, 1.0)
        assert ui.nodes.borrow(a).font_size == 18.0
        assert ui.nodes.borrow(b).font_size == 10.0
        assert ui.nodes.borrow(b).background == (0.5, 0.0, 0.0, 1.0)


class TestNumericUpDown:
    def test_spinners_and_clamp(self):
        ui = UserInterface((200, 100))
        nu = ui.add(Widget(kind="numeric", width=80, value=5.0,
                           min_value=0.0, max_value=6.0, step=1.0))
        ui.update_layout()
        r = ui.nodes.borrow(nu).actual_rect
        _click(ui, r.x + r.w - 6, r.y + 2)            # up
        assert ui.nodes.borrow(nu).value == 6.0
        _click(ui, r.x + r.w - 6, r.y + 2)            # clamped at max
        assert ui.nodes.borrow(nu).value == 6.0
        _click(ui, r.x + r.w - 6, r.y + r.h - 2)      # down
        assert ui.nodes.borrow(nu).value == 5.0
        msgs = [m for m in _drain(ui) if m.data.get("type") == "value_changed"]
        assert len(msgs) == 3


class TestMessageBox:
    def test_result_message_and_removal(self):
        ui = UserInterface((400, 300))
        box = ui.show_message_box("CONFIRM", "DELETE FILE", ("YES", "NO"))
        w = ui.nodes.borrow(box)
        assert w.float_pos is not None and w.actual_rect.w > 0
        # click the NO button
        btns = []
        def walk(h):
            ww = ui.nodes.borrow(h)
            if ww.kind == "button":
                btns.append((h, ww))
            for c in ww.children:
                walk(c)
        walk(box)
        assert [b.text for _h, b in btns] == ["YES", "NO"]
        r = btns[1][1].actual_rect
        _click(ui, r.x + 2, r.y + 2)
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "message_box_result"]
        assert msgs and msgs[0].data["button"] == "NO"
        assert ui.nodes.try_borrow(box) is None       # removed


class TestWindowDrag:
    def test_title_bar_drag_moves_window(self):
        ui = UserInterface((400, 300))
        win = ui.add(Widget(kind="window", title="TOOLS", width=120,
                            height=80, float_pos=(50.0, 40.0)))
        ui.update_layout()
        r0 = ui.nodes.borrow(win).actual_rect
        assert (r0.x, r0.y) == (50.0, 40.0)
        ui.process_os_event({"type": "drag", "x": r0.x + 10, "y": r0.y + 5,
                             "dx": 30.0, "dy": 15.0})
        r1 = ui.nodes.borrow(win).actual_rect
        assert (r1.x, r1.y) == (80.0, 55.0)
        # dragging the BODY (below the title bar) does not move it
        ui.process_os_event({"type": "drag", "x": r1.x + 10,
                             "y": r1.y + 50, "dx": 30.0, "dy": 15.0})
        r2 = ui.nodes.borrow(win).actual_rect
        assert (r2.x, r2.y) == (80.0, 55.0)
