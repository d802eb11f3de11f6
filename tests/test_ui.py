"""UI core tests: layout (measure/arrange), message routing, hit testing,
draw command emission, widget deletion (the reference's shared harness
pattern, fyrox-ui/src/test.rs:229)."""
from fyrox_tpu.ui import UserInterface, Widget, Rect


def build_panel(ui):
    panel = ui.add(Widget(kind="stack", orientation="vertical",
                          margin=(10, 10, 10, 10)))
    b1 = ui.add(Widget(kind="button", text="Play", height=30.0), panel)
    b2 = ui.add(Widget(kind="button", text="Quit", height=30.0), panel)
    t = ui.add(Widget(kind="text", text="hello world"), panel)
    return panel, b1, b2, t


class TestLayout:
    def test_vertical_stack_positions(self):
        ui = UserInterface((400, 300))
        panel, b1, b2, t = build_panel(ui)
        ui.update_layout()
        r1 = ui.nodes.borrow(b1).actual_rect
        r2 = ui.nodes.borrow(b2).actual_rect
        rt = ui.nodes.borrow(t).actual_rect
        assert r1.y < r2.y < rt.y
        assert abs((r2.y - r1.y) - 30.0) < 1e-5  # stacked by desired height
        assert r1.x == 10 and r1.h == 30

    def test_fixed_size_and_margin(self):
        ui = UserInterface((200, 200))
        w = ui.add(Widget(kind="border", width=50.0, height=40.0,
                          margin=(5, 6, 0, 0)))
        ui.update_layout()
        r = ui.nodes.borrow(w).actual_rect
        assert (r.x, r.y, r.w, r.h) == (5, 6, 50, 40)

    def test_invisible_takes_no_space(self):
        ui = UserInterface((200, 200))
        panel = ui.add(Widget(kind="stack"))
        a = ui.add(Widget(kind="button", text="A", height=20.0), panel)
        hid = ui.add(Widget(kind="button", text="H", height=20.0,
                            visible=False), panel)
        b = ui.add(Widget(kind="button", text="B", height=20.0), panel)
        ui.update_layout()
        ra = ui.nodes.borrow(a).actual_rect
        rb = ui.nodes.borrow(b).actual_rect
        assert abs((rb.y - ra.y) - 20.0) < 1e-5


class TestMessagesAndInput:
    def test_click_routes_to_topmost(self):
        ui = UserInterface((400, 300))
        panel, b1, b2, t = build_panel(ui)
        clicks = []
        ui.nodes.borrow(b1).on_click = lambda u, h: clicks.append("play")
        ui.update_layout()
        r1 = ui.nodes.borrow(b1).actual_rect
        ui.process_os_event({"type": "click", "x": r1.x + 1, "y": r1.y + 1})
        assert clicks == ["play"]
        msg = ui.poll_message()
        assert msg is not None and msg.destination == b1
        assert ui.poll_message() is None

    def test_widget_deletion(self):
        """test.rs:229 pattern: deleting a widget removes its subtree and
        invalidates handles."""
        ui = UserInterface((100, 100))
        panel, b1, b2, t = build_panel(ui)
        ui.remove(panel)
        assert ui.nodes.try_borrow(panel) is None
        assert ui.nodes.try_borrow(b1) is None
        assert ui.nodes.try_borrow(t) is None
        ui.update_layout()  # must not crash


class TestDraw:
    def test_draw_commands_emitted(self):
        ui = UserInterface((400, 300))
        build_panel(ui)
        ui.update_layout()
        cmds = ui.draw()
        kinds = [c.kind for c in cmds]
        assert "rect" in kinds and "text" in kinds and "border" in kinds
        texts = [c.text for c in cmds if c.kind == "text"]
        assert "Play" in texts and "hello world" in texts


class TestGridLayout:
    def test_strict_auto_stretch_columns(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((300, 100))
        g = ui.add(Widget(kind="grid",
                          columns=[("strict", 50.0), ("auto",), ("stretch",)],
                          rows=[("stretch",)]))
        a = ui.add(Widget(kind="border", grid_column=0), g)
        b = ui.add(Widget(kind="border", grid_column=1, width=80.0,
                          height=10.0), g)
        c = ui.add(Widget(kind="border", grid_column=2), g)
        ui.update_layout()
        ra = ui.nodes.borrow(a).actual_rect
        rb = ui.nodes.borrow(b).actual_rect
        rc = ui.nodes.borrow(c).actual_rect
        assert ra.x == 0 and abs(ra.w - 50) < 1e-5
        assert abs(rb.x - 50) < 1e-5
        # stretch column gets the rest: 300 - 50 - 80 = 170
        assert abs(rc.x - 130) < 1e-5 and abs(rc.w - 170) < 1e-5

    def test_grid_rows(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((100, 90))
        g = ui.add(Widget(kind="grid", rows=[("stretch",)] * 3,
                          columns=[("stretch",)]))
        cells = [ui.add(Widget(kind="border", grid_row=r), g) for r in range(3)]
        ui.update_layout()
        ys = [ui.nodes.borrow(c).actual_rect.y for c in cells]
        assert ys == [0.0, 30.0, 60.0]


class TestScrollWindowTree:
    def test_scroll_offsets_content(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((100, 100))
        sv = ui.add(Widget(kind="scroll", height=50.0))
        content = ui.add(Widget(kind="stack"), sv)
        for _ in range(10):
            ui.add(Widget(kind="button", text="x", height=20.0), content)
        ui.update_layout()
        y0 = ui.nodes.borrow(content).actual_rect.y
        ui.nodes.borrow(sv).scroll = (0.0, 35.0)
        ui.update_layout()
        y1 = ui.nodes.borrow(content).actual_rect.y
        assert abs((y0 - y1) - 35.0) < 1e-5

    def test_window_reserves_title_bar(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((200, 200))
        win = ui.add(Widget(kind="window", title="Inventory",
                            title_height=20.0))
        body = ui.add(Widget(kind="border"), win)
        ui.update_layout()
        rb = ui.nodes.borrow(body).actual_rect
        assert rb.y == 20.0
        cmds = ui.draw()
        titles = [c for c in cmds if c.kind == "text" and c.text == "Inventory"]
        assert titles and titles[0].bounds.h == 20.0

    def test_tree_collapse_hides_children(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((200, 200))
        tr = ui.add(Widget(kind="tree", text="root"))
        leaf = ui.add(Widget(kind="tree", text="leaf"), tr)
        ui.update_layout()
        open_h = ui.nodes.borrow(tr).desired_size[1]
        n_cmds_open = len(ui.draw())
        # click the header toggles expansion
        r = ui.nodes.borrow(tr).actual_rect
        ui.process_os_event({"type": "click", "x": r.x + 2, "y": r.y + 2})
        ui.update_layout()
        closed_h = ui.nodes.borrow(tr).desired_size[1]
        assert closed_h < open_h
        assert len(ui.draw()) < n_cmds_open

    def test_checkbox_toggles_and_messages(self):
        from fyrox_tpu.ui import UserInterface, Widget
        ui = UserInterface((100, 100))
        cb = ui.add(Widget(kind="check", text="ok", width=60.0, height=16.0))
        ui.update_layout()
        r = ui.nodes.borrow(cb).actual_rect
        ui.process_os_event({"type": "click", "x": r.x + 4, "y": r.y + 4})
        assert ui.nodes.borrow(cb).checked
        msgs = []
        while (m := ui.poll_message()) is not None:
            msgs.append(m)
        assert any(m.data.get("type") == "checked" and m.data["value"]
                   for m in msgs)


class TestUiRenderer:
    def test_rect_border_text_rasterize(self):
        import numpy as np
        from fyrox_tpu.ui import (UserInterface, Widget, render_ui,
                                  compose_over)
        ui = UserInterface((64, 64))
        ui.add(Widget(kind="border", width=40.0, height=30.0,
                      background=(1, 0, 0, 1), foreground=(0, 1, 0, 1),
                      margin=(4, 4, 0, 0)))
        ui.update_layout()
        img = render_ui(ui.draw(), 64, 64)
        assert img.shape == (64, 64, 4)
        # interior red, border green, outside transparent
        assert img[15, 20, 0] > 0.9 and img[15, 20, 3] > 0.9
        assert img[4, 20, 1] > 0.9
        assert img[60, 60, 3] == 0.0

    def test_text_glyphs_draw_pixels(self):
        from fyrox_tpu.ui import UserInterface, Widget, render_ui
        ui = UserInterface((128, 32))
        ui.add(Widget(kind="text", text="FPS 60", font_size=14.0))
        ui.update_layout()
        img = render_ui(ui.draw(), 32, 128)
        assert img[..., 3].sum() > 20          # glyph pixels landed

    def test_hud_composes_over_frame(self):
        import jax.numpy as jnp
        import numpy as np
        from fyrox_tpu.ui import (UserInterface, Widget, render_ui,
                                  compose_over)
        frame = jnp.zeros((2, 32, 32, 3)) + 0.25       # two worlds
        ui = UserInterface((32, 32))
        ui.add(Widget(kind="border", width=10.0, height=10.0,
                      background=(1, 1, 1, 1)))
        ui.update_layout()
        hud = render_ui(ui.draw(), 32, 32)
        out = np.asarray(compose_over(frame, hud))
        assert out.shape == (2, 32, 32, 3)
        assert out[0, 5, 5, 0] > 0.9           # HUD pixel
        assert abs(out[0, 20, 20, 0] - 0.25) < 1e-6   # world pixel intact


class TestInspector:
    """Reflection-driven property grid (fyrox-ui/src/inspector/)."""

    def test_rows_refresh_and_property_changed(self):
        import dataclasses
        from fyrox_tpu.ui import UserInterface
        from fyrox_tpu.ui.inspector import Inspector

        @dataclasses.dataclass
        class Settings:
            speed: float = 1.5
            name: str = "bot"

        ui = UserInterface((300, 200))
        ins = Inspector(ui, Settings())
        ui.update_layout()
        assert "speed" in ins.paths and "name" in ins.paths
        # value column shows the current value
        vw = ui.nodes.borrow(ins._value_widgets["speed"])
        assert vw.text == "1.5"
        # functional write-through + message
        ins.set_value("speed", 3.0)
        assert ui.nodes.borrow(ins._value_widgets["speed"]).text == "3"
        assert ins.target.speed == 3.0
        msgs = []
        while (m := ui.poll_message()) is not None:
            msgs.append(m)
        assert any(m.data.get("type") == "property_changed"
                   and m.data["path"] == "speed" for m in msgs)
        # rows lay out on distinct grid rows
        r0 = ui.nodes.borrow(ins._value_widgets[ins.paths[0]]).actual_rect
        r1 = ui.nodes.borrow(ins._value_widgets[ins.paths[1]]).actual_rect
        assert r0.y != r1.y


class TestFormattedText:
    """Formatted-text layout engine (fyrox-ui/src/formatted_text.rs)."""

    def test_word_wrap_breaks_at_spaces(self):
        from fyrox_tpu.ui.text import FormattedText
        ft = FormattedText("hello brave new world", font_size=10.0,
                           wrap="word", constraint=(5.5 * 11, float("inf")))
        texts = [ft.line_text(i) for i in range(len(ft.lines))]
        assert texts == ["hello brave", "new world"]
        joined = "".join(texts).replace(" ", "")
        assert joined == "hello brave new world".replace(" ", "")

    def test_letter_wrap_and_newlines(self):
        from fyrox_tpu.ui.text import FormattedText
        ft = FormattedText("abcdef\ngh", font_size=10.0, wrap="letter",
                           constraint=(5.5 * 4, float("inf")))
        assert [ft.line_text(i) for i in range(len(ft.lines))] == \
            ["abcd", "ef", "gh"]

    def test_alignment_and_caret_roundtrip(self):
        from fyrox_tpu.ui.text import FormattedText
        ft = FormattedText("ab\nabcd", font_size=10.0, wrap="none",
                           halign="right", constraint=(5.5 * 8, 100.0))
        # right-aligned: short line starts further right
        assert ft.lines[0].x > ft.lines[1].x
        for idx in range(len(ft.text) + 1):
            if ft.text[idx - 1:idx] == "\n":
                continue
            x, y = ft.caret_to_xy(idx)
            assert ft.xy_to_caret(x + 0.1, y + 0.1) == idx

    def test_apply_key_editing(self):
        from fyrox_tpu.ui.text import apply_key
        t, c, a = "", 0, -1
        for ch in "3.x5":
            t, c, a, ev = apply_key(t, c, a, "Char", char=ch)
        assert t == "3.x5"
        t, c, a, _ = apply_key(t, c, a, "Left")
        t, c, a, _ = apply_key(t, c, a, "Backspace")
        assert t == "3.5" and c == 2
        # shift-select to start then type replaces selection
        t, c, a, _ = apply_key(t, c, a, "Home", shift=True)
        t, c, a, ev = apply_key(t, c, a, "Char", char="7")
        assert t == "75" and c == 1 and a == -1
        _, _, _, ev = apply_key(t, c, a, "Enter")
        assert "committed" in ev


class TestTextBox:
    """TextBox widget: focus, caret, key routing (text_box.rs)."""

    def _ui_with_box(self):
        from fyrox_tpu.ui import UserInterface
        from fyrox_tpu.ui.core import Widget
        ui = UserInterface((200, 100))
        h = ui.add(Widget(kind="textbox", text="abc", width=120, height=20))
        ui.update_layout()
        return ui, h

    def test_click_focuses_and_places_caret(self):
        ui, h = self._ui_with_box()
        w = ui.nodes.borrow(h)
        r = w.actual_rect
        ui.process_os_event({"type": "click",
                             "x": r.x + r.w - 2, "y": r.y + 2})
        assert ui.focus == h
        assert w.caret == 3            # clicked past the end
        ui.process_os_event({"type": "key", "key": "Char", "char": "d"})
        assert w.text == "abcd"
        # clicking empty space clears focus; keys then go nowhere
        ui.process_os_event({"type": "click", "x": 199, "y": 99})
        assert ui.focus is None
        ui.process_os_event({"type": "key", "key": "Char", "char": "z"})
        assert w.text == "abcd"

    def test_caret_draws_when_focused(self):
        ui, h = self._ui_with_box()
        w = ui.nodes.borrow(h)
        r = w.actual_rect
        ui.process_os_event({"type": "click", "x": r.x + 2, "y": r.y + 2})
        cmds = ui.draw()
        carets = [c for c in cmds if c.kind == "rect" and c.bounds.w == 1.0]
        assert carets, "focused textbox must draw a caret"


class TestInspectorEditing:
    """Inspector edit round-trip driven by synthetic key events
    (fyrox-ui inspector/ + text_box.rs; VERDICT round-2 item 7)."""

    def test_type_value_and_commit(self):
        import dataclasses
        from fyrox_tpu.ui import UserInterface
        from fyrox_tpu.ui.inspector import Inspector

        @dataclasses.dataclass
        class Settings:
            speed: float = 1.5
            count: int = 3
            name: str = "bot"

        ui = UserInterface((300, 200))
        ins = Inspector(ui, Settings())
        ui.update_layout()
        vw = ins._value_widgets["speed"]
        r = ui.nodes.borrow(vw).actual_rect
        # click into the speed cell, select-all via Home..shift-End,
        # type a new value, commit with Enter
        ui.process_os_event({"type": "click", "x": r.x + 3, "y": r.y + 3})
        assert ui.focus == vw
        ui.process_os_event({"type": "key", "key": "Home"})
        ui.process_os_event({"type": "key", "key": "End", "shift": True})
        for ch in "4.25":
            ui.process_os_event({"type": "key", "key": "Char", "char": ch})
        ui.process_os_event({"type": "key", "key": "Enter"})
        assert ins.target.speed == 4.25
        assert ui.nodes.borrow(vw).text == "4.25"
        # int field: committing '7' coerces to int
        vw2 = ins._value_widgets["count"]
        r2 = ui.nodes.borrow(vw2).actual_rect
        ui.process_os_event({"type": "click", "x": r2.x + 3, "y": r2.y + 3})
        ui.process_os_event({"type": "key", "key": "Home"})
        ui.process_os_event({"type": "key", "key": "End", "shift": True})
        ui.process_os_event({"type": "key", "key": "Char", "char": "7"})
        ui.process_os_event({"type": "key", "key": "Enter"})
        assert ins.target.count == 7 and isinstance(ins.target.count, int)
        # invalid input restores the display, value untouched
        ui.process_os_event({"type": "click", "x": r2.x + 3, "y": r2.y + 3})
        ui.process_os_event({"type": "key", "key": "Home"})
        ui.process_os_event({"type": "key", "key": "End", "shift": True})
        ui.process_os_event({"type": "key", "key": "Char", "char": "x"})
        ui.process_os_event({"type": "key", "key": "Enter"})
        assert ins.target.count == 7
        assert ui.nodes.borrow(vw2).text == "7"
