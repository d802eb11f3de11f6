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
