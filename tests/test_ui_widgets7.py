"""UI widget tranche 7: navigation (Tab focus), hotkeys, thumb drag,
selector, vec editor, property animations.

Reference behaviors: fyrox-ui/src/navigation.rs (keyboard traversal),
key.rs (HotKey), thumb.rs (drag grip), selector.rs (item cycler),
vec.rs (VecEditor), animation.rs (property animations).
"""
import pytest

from fyrox_tpu.ui.core import Rect, UiMessage, UserInterface, Widget


def drain(ui):
    out = []
    while True:
        m = ui.poll_message()
        if m is None:
            return out
        out.append(m)


class TestNavigation:
    def test_tab_cycles_focus_in_tree_order(self):
        ui = UserInterface(screen_size=(200, 200))
        stack = ui.add(Widget(kind="stack"))
        b1 = ui.add(Widget(kind="button", text="a"), stack)
        tb = ui.add(Widget(kind="textbox", text="hi"), stack)
        b2 = ui.add(Widget(kind="button", text="b"), stack)
        ui.update_layout()
        ui.process_os_event({"type": "key", "key": "Tab"})
        assert ui.focus == b1
        ui.process_os_event({"type": "key", "key": "Tab"})
        assert ui.focus == tb
        ui.process_os_event({"type": "key", "key": "Tab"})
        assert ui.focus == b2
        ui.process_os_event({"type": "key", "key": "Tab"})
        assert ui.focus == b1          # cyclic
        ui.process_os_event({"type": "key", "key": "Tab", "shift": True})
        assert ui.focus == b2          # reverse
        msgs = [m for m in drain(ui) if m.data.get("type") == "focused"]
        assert len(msgs) == 5

    def test_invisible_widgets_skipped(self):
        ui = UserInterface(screen_size=(200, 200))
        stack = ui.add(Widget(kind="stack"))
        ui.add(Widget(kind="button", visible=False), stack)
        b2 = ui.add(Widget(kind="button"), stack)
        ui.update_layout()
        ui.focus_next()
        assert ui.focus == b2


class TestHotkeys:
    def test_hotkey_fires_without_focus(self):
        ui = UserInterface()
        hits = []
        ui.bind_hotkey("s", lambda u: hits.append("save"), ctrl=True)
        ui.process_os_event({"type": "key", "key": "s", "ctrl": True})
        assert hits == ["save"]
        assert any(m.data.get("type") == "hotkey" for m in drain(ui))

    def test_focused_textbox_consumes_plain_keys_not_ctrl(self):
        ui = UserInterface()
        tb = ui.add(Widget(kind="textbox", text=""))
        ui.update_layout()
        ui.focus = tb
        hits = []
        ui.bind_hotkey("x", lambda u: hits.append("plain"))
        ui.bind_hotkey("x", lambda u: hits.append("ctrl"), ctrl=True)
        ui.process_os_event({"type": "key", "key": "x"})   # typed into box
        assert hits == []
        assert ui.nodes.borrow(tb).text == "x"
        ui.process_os_event({"type": "key", "key": "x", "ctrl": True})
        assert hits == ["ctrl"]


class TestThumb:
    def test_drag_moves_and_emits_delta(self):
        ui = UserInterface(screen_size=(200, 200))
        th = ui.add(Widget(kind="thumb", float_pos=(50.0, 50.0)))
        ui.update_layout()
        r = ui.nodes.borrow(th).actual_rect
        ui.process_os_event({"type": "drag", "x": r.x + 4, "y": r.y + 4,
                             "dx": 10.0, "dy": -5.0})
        w = ui.nodes.borrow(th)
        assert w.float_pos == (60.0, 45.0)
        msgs = [m for m in drain(ui) if m.data.get("type") == "drag_delta"]
        assert msgs and msgs[0].data["dx"] == 10.0


class TestSelector:
    def test_arrows_cycle_items(self):
        ui = UserInterface(screen_size=(300, 100))
        sel = ui.add(Widget(kind="selector", items=["low", "med", "high"],
                            selected=0))
        ui.update_layout()
        r = ui.nodes.borrow(sel).actual_rect
        ui.process_os_event({"type": "click", "x": r.x + r.w - 2,
                             "y": r.y + 2})               # next
        assert ui.nodes.borrow(sel).selected == 1
        ui.process_os_event({"type": "click", "x": r.x + 2, "y": r.y + 2})
        assert ui.nodes.borrow(sel).selected == 0         # prev
        ui.process_os_event({"type": "click", "x": r.x + 2, "y": r.y + 2})
        assert ui.nodes.borrow(sel).selected == 2         # wraps
        msgs = [m for m in drain(ui)
                if m.data.get("type") == "selection_changed"]
        assert [m.data["item"] for m in msgs] == ["med", "low", "high"]

    def test_selector_draws_current_item(self):
        ui = UserInterface(screen_size=(300, 100))
        ui.add(Widget(kind="selector", items=["alpha", "beta"], selected=1))
        ui.update_layout()
        texts = [c.text for c in ui.draw() if c.kind == "text"]
        assert "beta" in texts and "<" in texts and ">" in texts


class TestVecEditor:
    def test_component_change_emits_vec_changed(self):
        ui = UserInterface(screen_size=(400, 100))
        vec = ui.add_vec_editor((1.0, 2.0, 3.0), step=0.5)
        ui.update_layout()
        assert ui.vec_value(vec) == (1.0, 2.0, 3.0)
        nums = [c for c in ui.nodes.borrow(vec).children
                if ui.nodes.borrow(c).kind == "numeric"]
        r = ui.nodes.borrow(nums[1]).actual_rect
        # click the up-arrow zone of the y field
        ui.process_os_event({"type": "click", "x": r.x + r.w - 4,
                             "y": r.y + 2})
        assert ui.vec_value(vec) == (1.0, 2.5, 3.0)
        msgs = [m for m in drain(ui) if m.data.get("type") == "vec_changed"]
        assert msgs and msgs[-1].data["value"] == (1.0, 2.5, 3.0)


class TestAnimations:
    def test_scalar_animation_reaches_target_and_completes(self):
        ui = UserInterface()
        pb = ui.add(Widget(kind="progress", progress=0.0))
        ui.animate(pb, "progress", 1.0, duration=1.0)
        ui.update(0.5)
        assert ui.nodes.borrow(pb).progress == pytest.approx(0.5)
        ui.update(0.6)
        assert ui.nodes.borrow(pb).progress == pytest.approx(1.0)
        assert any(m.data.get("type") == "anim_done" for m in drain(ui))
        ui.update(1.0)                 # finished anims are dropped
        assert ui.nodes.borrow(pb).progress == pytest.approx(1.0)

    def test_tuple_animation_and_easing(self):
        ui = UserInterface()
        t = ui.add(Widget(kind="text", text="x",
                          foreground=(0.0, 0.0, 0.0, 1.0)))
        ui.animate(t, "foreground", (1.0, 1.0, 1.0, 1.0), duration=2.0,
                   easing="smooth")
        ui.update(1.0)                 # midpoint: smoothstep(0.5) = 0.5
        fg = ui.nodes.borrow(t).foreground
        assert fg[0] == pytest.approx(0.5)
        ui.update(1.0)
        assert ui.nodes.borrow(t).foreground[0] == pytest.approx(1.0)

    def test_ease_in_slower_at_start(self):
        ui = UserInterface()
        pb = ui.add(Widget(kind="progress", progress=0.0))
        ui.animate(pb, "progress", 1.0, duration=1.0, easing="ease_in")
        ui.update(0.25)
        assert ui.nodes.borrow(pb).progress == pytest.approx(0.0625)
