"""UI widget tranche 3 (VERDICT r3 #8): menu/popup, list view + dropdown,
progress bar + slider, nine-patch.

Reference per-widget behavior: fyrox-ui/src/{menu.rs, popup.rs,
list_view.rs, dropdown_list.rs, progress_bar.rs, range.rs, nine_patch.rs};
test style mirrors fyrox-ui's per-widget logic tests.
"""
import numpy as np

from fyrox_tpu.ui.core import Rect, UserInterface, Widget


def _drain(ui):
    out = []
    while True:
        m = ui.poll_message()
        if m is None:
            return out
        out.append(m)


def _click(ui, x, y):
    ui.process_os_event({"type": "click", "x": x, "y": y})


class TestMenu:
    def _menu(self):
        ui = UserInterface((400, 300))
        menu = ui.add(Widget(kind="menu", width=400, height=24))
        file_item = ui.add(Widget(kind="menu_item", text="FILE"), menu)
        edit_item = ui.add(Widget(kind="menu_item", text="EDIT"), menu)
        new_item = ui.add(Widget(kind="menu_item", text="NEW"), file_item)
        quit_item = ui.add(Widget(kind="menu_item", text="QUIT"), file_item)
        ui.add(Widget(kind="menu_item", text="UNDO"), edit_item)
        ui.update_layout()
        return ui, menu, file_item, edit_item, new_item, quit_item

    def test_click_opens_submenu_below(self):
        ui, menu, file_item, *_ = self._menu()
        fr = ui.nodes.borrow(file_item).actual_rect
        _click(ui, fr.x + 2, fr.y + 2)
        w = ui.nodes.borrow(file_item)
        assert w.open
        sub = ui.nodes.borrow(w.children[0]).actual_rect
        assert sub.y >= fr.y + fr.h - 1          # below the bar
        assert sub.w > 0 and sub.h > 0

    def test_leaf_click_emits_menu_selected_and_closes(self):
        ui, menu, file_item, edit_item, new_item, _ = self._menu()
        fr = ui.nodes.borrow(file_item).actual_rect
        _click(ui, fr.x + 2, fr.y + 2)
        _drain(ui)
        nr = ui.nodes.borrow(new_item).actual_rect
        _click(ui, nr.x + 2, nr.y + 2)
        msgs = [m for m in _drain(ui) if m.data.get("type") == "menu_selected"]
        assert msgs and msgs[0].data["item"] == "NEW"
        assert not ui.nodes.borrow(file_item).open

    def test_opening_sibling_closes_other(self):
        ui, menu, file_item, edit_item, *_ = self._menu()
        fr = ui.nodes.borrow(file_item).actual_rect
        er = ui.nodes.borrow(edit_item).actual_rect
        _click(ui, fr.x + 2, fr.y + 2)
        _click(ui, er.x + 2, er.y + 2)
        assert not ui.nodes.borrow(file_item).open
        assert ui.nodes.borrow(edit_item).open


class TestPopup:
    def test_open_at_position_and_click_away_closes(self):
        ui = UserInterface((400, 300))
        pop = ui.add(Widget(kind="popup"))
        ui.add(Widget(kind="text", text="CTX"), pop)
        ui.update_layout()
        assert ui.nodes.borrow(pop).actual_rect.w == 0
        ui.open_popup(pop, 120, 80)
        r = ui.nodes.borrow(pop).actual_rect
        assert (r.x, r.y) == (120, 80) and r.w > 0
        cmds = ui.draw()
        assert any(c.kind == "text" and c.text == "CTX" for c in cmds)
        _click(ui, 390, 290)                     # click-away
        assert not ui.nodes.borrow(pop).open


class TestListView:
    def test_click_selects_row_and_messages(self):
        ui = UserInterface((300, 300))
        lst = ui.add(Widget(kind="list", items=["A", "B", "C"],
                            width=100))
        ui.update_layout()
        r = ui.nodes.borrow(lst).actual_rect
        row_h = ui.nodes.borrow(lst).font_size * 1.4
        _click(ui, r.x + 5, r.y + row_h * 1.5)   # row 1
        w = ui.nodes.borrow(lst)
        assert w.selected == 1
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "selection_changed"]
        assert msgs and msgs[0].data["item"] == "B"
        # selected row highlighted in draw output
        cmds = ui.draw()
        assert any(c.kind == "rect" and abs(c.bounds.y - (r.y + row_h)) < 1
                   for c in cmds)


class TestDropdown:
    def test_open_select_close(self):
        ui = UserInterface((300, 300))
        dd = ui.add(Widget(kind="dropdown", items=["ONE", "TWO", "THREE"],
                           width=120, selected=0))
        ui.update_layout()
        r = ui.nodes.borrow(dd).actual_rect
        _click(ui, r.x + 5, r.y + 5)             # open
        w = ui.nodes.borrow(dd)
        assert w.open and w.children
        lst = w.children[0]
        lr = ui.nodes.borrow(lst).actual_rect
        assert lr.y >= r.y + r.h - 1             # rows below the box
        row_h = ui.nodes.borrow(lst).font_size * 1.4
        _click(ui, lr.x + 5, lr.y + row_h * 2.5)  # pick THIRD row
        w = ui.nodes.borrow(dd)
        assert w.selected == 2 and not w.open
        msgs = [m for m in _drain(ui)
                if m.data.get("type") == "selection_changed"
                and m.destination == dd]
        assert msgs and msgs[0].data["item"] == "THREE"
        # closed box now shows the new selection
        cmds = ui.draw()
        assert any(c.kind == "text" and c.text.startswith("THREE")
                   for c in cmds)


class TestProgressSlider:
    def test_progress_fill_width(self):
        ui = UserInterface((200, 100))
        pr = ui.add(Widget(kind="progress", width=100, progress=0.25))
        ui.update_layout()
        cmds = ui.draw()
        r = ui.nodes.borrow(pr).actual_rect
        fills = [c for c in cmds if c.kind == "rect"
                 and abs(c.bounds.w - r.w * 0.25) < 0.5]
        assert fills

    def test_slider_click_sets_value_and_messages(self):
        ui = UserInterface((200, 100))
        sl = ui.add(Widget(kind="slider", width=100, min_value=0.0,
                           max_value=10.0))
        ui.update_layout()
        r = ui.nodes.borrow(sl).actual_rect
        _click(ui, r.x + r.w * 0.8, r.y + r.h / 2)
        w = ui.nodes.borrow(sl)
        assert abs(w.value - 8.0) < 0.3, w.value
        msgs = [m for m in _drain(ui) if m.data.get("type") == "value_changed"]
        assert msgs and abs(msgs[0].data["value"] - w.value) < 1e-9


class TestNinePatch:
    def test_child_inset_by_border_and_frame_drawn(self):
        ui = UserInterface((200, 200))
        np_ = ui.add(Widget(kind="ninepatch", width=100, height=60,
                            patch_border=10))
        inner = ui.add(Widget(kind="text", text="HI"), np_)
        ui.update_layout()
        outer_r = ui.nodes.borrow(np_).actual_rect
        inner_r = ui.nodes.borrow(inner).actual_rect
        assert inner_r.x == outer_r.x + 10
        assert inner_r.y == outer_r.y + 10
        assert inner_r.w == outer_r.w - 20
        cmds = [c for c in ui.draw() if c.kind == "rect"]
        # 1 center + 4 edge strips at 10px thickness
        strips = [c for c in cmds if c.bounds.h == 10 or c.bounds.w == 10]
        assert len(strips) >= 4

    def test_measure_adds_margins(self):
        ui = UserInterface((200, 200))
        np_ = ui.add(Widget(kind="ninepatch", patch_border=8))
        ui.add(Widget(kind="text", text="ABCD", font_size=10), np_)
        ui.update_layout()
        w = ui.nodes.borrow(np_)
        assert w.desired_size[0] >= 4 * 10 * 0.55 + 16
        assert w.desired_size[1] >= 10 * 1.3 + 16
