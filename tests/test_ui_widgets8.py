"""UI widget tranche 8: BBCode, log panel, rect/matrix editors, path
editor, dropdown-menu helper.

Reference behaviors: fyrox-ui/src/bbcode.rs (markup runs), log.rs
(severity rows), rect.rs/matrix.rs (field editors), path.rs
(PathEditor), dropdown_menu.rs.
"""
import numpy as np
import pytest

from fyrox_tpu.ui.core import Rect, UserInterface, Widget
from fyrox_tpu.ui.text import parse_bbcode


def drain(ui):
    out = []
    while True:
        m = ui.poll_message()
        if m is None:
            return out
        out.append(m)


class TestBBCode:
    def test_plain_and_runs(self):
        plain, runs = parse_bbcode("a[b]bold[/b] [color=#ff0000]red[/color]")
        assert plain == "abold red"
        assert runs[0] == (0, 1, {})
        assert runs[1] == (1, 5, {"bold": True})
        # the space between tags is an unstyled run
        styles = [s for _, _, s in runs]
        assert {"color": (1.0, 0.0, 0.0, 1.0)} in styles

    def test_nested_and_unbalanced(self):
        plain, runs = parse_bbcode("[b][i]x[/i][/b][/b]lit[unknown]t")
        assert plain == "x[/b]lit[unknown]t"
        assert runs[0][2] == {"bold": True, "italic": True}

    def test_named_color_and_size(self):
        _, runs = parse_bbcode("[color=red][size=20]big[/size][/color]")
        st = runs[0][2]
        assert st["color"] == (1.0, 0.2, 0.2, 1.0)
        assert st["size"] == 20.0

    def test_widget_draws_colored_segments(self):
        ui = UserInterface(screen_size=(400, 100))
        ui.add(Widget(kind="bbcode",
                      text="no[color=#00ff00]go[/color]\nrow2"))
        ui.update_layout()
        texts = [(c.text, tuple(np.round(c.color, 2)))
                 for c in ui.draw() if c.kind == "text"]
        segs = [t for t, _ in texts]
        assert "no" in segs and "go" in segs and "row2" in segs
        green = dict(texts)["go"]
        assert green[1] == 1.0 and green[0] == 0.0


class TestLogPanel:
    def test_push_filter_and_ring(self):
        ui = UserInterface(screen_size=(300, 200))
        lg = ui.add(Widget(kind="log", width=280.0, height=100.0,
                           log_capacity=3))
        for i in range(5):
            ui.log_push(lg, 0, f"info {i}")
        ui.log_push(lg, 2, "boom")
        w = ui.nodes.borrow(lg)
        assert len(w.log_entries) == 3                  # ring capacity
        assert w.log_entries[-1] == (2, "boom")
        ui.update_layout()
        rows = [c.text for c in ui.draw() if c.kind == "text"]
        assert "boom" in rows
        # severity filter hides info rows
        w.log_filter = 2
        rows = [c.text for c in ui.draw() if c.kind == "text"]
        assert rows == ["boom"]

    def test_error_rows_colored(self):
        ui = UserInterface(screen_size=(300, 200))
        lg = ui.add(Widget(kind="log", width=280.0, height=100.0))
        ui.log_push(lg, 2, "err")
        ui.update_layout()
        cmd = [c for c in ui.draw() if c.kind == "text"][0]
        assert cmd.color[0] == 1.0 and cmd.color[1] < 0.5


class TestFieldEditors:
    def test_rect_editor_labels_and_change(self):
        ui = UserInterface(screen_size=(500, 100))
        re_ = ui.add_rect_editor((1.0, 2.0, 30.0, 40.0))
        ui.update_layout()
        assert ui.vec_value(re_) == (1.0, 2.0, 30.0, 40.0)
        labels = [ui.nodes.borrow(c).text
                  for c in ui.nodes.borrow(re_).children
                  if ui.nodes.borrow(c).kind == "text"]
        assert labels == ["x", "y", "w", "h"]

    def test_matrix_editor_round_trip(self):
        ui = UserInterface(screen_size=(500, 200))
        m = ui.add_matrix_editor(((1.0, 2.0), (3.0, 4.0)))
        ui.update_layout()
        assert ui.matrix_value(m) == ((1.0, 2.0), (3.0, 4.0))


class TestPathEditor:
    def test_commit_emits_path_changed(self):
        ui = UserInterface(screen_size=(400, 200))
        pe = ui.add_path_editor("/tmp/x.txt")
        ui.update_layout()
        tb = ui.nodes.borrow(pe).children[0]
        ui.focus = tb
        ui.process_os_event({"type": "key", "key": "Enter"})
        msgs = [m for m in drain(ui)
                if m.data.get("type") == "path_changed"]
        assert msgs and msgs[-1].data["path"] == "/tmp/x.txt"

    def test_browse_pick_sets_text(self, tmp_path):
        (tmp_path / "a.rgs").write_text("x")
        ui = UserInterface(screen_size=(400, 300))
        pe = ui.add_path_editor("", browse_dir=str(tmp_path))
        ui.update_layout()
        row = ui.nodes.borrow(pe)
        btn = row.children[1]
        r = ui.nodes.borrow(btn).actual_rect
        ui.process_os_event({"type": "click", "x": r.x + 1, "y": r.y + 1})
        ui.update_layout()
        # find the browser list and click the file row
        fb = [h for h, w_ in ui.nodes.iter() if w_.kind == "filebrowser"][0]
        lst = [c for c in ui.nodes.borrow(fb).children
               if ui.nodes.borrow(c).kind == "list"][0]
        lw = ui.nodes.borrow(lst)
        idx = lw.items.index("a.rgs")
        lr = lw.actual_rect
        ui.process_os_event({"type": "click", "x": lr.x + 2,
                             "y": lr.y + (idx + 0.5) * lw.font_size * 1.4})
        msgs = [m for m in drain(ui)
                if m.data.get("type") == "path_changed"]
        assert msgs and msgs[-1].data["path"].endswith("a.rgs")
        tb = ui.nodes.borrow(row.children[0])
        assert tb.text.endswith("a.rgs")


class TestDropdownMenu:
    def test_button_opens_menu_and_selects(self):
        ui = UserInterface(screen_size=(300, 200))
        btn = ui.add(Widget(kind="button", text="File"))
        popup = ui.attach_dropdown_menu(btn, ["Open", "Save"])
        ui.update_layout()
        r = ui.nodes.borrow(btn).actual_rect
        ui.process_os_event({"type": "click", "x": r.x + 1, "y": r.y + 1})
        assert ui.nodes.borrow(popup).open
        ui.update_layout()
        items = [c for c in ui.nodes.borrow(popup).children
                 if ui.nodes.borrow(c).kind == "menu_item"]
        save = ui.nodes.borrow(items[1]).actual_rect
        ui.process_os_event({"type": "click", "x": save.x + 1,
                             "y": save.y + 1})
        msgs = [m for m in drain(ui)
                if m.data.get("type") == "menu_selected"
                and m.destination == btn]
        assert msgs and msgs[-1].data["item"] == "Save"
        assert not ui.nodes.borrow(popup).open
