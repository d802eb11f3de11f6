"""Docking manager (fyrox-ui/src/dock/) + curve editor (fyrox-ui/src/curve/)."""
import numpy as np

from fyrox_tpu.ui.core import UserInterface, Widget
from fyrox_tpu.ui.dock import DockingManager
from fyrox_tpu.ui import curve_editor as ce


def make_window(ui, name):
    return ui.add(Widget(kind="window", name=name, title=name))


class TestDocking:
    def test_dock_single_window_fills_root(self):
        ui = UserInterface((800, 600))
        dm = DockingManager(ui)
        w = make_window(ui, "A")
        ui.nodes.borrow(w).parent = ui.root  # starts floating
        dm.dock(w)
        ui.update_layout()
        r = ui.nodes.borrow(w).actual_rect
        assert r.w > 700 and r.h > 500
        assert dm.tile_of(w) is not None

    def test_side_dock_splits_space(self):
        ui = UserInterface((800, 600))
        dm = DockingManager(ui)
        a = make_window(ui, "A")
        b = make_window(ui, "B")
        dm.dock(a)
        dm.dock(b, side="right", ratio=0.25)
        ui.update_layout()
        ra = ui.nodes.borrow(a).actual_rect
        rb = ui.nodes.borrow(b).actual_rect
        assert ra.x < rb.x                       # A left, B right
        assert abs(rb.w - 0.25 * 800) < 30      # ~quarter width
        assert set(dm.windows()) == {a, b}

    def test_vertical_dock_and_ratio_drag(self):
        ui = UserInterface((800, 600))
        dm = DockingManager(ui)
        a = make_window(ui, "A")
        b = make_window(ui, "B")
        dm.dock(a)
        dm.dock(b, side="bottom", ratio=0.5)
        ui.update_layout()
        rb1 = ui.nodes.borrow(b).actual_rect.h
        dm.set_ratio(dm.root, 0.8)               # drag the splitter down
        ui.update_layout()
        rb2 = ui.nodes.borrow(b).actual_rect.h
        assert rb2 < rb1                          # bottom pane shrank

    def test_undock_collapses_split(self):
        ui = UserInterface((800, 600))
        dm = DockingManager(ui)
        a = make_window(ui, "A")
        b = make_window(ui, "B")
        dm.dock(a)
        dm.dock(b, side="left")
        dm.undock(b)
        ui.update_layout()
        # b floats at root again; the split collapsed so a fills the dock
        assert ui.nodes.borrow(b).parent == ui.root
        ra = ui.nodes.borrow(a).actual_rect
        assert ra.w > 700
        assert ui.nodes.borrow(dm.root).split == "content"


class TestCurveEditor:
    def keys(self):
        return [(0.0, 0.0, 0.0), (1.0, 2.0, 0.0), (2.0, 0.0, 0.0)]

    def test_roundtrip_transform(self):
        ui = UserInterface((400, 300))
        h = ce.add_curve_editor(ui, self.keys())
        ui.update_layout()
        w = ui.nodes.borrow(h)
        px, py = ce.curve_to_screen(w, 1.3, 0.7)
        t, v = ce.screen_to_curve(w, px, py)
        assert abs(t - 1.3) < 1e-6 and abs(v - 0.7) < 1e-6

    def test_hit_select_move_messages(self):
        ui = UserInterface((400, 300))
        h = ce.add_curve_editor(ui, self.keys())
        ui.update_layout()
        w = ui.nodes.borrow(h)
        px, py = ce.curve_to_screen(w, 1.0, 2.0)
        i = ce.hit_test_key(w, px + 2, py - 2)
        assert i == 1
        ce.select_key(ui, h, i)
        ce.move_key(ui, h, i, 1.0, 3.0)
        assert w.curve_keys[1][1] == 3.0
        kinds = []
        while True:
            m = ui.poll_message()
            if m is None:
                break
            kinds.append(m.data["kind"])
        assert "key_selected" in kinds and "key_moved" in kinds

    def test_add_remove_keep_sorted(self):
        ui = UserInterface((400, 300))
        h = ce.add_curve_editor(ui, self.keys())
        w = ui.nodes.borrow(h)
        idx = ce.add_key(ui, h, 0.5, 1.0)
        assert idx == 1
        assert [k[0] for k in w.curve_keys] == [0.0, 0.5, 1.0, 2.0]
        ce.remove_key(ui, h, 0)
        assert w.curve_keys[0][0] == 0.5

    def test_hermite_matches_core_curve(self):
        from fyrox_tpu.core.curve import pack_curves, sample
        import jax.numpy as jnp
        keys = [(0.0, 0.0, 1.0), (1.0, 2.0, -0.5), (2.0, 1.0, 0.0)]
        CUBIC = 2
        cs = pack_curves([[dict(time=t, value=v, kind=CUBIC, lt=m, rt=m)
                           for t, v, m in keys]])
        for t in (0.0, 0.3, 0.99, 1.5, 2.0):
            a = ce.sample_keys(keys, t)
            b = float(sample(cs, jnp.asarray(t))[0])
            assert abs(a - b) < 1e-4, (t, a, b)

    def test_draw_and_zoom_pan(self):
        ui = UserInterface((400, 300))
        h = ce.add_curve_editor(ui, self.keys())
        ui.update_layout()
        w = ui.nodes.borrow(h)
        cmds = ui.draw()
        assert sum(1 for c in cmds if c.kind == "rect") > 10
        before = ce.curve_to_screen(w, 1.0, 0.0)[0]
        ce.zoom(w, 2.0)
        after = ce.curve_to_screen(w, 1.0, 0.0)[0]
        assert after > before                  # zoomed in
        ce.pan(w, -50.0, 0.0)
        panned = ce.curve_to_screen(w, 1.0, 0.0)[0]
        assert panned < after
