"""ABSM + animation editor panels (ui/absm_editor.py, ui/anim_editor.py).

Reference behavior: editor/src/plugins/absm/ (state graph commands,
preview) and editor/src/plugins/animation/ (dopesheet/track commands).
"""
import numpy as np
import pytest

from fyrox_tpu.ui.absm_editor import AbsmDocument, AbsmEditor
from fyrox_tpu.ui.anim_editor import (POSITION, ROTATION, AnimationEditor)


# ---------------------------------------------------------------- ABSM

def _two_state_editor():
    ed = AbsmEditor()
    p = ed.add_parameter("run")
    idle = ed.add_state("idle", clips=((0, 1.0),), position=(0, 0))
    run = ed.add_state("run", clips=((1, 1.0),), position=(200, 0))
    ed.add_transition(idle, run, p, duration=0.1)
    ed.add_transition(run, idle, p, duration=0.1, invert=True)
    return ed, idle, run


def test_absm_document_commands_and_undo():
    ed, idle, run = _two_state_editor()
    assert [s.name for s in ed.doc.states] == ["idle", "run"]
    assert len(ed.doc.transitions) == 2

    ed.move_state(run, (250.0, 40.0))
    assert ed.doc.states[run].position == (250.0, 40.0)
    assert ed.undo() == "Move State 1"
    assert ed.doc.states[run].position == (200.0, 0.0)
    assert ed.redo() == "Move State 1"
    assert ed.doc.states[run].position == (250.0, 40.0)

    ed.rename_state(idle, "Idle")
    assert ed.doc.states[idle].name == "Idle"
    names = [n for n, _ in ed.stack.history()]
    assert "Add State 'idle'" in names and "Add Transition 0->1" in names


def test_absm_remove_state_shifts_indices():
    ed = AbsmEditor()
    p = ed.add_parameter("go")
    a = ed.add_state("a")
    b = ed.add_state("b")
    c = ed.add_state("c")
    ed.add_transition(a, b, p)
    ed.add_transition(b, c, p)
    ed.set_entry(b)
    ed.remove_state(a)
    # b,c shift to 0,1; the a->b transition is gone
    assert [s.name for s in ed.doc.states] == ["b", "c"]
    assert len(ed.doc.transitions) == 1
    assert (ed.doc.transitions[0].src, ed.doc.transitions[0].dst) == (0, 1)
    assert ed.doc.entry == 0


def test_absm_problems_reports_unreachable():
    ed = AbsmEditor()
    p = ed.add_parameter("x")
    ed.add_state("a")
    ed.add_state("island")
    probs = ed.problems()
    assert any("unreachable" in m for m in probs)
    ed.add_transition(0, 1, p)
    assert ed.problems() == []


def test_absm_compile_and_preview_transitions():
    ed, idle, run = _two_state_editor()
    mt = ed.compile()
    assert mt.num_states == 2 and mt.num_transitions == 2
    assert mt.param_names == ["run"]
    # hold run=True for 30 frames -> machine settles in state 1, then
    # run=False returns it to state 0 (the editor preview trace)
    rows = [[True]] * 30 + [[False]] * 30
    trace = ed.preview(rows)
    assert trace[29] == run
    assert trace[-1] == idle


# ---------------------------------------------------- animation editor

def test_anim_editor_keys_and_undo():
    ed = AnimationEditor()
    c = ed.add_clip("walk", length=2.0)
    t = ed.add_track(c, node=3, kind=POSITION)
    ed.add_key(c, t, 0, 0.0, 0.0)
    k = ed.add_key(c, t, 0, 1.0, 4.0)
    ed.add_key(c, t, 0, 0.5, 1.0)   # inserts in sorted position
    ch = ed.doc.clips[c].tracks[t].channels[0]
    assert [kk[0] for kk in ch] == [0.0, 0.5, 1.0]

    ed.move_key(c, t, 0, 1, 0.75, 2.0)
    ch = ed.doc.clips[c].tracks[t].channels[0]
    assert [kk[0] for kk in ch] == [0.0, 0.75, 1.0]
    ed.delete_key(c, t, 0, 1)
    assert len(ed.doc.clips[c].tracks[t].channels[0]) == 2
    assert ed.undo() == "Delete Key 1"
    assert len(ed.doc.clips[c].tracks[t].channels[0]) == 3
    assert k == 1  # add_key returned the sorted index at insert time


def test_anim_editor_dopesheet_rows():
    ed = AnimationEditor()
    c = ed.add_clip("walk")
    t = ed.add_track(c, node=1, kind=POSITION)
    ed.add_key(c, t, 0, 0.0, 0.0)
    ed.add_key(c, t, 1, 0.25, 2.0)
    ed.add_key(c, t, 2, 0.25, 3.0)
    rows = ed.dopesheet(c)
    assert rows[0]["key_times"] == [0.0, 0.25]
    assert rows[0]["kind"] == POSITION


def test_anim_editor_compile_and_scrub():
    ed = AnimationEditor()
    c = ed.add_clip("lift", length=1.0)
    t = ed.add_track(c, node=2, kind=POSITION)
    # y channel ramps 0 -> 2 over 1s; x/z stay keyless (constant 0)
    ed.add_key(c, t, 1, 0.0, 0.0)
    ed.add_key(c, t, 1, 1.0, 2.0)
    aset = ed.compile()
    assert aset.num_animations == 1
    assert aset.pos_node.tolist() == [2]
    sampled = ed.scrub(0.5)
    y = float(np.asarray(sampled["position"][2])[0, 0, 1])
    assert y == pytest.approx(1.0, abs=1e-5)

    # disabled tracks drop out of the compiled set
    ed.set_track_enabled(c, t, False)
    aset2 = ed.compile()
    assert aset2.pos_node.size == 0


def test_anim_editor_rotation_track_compiles():
    ed = AnimationEditor()
    c = ed.add_clip("turn", length=1.0)
    t = ed.add_track(c, node=0, kind=ROTATION)
    ed.add_key(c, t, 1, 0.0, 0.0)
    ed.add_key(c, t, 1, 1.0, np.pi)
    aset = ed.compile()
    assert aset.rot_node.tolist() == [0]
    sampled = ed.scrub(1.0)
    # euler y=pi -> quaternion w ~ 0 (half-angle cos(pi/2))
    w = float(np.asarray(sampled["rotation"][2])[0, 0, 3])
    assert abs(w) < 1e-5
