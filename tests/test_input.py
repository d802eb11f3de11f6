"""Input aggregation tests."""
from fyrox_tpu.input import InputState


def test_key_lifecycle():
    s = InputState()
    s.process_event({"type": "key_down", "key": "w"})
    assert s.is_key_down("w") and s.was_key_pressed("w")
    s.end_frame()
    assert s.is_key_down("w") and not s.was_key_pressed("w")
    s.process_event({"type": "key_up", "key": "w"})
    assert not s.is_key_down("w") and "w" in s.keys_released


def test_mouse_delta_and_reset():
    s = InputState()
    s.process_event({"type": "mouse_move", "x": 10.0, "y": 5.0})
    s.process_event({"type": "mouse_move", "x": 13.0, "y": 5.0})
    assert s.mouse_delta == (3.0, 0.0)
    s.process_event({"type": "mouse_down", "button": 0})
    assert 0 in s.mouse_buttons
    s.end_frame()
    assert s.mouse_delta == (0.0, 0.0)
