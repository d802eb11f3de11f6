"""Reflect field paths + prefab inheritance deltas
(fyrox-core/src/reflect/mod.rs, variable.rs:41-44)."""
import dataclasses

import numpy as np
import pytest

from fyrox_tpu.core import reflect
from fyrox_tpu.io.inheritance import apply_deltas, compute_deltas
from fyrox_tpu.scene import SceneBuilder
from fyrox_tpu.render.mesh import make_cube


@dataclasses.dataclass
class Inner:
    value: float = 1.0
    items: list = dataclasses.field(default_factory=lambda: [1, 2, 3])


@dataclasses.dataclass
class Outer:
    name: str = "x"
    inner: Inner = dataclasses.field(default_factory=Inner)
    arr: np.ndarray = dataclasses.field(
        default_factory=lambda: np.asarray([1.0, 2.0, 3.0]))


class TestReflect:
    def test_get_path(self):
        o = Outer()
        assert reflect.get_path(o, "inner.value") == 1.0
        assert reflect.get_path(o, "inner.items[2]") == 3
        assert reflect.get_path(o, "arr[1]") == 2.0

    def test_set_path_is_functional(self):
        o = Outer()
        o2 = reflect.set_path(o, "inner.value", 9.0)
        assert o.inner.value == 1.0 and o2.inner.value == 9.0
        o3 = reflect.set_path(o, "arr[0]", 5.0)
        assert o.arr[0] == 1.0 and o3.arr[0] == 5.0
        o4 = reflect.set_path(o, "inner.items[1]", 42)
        assert o4.inner.items == [1, 42, 3]

    def test_enumerate_paths(self):
        paths = reflect.enumerate_paths(Outer(), max_depth=3)
        assert "inner.value" in paths
        assert "name" in paths

    def test_bad_path_raises(self):
        with pytest.raises(ValueError):
            reflect.get_path(Outer(), "inner..[x]")


def _prefab():
    sb = SceneBuilder()
    root = sb.add_pivot("root")
    sb.add_mesh(make_cube(1.0), name="box", parent=root,
                position=(1.0, 0.0, 0.0))
    return sb


class TestInheritance:
    def test_delta_captures_only_modifications(self):
        prefab_sb = _prefab()
        prefab = prefab_sb.build()
        inst_sb = SceneBuilder()
        off = inst_sb.instantiate(prefab_sb) + 1   # +1: the instance pivot
        inst = inst_sb.build()
        # unmodified instance: no deltas
        assert compute_deltas(prefab, inst, off) == {}
        # author moves the box
        inst.init_position[off + 1] = (9.0, 9.0, 9.0)
        d = compute_deltas(prefab, inst, off)
        assert list(d.keys()) == [1]
        assert list(d[1].keys()) == ["init_position"]

    def test_prefab_edit_propagates_except_overrides(self):
        prefab_sb = _prefab()
        prefab = prefab_sb.build()
        inst_sb = SceneBuilder()
        off = inst_sb.instantiate(prefab_sb) + 1
        inst = inst_sb.build()
        inst.init_position[off + 1] = (9.0, 9.0, 9.0)
        deltas = compute_deltas(prefab, inst, off)

        # the prefab author later moves root AND the box; re-instantiate
        prefab_sb2 = _prefab()
        prefab_sb2._nodes[0].position = np.asarray([0.0, 5.0, 0.0], np.float32)
        prefab_sb2._nodes[1].position = np.asarray([2.0, 0.0, 0.0], np.float32)
        inst_sb2 = SceneBuilder()
        off2 = inst_sb2.instantiate(prefab_sb2) + 1
        merged = apply_deltas(inst_sb2.build(), deltas, off2)
        # root picked up the prefab edit (not overridden)…
        np.testing.assert_allclose(merged.init_position[off2], [0, 5, 0])
        # …but the box keeps the author's override, not the prefab's new value
        np.testing.assert_allclose(merged.init_position[off2 + 1], [9, 9, 9])
