"""Visitor (.rgs) format tests: synthetic round-trips + real reference
scene files (binary legacy RG3D, ASCII FTAX)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fyrox_tpu.io import load_scene, read_rgs, write_rgs
from fyrox_tpu.io.visitor import Field, VisitorNode
from fyrox_tpu.scene import graph, init_state

REF = "/root/reference"


class TestVisitorRoundtrip:
    def test_all_field_kinds(self):
        root = VisitorNode("__ROOT__")
        n = VisitorNode("Data")
        n.add("B", "bool", True)
        n.add("U8", "u8", 200).add("I8", "i8", -5)
        n.add("U16", "u16", 60000).add("I16", "i16", -30000)
        n.add("U32", "u32", 4000000000).add("I32", "i32", -2000000)
        n.add("U64", "u64", 2 ** 60).add("I64", "i64", -2 ** 60)
        n.add("F32", "f32", 1.5).add("F64", "f64", -2.25)
        n.add("V2", "vec2f32", np.asarray([1.0, 2.0]))
        n.add("V3", "vec3f32", np.asarray([1.0, 2.0, 3.0]))
        n.add("V4", "vec4f32", np.asarray([1.0, 2.0, 3.0, 4.0]))
        n.add("Q", "quat", np.asarray([0.0, 0.0, 0.0, 1.0]))
        n.add("M4", "mat4", np.arange(16, dtype=np.float32).reshape(4, 4))
        n.add("M3", "mat3", np.arange(9, dtype=np.float32).reshape(3, 3))
        n.add("Blob", "blob", b"hello")
        n.add("S", "string", "text")
        n.add("Pod", "pod", (3, 4, b"\x01\x02\x03\x04"))
        n.add("Id", "uuid", bytes(range(16)))
        root.children.append(n)
        child2 = VisitorNode("Second")
        child2.add("X", "f32", 9.0)
        n.children.append(child2)

        data = write_rgs(root)
        r2, ver = read_rgs(data)
        d = r2.child("Data")
        assert d.field_value("B") is True
        assert d.field_value("U64") == 2 ** 60
        np.testing.assert_allclose(d.field_value("M4"),
                                   np.arange(16).reshape(4, 4))
        assert d.field_value("S") == "text"
        assert d.field_value("Pod")[2] == b"\x01\x02\x03\x04"
        assert d.child("Second").field_value("X") == 9.0
        # writing again is byte-identical (stable serialization)
        assert write_rgs(r2) == data

    def test_child_order_preserved(self):
        root = VisitorNode("__ROOT__")
        for i in range(5):
            root.children.append(VisitorNode(f"c{i}"))
        r2, _ = read_rgs(write_rgs(root))
        assert [c.name for c in r2.children] == [f"c{i}" for i in range(5)]


class TestReferenceScenes:
    @pytest.mark.parametrize("path,min_nodes", [
        (f"{REF}/examples/data/navmesh_scene.rgs", 5),
        (f"{REF}/template-core/src/3d.rgs", 4),
        (f"{REF}/template-core/src/2d.rgs", 3),
        (f"{REF}/test_output/root.rgs", 2),
    ])
    def test_loads_and_steps(self, path, min_nodes):
        t = load_scene(path)
        assert t.num_nodes >= min_nodes
        s = init_state(t, 2)
        s = graph.update_hierarchical_data(s, t)
        assert bool(jnp.all(jnp.isfinite(s.globals_)))

    def test_template_scene_has_named_camera(self):
        t = load_scene(f"{REF}/template-core/src/3d.rgs")
        assert "Camera" in t.names or any("amera" in n for n in t.names), t.names


class TestSceneTools:
    """Scene inspect/diff CLI (fyrox_tpu/tools.py) over real .rgs files."""

    def test_inspect_real_reference_scene(self):
        import io as _io
        from fyrox_tpu.tools import inspect_scene
        t = load_scene("/root/reference/examples/data/navmesh_scene.rgs")
        buf = _io.StringIO()
        inspect_scene(t, out=buf)
        text = buf.getvalue()
        assert "nodes" in text.splitlines()[0]
        assert "<" in text              # node type tags printed

    def test_diff_detects_change(self):
        import io as _io
        import numpy as np
        from fyrox_tpu.tools import diff_scenes
        a = load_scene("/root/reference/examples/data/navmesh_scene.rgs")
        b = load_scene("/root/reference/examples/data/navmesh_scene.rgs")
        buf = _io.StringIO()
        assert diff_scenes(a, b, out=buf) == 0
        b.init_position[1] = b.init_position[1] + 1.0
        buf = _io.StringIO()
        n = diff_scenes(a, b, out=buf)
        assert n == 1 and "init_position" in buf.getvalue()
