"""FBX import tests: binary + ASCII document parsing and scene extraction
(fyrox-impl/src/resource/fbx/; auto-detection document/mod.rs:138-149).

No FBX fixtures ship with the reference, so the binary test WRITES a
spec-conformant Kaydara binary document (incl. a zlib-compressed array)
and round-trips it through the parser.
"""

import numpy as np

from fyrox_tpu.io.fbx import parse_fbx, load_fbx_scene, _triangulate_polys
from fyrox_tpu.scene.template import NodeType


# ---------------------------------------------------------------------------
# minimal binary FBX writer (test-only)
# ---------------------------------------------------------------------------

from fyrox_tpu.io.fbx import write_fbx as write_fbx_binary


def _cube_doc_nodes():
    verts = np.asarray([-1, -1, -1, 1, -1, -1, 1, 1, -1, -1, 1, -1,
                        -1, -1, 1, 1, -1, 1, 1, 1, 1, -1, 1, 1], np.float64)
    # two quads (negated last index per polygon)
    polys = np.asarray([0, 1, 2, -4, 4, 5, 6, -8], np.int32)
    normals = np.tile(np.asarray([0.0, 0.0, -1.0]), 8)
    geometry = ("Geometry", [100, "Geometry::cube", "Mesh"], [
        ("Vertices", [verts], []),
        ("PolygonVertexIndex", [polys], []),
        ("LayerElementNormal", [0], [
            ("MappingInformationType", ["ByVertice"], []),
            ("ReferenceInformationType", ["Direct"], []),
            ("Normals", [normals], []),
        ]),
    ])
    model_root = ("Model", [200, "Model::root", "Null"], [
        ("Properties70", [], [
            ("P", ["Lcl Translation", "", "", "", 1.0, 2.0, 3.0], []),
        ]),
    ])
    model_mesh = ("Model", [201, "Model::cube", "Mesh"], [
        ("Properties70", [], [
            ("P", ["Lcl Translation", "", "", "", 0.0, 5.0, 0.0], []),
            ("P", ["Lcl Rotation", "", "", "", 0.0, 90.0, 0.0], []),
        ]),
    ])
    conns = ("Connections", [], [
        ("C", ["OO", 100, 201], []),
        ("C", ["OO", 201, 200], []),
    ])
    return [("Objects", [], [geometry, model_root, model_mesh]), conns]


class TestBinaryDocument:
    def test_roundtrip_tree_and_arrays(self):
        data = write_fbx_binary(_cube_doc_nodes())
        doc = parse_fbx(data)
        objs = doc.child("Objects")
        assert objs is not None
        geo = objs.child("Geometry")
        v = geo.child("Vertices").properties[0]
        assert v.shape == (24,) and v.dtype == np.float64
        assert float(v[3]) == 1.0
        assert geo.child("LayerElementNormal").child(
            "MappingInformationType").prop(0) == "ByVertice"

    def test_scene_extraction(self):
        data = write_fbx_binary(_cube_doc_nodes())
        sb, names = load_fbx_scene(data)
        t = sb.build()
        assert "cube" in names and "root" in names
        cube = names["cube"]
        root = names["root"]
        assert t.parent[cube] == root
        assert t.node_type[cube] == NodeType.MESH
        mesh = t.meshes[t.payload[cube]]
        assert mesh.positions.shape == (8, 3)
        assert mesh.triangles.shape == (4, 3)     # two quads fan-split
        np.testing.assert_allclose(t.init_position[cube], [0, 5, 0])
        np.testing.assert_allclose(t.init_position[root], [1, 2, 3])
        # 90 deg about Y
        q = t.init_rotation[cube]
        np.testing.assert_allclose(abs(q[1]), np.sin(np.pi / 4), atol=1e-5)


ASCII_DOC = """
; ASCII FBX test fixture
Objects:  {
    Geometry: 300, "Geometry::tri", "Mesh" {
        Vertices: *9 {
            a: 0,0,0, 1,0,0, 0,1,0
        }
        PolygonVertexIndex: *3 {
            a: 0,1,-3
        }
    }
    Model: 400, "Model::tri", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "", "", "", 7.0, 0.0, 0.0
        }
    }
}
Connections:  {
    C: "OO", 300, 400
}
"""


class TestAsciiDocument:
    def test_ascii_parse_and_extract(self):
        sb, names = load_fbx_scene(ASCII_DOC.encode())
        t = sb.build()
        tri = names["tri"]
        mesh = t.meshes[t.payload[tri]]
        assert mesh.positions.shape == (3, 3)
        assert mesh.triangles.shape == (1, 3)
        np.testing.assert_allclose(t.init_position[tri], [7, 0, 0])


class TestPolygonDecoding:
    def test_fan_triangulation(self):
        tris = _triangulate_polys([0, 1, 2, 3, -5])   # pentagon
        assert tris.shape == (3, 3)
        np.testing.assert_array_equal(tris[0], [0, 1, 2])
        np.testing.assert_array_equal(tris[-1], [0, 3, 4])


class TestSkinsAndAnimations:
    def _doc_with_skin(self):
        verts = np.asarray([0, 0, 0, 1, 0, 0, 2, 0, 0], np.float64)
        polys = np.asarray([0, 1, -3], np.int32)
        geometry = ("Geometry", [10, "Geometry::m", "Mesh"], [
            ("Vertices", [verts], []),
            ("PolygonVertexIndex", [polys], []),
        ])
        skin = ("Deformer", [20, "Deformer::s", "Skin"], [])
        bind = np.eye(4).reshape(-1)
        cl0 = ("Deformer", [21, "SubDeformer::c0", "Cluster"], [
            ("Indexes", [np.asarray([0, 1], np.int32)], []),
            ("Weights", [np.asarray([1.0, 0.5], np.float64)], []),
            ("Transform", [bind], []),
        ])
        cl1 = ("Deformer", [22, "SubDeformer::c1", "Cluster"], [
            ("Indexes", [np.asarray([1, 2], np.int32)], []),
            ("Weights", [np.asarray([0.5, 1.0], np.float64)], []),
            ("Transform", [bind], []),
        ])
        bone0 = ("Model", [30, "Model::b0", "LimbNode"], [])
        bone1 = ("Model", [31, "Model::b1", "LimbNode"], [])
        curve_node = ("AnimationCurveNode", [40, "AnimCurveNode::T", ""], [])
        curve = ("AnimationCurve", [41, "AnimCurve::", ""], [
            ("KeyTime", [np.asarray([0, 46186158000], np.int64)], []),
            ("KeyValueFloat", [np.asarray([0.0, 2.5], np.float64)], []),
        ])
        conns = ("Connections", [], [
            ("C", ["OO", 20, 10], []),       # skin -> geometry
            ("C", ["OO", 21, 20], []),       # clusters -> skin
            ("C", ["OO", 22, 20], []),
            ("C", ["OO", 30, 21], []),       # bones -> clusters
            ("C", ["OO", 31, 22], []),
            ("C", ["OP", 40, 30, "Lcl Translation"], []),
            ("C", ["OP", 41, 40, "d|X"], []),
        ])
        return [("Objects", [], [geometry, skin, cl0, cl1, bone0, bone1,
                                 curve_node, curve]), conns]

    def test_skin_clusters(self):
        from fyrox_tpu.io.fbx import extract_skin
        doc = parse_fbx(write_fbx_binary(self._doc_with_skin()))
        skin = extract_skin(doc)
        assert skin is not None
        np.testing.assert_array_equal(skin["bone_model_ids"], [30, 31])
        # vertex 1 is split 50/50 across the two clusters (normalized)
        w1 = sorted(skin["weights"][1][:2].tolist())
        np.testing.assert_allclose(w1, [0.5, 0.5])
        assert skin["weights"][0][0] == 1.0
        assert skin["inv_bind"].shape == (2, 4, 4)

    def test_animation_curves(self):
        from fyrox_tpu.io.fbx import extract_animations
        doc = parse_fbx(write_fbx_binary(self._doc_with_skin()))
        anims = extract_animations(doc)
        assert 30 in anims
        keys = anims[30]["T.X"]
        assert keys[0] == (0.0, 0.0)
        assert abs(keys[1][0] - 1.0) < 1e-9 and keys[1][1] == 2.5


class TestEndToEnd:
    def test_fbx_to_engine_skin_and_clip(self):
        from fyrox_tpu.io.fbx import fbx_to_engine
        # skin doc + bone Models need names for node mapping
        nodes = TestSkinsAndAnimations()._doc_with_skin()
        # append a mesh Model owning the geometry + connect
        objs = nodes[0]
        model = ("Model", [50, "Model::mesh", "Mesh"], [])
        objs[2].append(model)
        nodes[1][2].append(("C", ["OO", 10, 50], []))
        data = write_fbx_binary(nodes)
        sb, names, skin, aset = fbx_to_engine(data)
        assert "mesh" in names and "b0" in names
        assert skin is not None
        assert skin.num_bones == 2
        assert skin.vertices.shape == (3, 3)
        # bone model ids resolved to scene node indices
        assert skin.bones[0] == names["b0"]
        assert aset is not None
        # the T.X curve became a position track on bone b0
        from fyrox_tpu.animation import init_animation_state, track
        anim = init_animation_state(aset, 1)
        sampled = track.sample_tracks(aset, anim._replace(
            time=anim.time + 1.0))
        assert sampled          # something sampled at t=1
