"""glTF loader tests against a synthetic embedded-buffer asset."""
import base64
import json
import os
import struct
import tempfile

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation import init_animation_state, track as track_mod
from fyrox_tpu.io.gltf import load_gltf
from fyrox_tpu.scene import graph, init_state


def make_gltf(tmpdir):
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    indices = np.asarray([0, 1, 2], np.uint16)
    anim_times = np.asarray([0.0, 1.0], np.float32)
    anim_vals = np.asarray([[0, 0, 0], [5, 0, 0]], np.float32)
    blob = (positions.tobytes() + indices.tobytes() + b"\x00\x00"
            + anim_times.tobytes() + anim_vals.tobytes())
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            {"buffer": 0, "byteOffset": 44, "byteLength": 8},
            {"buffer": 0, "byteOffset": 52, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "VEC3"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "nodes": [
            {"name": "root", "children": [1],
             "translation": [0, 2, 0]},
            {"name": "tri", "mesh": 0, "translation": [1, 0, 0]},
        ],
        "scenes": [{"nodes": [0]}],
        "animations": [{
            "name": "slide",
            "channels": [{"sampler": 0,
                          "target": {"node": 1, "path": "translation"}}],
            "samplers": [{"input": 2, "interpolation": "LINEAR",
                          "output": 3}],
        }],
    }
    path = os.path.join(tmpdir, "test.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


class TestGltf:
    def test_load_hierarchy_mesh_animation(self):
        with tempfile.TemporaryDirectory() as d:
            scene = load_gltf(make_gltf(d))
        t = scene.builder.build()
        assert t.names[:2] == ["root", "tri"]
        assert t.parent[1] == 0
        np.testing.assert_allclose(t.init_position[0], [0, 2, 0])
        # mesh loaded
        assert len(scene.meshes) == 1
        assert scene.meshes[0].num_triangles == 1
        np.testing.assert_allclose(scene.meshes[0].positions[1], [1, 0, 0])
        # hierarchy steps
        s = init_state(t, 1)
        s = graph.update_hierarchical_data(s, t)
        np.testing.assert_allclose(np.asarray(s.globals_[0, 1, :3, 3]),
                                   [1, 2, 0], atol=1e-6)
        # animation samples: position of node 'tri' at t=0.5 → x=2.5
        aset = scene.animations.build()
        anim = init_animation_state(aset, 1)
        anim = anim._replace(time=jnp.full((1, 1), 0.5))
        sampled = track_mod.sample_tracks(aset, anim)
        nodes, anims, vals = sampled["position"]
        assert nodes[0] == 1
        np.testing.assert_allclose(np.asarray(vals[0, 0]), [2.5, 0, 0],
                                   atol=1e-5)
