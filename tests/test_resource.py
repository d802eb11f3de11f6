"""Resource manager + texture/material tests."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.render.texture import Material, Texture, sample_bilinear
from fyrox_tpu.resource import ResourceManager, ResourceState


class TestResourceManager:
    def test_request_dedup_and_async_load(self):
        rm = ResourceManager()
        path = "/root/reference/template-core/src/3d.rgs"
        r1 = rm.request(path)
        r2 = rm.request(path)
        assert r1 is r2                       # dedup (manager.rs:595)
        r1.wait(10)
        assert r1.state == ResourceState.OK
        assert r1.data.num_nodes >= 4         # loaded SceneTemplate

    def test_missing_loader_and_events(self):
        rm = ResourceManager()
        events = []
        rm.add_listener(lambda r: events.append(r.state))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "thing.xyz")
            open(p, "w").write("x")
            r = rm.request(p).wait(5)
        assert r.state == ResourceState.LOAD_ERROR
        assert "no loader" in r.error
        assert ResourceState.LOAD_ERROR in events

    def test_custom_loader(self):
        rm = ResourceManager()
        rm.register_loader(".txt", lambda p: open(p).read())
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.txt")
            open(p, "w").write("hello")
            r = rm.request(p).wait(5)
        assert r.is_ok() and r.data == "hello"


class TestTexture:
    def test_mip_chain(self):
        t = Texture.from_array(np.ones((16, 8, 3), np.float32))
        sizes = [(m.shape[0], m.shape[1]) for m in t.mips]
        assert sizes[0] == (16, 8) and sizes[-1][0] == 1 or sizes[-1][1] == 1
        assert all(m.shape[-1] == 4 for m in t.mips)

    def test_bilinear_sampling(self):
        # 2x2 checker: exact at texel centers, blended between
        img = np.zeros((2, 2, 4), np.float32)
        img[0, 0] = img[1, 1] = 1.0
        t = Texture.from_array(img, build_mips=False)
        uv = jnp.asarray([[0.25, 0.25], [0.75, 0.75], [0.5, 0.5]])
        out = np.asarray(sample_bilinear(jnp.asarray(t.base), uv))
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[1, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[2, 0], 0.5, atol=1e-6)

    def test_material_bindings(self):
        m = Material(albedo=(1, 0, 0)).set_property("uv_scale", 2.0)
        m.bind("diffuse", Texture.from_array(np.ones((4, 4, 4), np.float32)))
        assert m.properties["uv_scale"] == 2.0
        assert "diffuse" in m.textures
