"""Texture-mapped deferred materials (VERDICT r3 #5).

Reference: fyrox-impl/src/renderer/gbuffer.rs:57 (G-buffer fill binds the
full material texture set) and bundle.rs:484-495 (material blocks). Here
all scene textures pack into one array; interpolated (u,v,layer) rides the
G-buffer's uvt channel and the deferred pass samples at shade time.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.render import (RenderConfig, build_render_template,
                              make_cube, make_plane, render_frame)
from fyrox_tpu.render.texture import (Texture, sample_array_bilinear,
                                      resize_bilinear)
from fyrox_tpu.scene import SceneBuilder, graph, init_state


def _checker(c0=(1.0, 0.0, 0.0), c1=(0.0, 0.0, 1.0), n=2, res=8):
    """n x n checkerboard texture [res,res,3]."""
    y, x = np.mgrid[0:res, 0:res]
    cell = ((x * n // res) + (y * n // res)) % 2
    img = np.where(cell[..., None] == 0, np.asarray(c0, np.float32),
                   np.asarray(c1, np.float32))
    return img.astype(np.float32)


def _topdown_scene(mesh):
    sb = SceneBuilder()
    sb.add_mesh(mesh, name="ground")
    # camera 5 above the origin looking straight down (+90° about X)
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    sb.add_camera("cam", position=(0, 5, 0), rotation=(s, 0, 0, c))
    t = sb.build()
    st = graph.update_hierarchical_data(init_state(t, 1), t)
    return t, st


class TestTexturedDeferred:
    def test_sample_array_bilinear_exact_at_texel_centers(self):
        tex = np.zeros((2, 4, 4, 3), np.float32)
        tex[0, 1, 2] = (0.25, 0.5, 0.75)
        tex[1, 3, 0] = (1.0, 0.0, 1.0)
        uv = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4],
                          [(0 + 0.5) / 4, (3 + 0.5) / 4]])
        tid = jnp.asarray([0, 1])
        out = np.asarray(sample_array_bilinear(jnp.asarray(tex), tid, uv))
        np.testing.assert_allclose(out[0], [0.25, 0.5, 0.75], atol=1e-6)
        np.testing.assert_allclose(out[1], [1.0, 0.0, 1.0], atol=1e-6)

    def test_resize_bilinear_identity_and_downscale(self):
        img = np.random.default_rng(0).random((8, 8, 4)).astype(np.float32)
        np.testing.assert_array_equal(resize_bilinear(img, 8), img)
        half = resize_bilinear(img, 4)
        assert half.shape == (4, 4, 4)
        assert abs(half.mean() - img.mean()) < 0.05

    def test_checker_plane_golden_pixels(self):
        """A checkered ground seen top-down shows both checker colors in
        roughly equal coverage; every lit pixel matches one of them."""
        mesh = make_plane(8.0, albedo=(1.0, 1.0, 1.0))
        mesh.albedo_texture = Texture.from_array(_checker())
        t, st = _topdown_scene(mesh)
        rt = build_render_template(t)
        assert rt.tex_array is not None and rt.tex_array.shape[0] == 1
        color, gbuf = render_frame(st, t, rt, RenderConfig(
            width=64, height=64, shadows=False))
        img = np.asarray(color[0])
        mask = np.asarray(gbuf.mask[0])
        assert mask.mean() > 0.5                    # plane fills the view
        px = img[mask]
        red = (px[:, 0] > 0.5) & (px[:, 2] < 0.2)
        blue = (px[:, 2] > 0.5) & (px[:, 0] < 0.2)
        frac_r = red.mean()
        frac_b = blue.mean()
        assert 0.25 < frac_r < 0.55, frac_r
        assert 0.25 < frac_b < 0.55, frac_b
        # the rest are bilinear blend pixels along checker-cell borders
        assert (red | blue).mean() > 0.5

    def test_untextured_mesh_unchanged_next_to_textured(self):
        """Mixed scenes: untextured meshes keep their vertex albedo."""
        ground = make_plane(8.0, albedo=(1.0, 1.0, 1.0))
        ground.albedo_texture = Texture.from_array(_checker())
        green = make_cube(1.5, albedo=(0.0, 1.0, 0.0))
        sb = SceneBuilder()
        sb.add_mesh(ground, name="ground")
        sb.add_mesh(green, name="cube", position=(0, 1.0, 0))
        s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
        sb.add_camera("cam", position=(0, 5, 0), rotation=(s, 0, 0, c))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        color, gbuf = render_frame(st, t, rt, RenderConfig(
            width=64, height=64, shadows=False))
        img = np.asarray(color[0])
        center = img[24:40, 24:40].reshape(-1, 3)   # cube top: pure green
        assert center[:, 1].mean() > 0.5
        assert center[:, 0].mean() < 0.1 and center[:, 2].mean() < 0.1

    def test_mr_texture_scales_material(self):
        mesh = make_plane(8.0, metallic=1.0, roughness=1.0)
        mr = np.zeros((4, 4, 4), np.float32)
        mr[..., 0] = 0.25        # metallic scale
        mr[..., 1] = 0.5         # roughness scale
        mesh.mr_texture = Texture.from_array(mr, build_mips=False)
        t, st = _topdown_scene(mesh)
        rt = build_render_template(t)
        _, gbuf = render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False))
        m = np.asarray(gbuf.material[0])[np.asarray(gbuf.mask[0])]
        np.testing.assert_allclose(m[:, 0], 0.25, atol=1e-3)
        np.testing.assert_allclose(m[:, 1], 0.5, atol=1e-3)

    def test_material_shader_binding_names(self):
        """Texture bound through render.texture.Material's .shader standard
        property names is picked up (diffuseTexture)."""
        from fyrox_tpu.render.texture import Material
        mesh = make_plane(8.0)
        mesh.material = Material().bind(
            "diffuseTexture", Texture.from_array(_checker()))
        t, _ = _topdown_scene(mesh)
        rt = build_render_template(t)
        assert rt.tex_array is not None
        assert int(rt.tri_tex.max()) == 0
        assert int(rt.tri_mr.max()) == -1

    def test_pallas_interpret_matches_xla_uvt(self):
        """The Pallas visibility path carries uvt identically (interpret
        mode; same attribute interpolation)."""
        mesh = make_plane(8.0, albedo=(1.0, 1.0, 1.0))
        mesh.albedo_texture = Texture.from_array(_checker())
        t, st = _topdown_scene(mesh)
        rt = build_render_template(t)
        cfg_x = RenderConfig(width=32, height=32, shadows=False)
        cfg_p = RenderConfig(width=32, height=32, shadows=False,
                             use_pallas=True, pallas_interpret=True,
                             k_per_tile=16)
        _, gx = render_frame(st, t, rt, cfg_x)
        _, gp = render_frame(st, t, rt, cfg_p)
        both = np.asarray(gx.mask[0]) & np.asarray(gp.mask[0])
        assert both.mean() > 0.5
        np.testing.assert_allclose(np.asarray(gp.uvt[0])[both],
                                   np.asarray(gx.uvt[0])[both], atol=2e-3)
