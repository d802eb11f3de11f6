"""Renderer round-2 extras: spot/point shadow maps and the
forward/transparent pass.

Reference parity rows: SpotShadowMapRenderer (renderer/shadow/spot.rs:49),
PointShadowMapRenderer (shadow/point.rs:50, cube map), forward render path
for transparent bundles (renderer/mod.rs:1066-1115) — here weighted-blended
OIT (render/transparent.py).
"""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.render import (RenderConfig, build_render_template, make_cube,
                              make_plane, render_frame)
from fyrox_tpu.scene import SceneBuilder, graph, init_state

H = W = 64
# rotation mapping +Z (the camera/light look axis) to -Y: +90 deg about X
# (R_x(90)·(0,0,1) = (0,-1,0)); quaternion (sin(a/2),0,0,cos(a/2))
DOWN = (np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4))


def _scene(light_kind, occluder=True):
    sb = SceneBuilder()
    sb.add_mesh(make_plane(12.0, albedo=(0.8, 0.8, 0.8)), name="ground")
    if occluder:
        sb.add_mesh(make_cube(1.6, albedo=(0.6, 0.2, 0.2)), name="blocker",
                    position=(0, 2.0, 0))
    if light_kind == "spot":
        sb.add_light("spot", position=(0, 6.0, 0), rotation=DOWN,
                     radius=30.0, hotspot=np.deg2rad(70.0), intensity=4.0)
    else:
        sb.add_light("point", position=(0, 6.0, 0), radius=30.0,
                     intensity=6.0)
    # camera above, looking straight down at the ground
    sb.add_camera("cam", position=(0, 9.0, 0), rotation=DOWN)
    t = sb.build()
    st = graph.update_hierarchical_data(init_state(t, 1), t)
    return t, st


def _brightness_center(img):
    c = np.asarray(img)[0]
    h, w = c.shape[:2]
    return float(c[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4].mean())


class TestSpotPointShadows:
    def _render(self, kind, shadows_on):
        t, st = _scene(kind)
        rt = build_render_template(t)
        cfg = RenderConfig(width=W, height=H, shadows=True,
                           spot_shadows=shadows_on and kind == "spot",
                           point_shadows=shadows_on and kind == "point",
                           chunk=16, ambient=(0.02, 0.02, 0.02))
        color, _ = render_frame(st, t, rt, cfg)
        return color

    def test_spot_blocker_casts_shadow(self):
        lit = self._render("spot", shadows_on=False)
        shad = self._render("spot", shadows_on=True)
        # the screen centre shows the blocker's top (lit in both); compare
        # the ground ring just outside the blocker vs directly under it is
        # hidden — so instead compare total image energy: the shadowed
        # render must lose light on the ground around the blocker's shadow
        assert float(np.asarray(shad).mean()) <= float(np.asarray(lit).mean())
        # and a region far from the blocker keeps its brightness
        far_lit = float(np.asarray(lit)[0, 4:12, 4:12].mean())
        far_shad = float(np.asarray(shad)[0, 4:12, 4:12].mean())
        np.testing.assert_allclose(far_shad, far_lit, rtol=0.05)

    def test_point_blocker_casts_shadow(self):
        lit = self._render("point", shadows_on=False)
        shad = self._render("point", shadows_on=True)
        assert float(np.asarray(shad).mean()) < float(np.asarray(lit).mean())

    def test_spot_shadow_darkens_occluded_ground(self):
        # no-occluder scene: shadows on ≈ shadows off (no occlusion change)
        t, st = _scene("spot", occluder=False)
        rt = build_render_template(t)
        base = render_frame(st, t, rt, RenderConfig(
            width=W, height=H, shadows=True, spot_shadows=False, chunk=16))[0]
        on = render_frame(st, t, rt, RenderConfig(
            width=W, height=H, shadows=True, spot_shadows=True, chunk=16))[0]
        np.testing.assert_allclose(_brightness_center(on),
                                   _brightness_center(base), rtol=0.05)


class TestTransparentPass:
    def _scene(self, alpha):
        sb = SceneBuilder()
        # opaque white wall behind, transparent red pane in front
        sb.add_mesh(make_cube(3.0, albedo=(1.0, 1.0, 1.0),
                              emission=(1.0, 1.0, 1.0)),
                    name="wall", position=(0, 0, 6.0))
        if alpha is not None:
            sb.add_mesh(make_cube(2.0, albedo=(1.0, 0.0, 0.0),
                                  emission=(0.5, 0.0, 0.0), alpha=alpha),
                        name="pane", position=(0, 0, 3.0))
        sb.add_camera("cam", position=(0, 0, 0))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        cfg = RenderConfig(width=W, height=H, shadows=False, chunk=16)
        color, _ = render_frame(st, t, rt, cfg)
        return np.asarray(color)[0]

    def test_transparent_pane_tints_wall(self):
        plain = self._scene(None)
        tinted = self._scene(0.5)
        c0 = plain[H // 2, W // 2]
        c1 = tinted[H // 2, W // 2]
        # red channel holds up; green/blue attenuated by the red pane
        assert c1[1] < c0[1] * 0.9
        assert c1[2] < c0[2] * 0.9
        assert c1[0] > 0.3 * c0[0]

    def test_nearly_clear_pane_changes_little(self):
        plain = self._scene(None)
        clear = self._scene(0.05)
        d = np.abs(plain[H // 2, W // 2] - clear[H // 2, W // 2]).max()
        assert d < 0.25, d


class TestOcclusionCulling:
    """HZB occlusion culling (renderer/occlusion/mod.rs:60 equivalent)."""

    def test_hzb_and_aabb_test(self):
        import jax.numpy as jnp
        from fyrox_tpu.render.occlusion import build_hzb, occlusion_visible
        from fyrox_tpu.scene import camera as cam
        # depth buffer: near wall (z=0.2) covering the left half
        depth = jnp.full((32, 32), 1.0e9)
        depth = depth.at[:, :16].set(0.2)
        hzb = build_hzb(depth)
        assert len(hzb) >= 4
        proj = cam.perspective(jnp.asarray(np.pi / 2), jnp.asarray(1.0),
                               jnp.asarray(0.1), jnp.asarray(100.0))
        # our camera convention looks +Z with view flipping z; emulate by a
        # view that maps +z forward: use -z for the RH projection directly
        vp = np.asarray(proj)
        def box(cx, cz, r=0.5):
            return (np.asarray([[cx - r, -r, -cz - r]], np.float32),
                    np.asarray([[cx + r, r, -cz + r]], np.float32))
        # box on the LEFT (screen-left = -x), far behind the wall depth
        wmin, wmax = box(-5.0, 10.0)
        vis_hidden = occlusion_visible(jnp.asarray(wmin), jnp.asarray(wmax),
                                       jnp.asarray(vp), hzb, 32, 32)
        # box on the RIGHT, same distance — empty depth there
        wmin2, wmax2 = box(5.0, 10.0)
        vis_open = occlusion_visible(jnp.asarray(wmin2), jnp.asarray(wmax2),
                                     jnp.asarray(vp), hzb, 32, 32)
        assert not bool(vis_hidden[0])
        assert bool(vis_open[0])

    def test_pipeline_image_unchanged_with_occlusion(self):
        # occlusion culling is conservative: the rendered image must not
        # change (hidden objects were invisible anyway)
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, render_frame)
        sb = SceneBuilder()
        sb.add_mesh(make_cube(4.0, albedo=(1, 1, 1), emission=(1, 1, 1)),
                    name="wall", position=(0, 0, 5.0))
        sb.add_mesh(make_cube(1.0, albedo=(1, 0, 0), emission=(1, 0, 0)),
                    name="hidden", position=(0, 0, 9.0))
        sb.add_camera("cam", position=(0, 0, 0))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        base = render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False, chunk=16))[0]
        occl = render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False, chunk=16, occlusion=True,
            occlusion_size=32))[0]
        np.testing.assert_allclose(np.asarray(occl), np.asarray(base),
                                   atol=1e-5)


class TestDecals:
    """Decal projection (scene/decal.rs:115, renderer/decal.rs)."""

    def test_decal_tints_geometry_inside_volume(self):
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_plane, render_frame)
        sb = SceneBuilder()
        sb.add_mesh(make_plane(10.0, albedo=(1, 1, 1), emission=(1, 1, 1)),
                    name="ground")
        # decal box over the plane centre, scaled 2x2x2
        sb.add_decal("splat", color=(1.0, 0.0, 0.0), strength=1.0,
                     position=(0, 0, 0), scale=(2.0, 2.0, 2.0))
        sb.add_camera("cam", position=(0, 6.0, 0), rotation=DOWN)
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        img = np.asarray(render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False, chunk=16))[0])[0]
        c_in = img[16, 16]          # centre: decal volume
        c_out = img[3, 3]           # corner: plain white plane
        assert c_in[0] > 0.5 and c_in[1] < 0.4        # red-tinted
        assert c_out[1] > 0.8                          # untouched white


class TestVolumetricShafts:
    """Light shafts (renderer/light_volume.rs equivalent)."""

    def test_shafts_brighten_toward_light(self):
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, render_frame)
        sb = SceneBuilder()
        # a pillar silhouetted against a bright point light behind it
        sb.add_mesh(make_cube(1.5, albedo=(0.1, 0.1, 0.1)), name="pillar",
                    position=(0, 0, 5.0))
        sb.add_light("point", position=(0, 0, 9.0), radius=30.0,
                     intensity=4.0)
        sb.add_camera("cam", position=(0, 0, 0))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        off = np.asarray(render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False, chunk=16))[0])[0]
        on = np.asarray(render_frame(st, t, rt, RenderConfig(
            width=32, height=32, shadows=False, chunk=16,
            light_shafts=True))[0])[0]
        # shafts only ADD light, and must add a nontrivial amount around
        # the silhouette
        assert np.all(on >= off - 1e-6)
        assert on.mean() > off.mean() + 1e-3


class TestReflectionProbe:
    """Reflection probe capture + diffuse IBL (scene/probe.rs:135,
    renderer convolution.rs collapsed to a 6-lobe cosine basis)."""

    def test_capture_sees_surroundings_and_lights_scene(self):
        import jax.numpy as jnp
        from fyrox_tpu.render.probe import (apply_probe_ambient,
                                            capture_probe, face_irradiance)
        # a bright emissive panel on +X of the probe
        tri = jnp.asarray([[[3.0, -1, -1], [3.0, -1, 1], [3.0, 1, 0]]])
        attrs = dict(albedo=jnp.zeros((1, 3, 3)),
                     normal=jnp.tile(jnp.asarray([-1.0, 0, 0]), (1, 3, 1)),
                     position=tri,
                     material=jnp.zeros((1, 3, 2)),
                     emission=jnp.tile(jnp.asarray([0.0, 4.0, 0.0]), (1, 3, 1)))
        faces = capture_probe(tri, attrs, (0.0, 0.0, 0.0), face_size=16,
                              chunk=1)
        irr = np.asarray(face_irradiance(faces))
        # the +X face sees green; the -X face sees nothing
        assert irr[0, 1] > 0.01
        assert irr[1, 1] < 1e-6

        # apply to a fake gbuf: a pixel whose normal faces +X receives the
        # green bounce, one facing -X does not
        class G:
            albedo = jnp.ones((1, 2, 3))
            normal = jnp.asarray([[[1.0, 0, 0], [-1.0, 0, 0]]])
            position = jnp.zeros((1, 2, 3))
            mask = jnp.ones((1, 2), bool)
        out = np.asarray(apply_probe_ambient(jnp.zeros((1, 2, 3)), G,
                                             face_irradiance(faces)))
        assert out[0, 0, 1] > 0.003
        assert out[0, 1, 1] < 1e-6


class TestSpecularIBL:
    """Specular prefilter (renderer convolution.rs equivalent)."""

    def test_uniform_env_invariant(self):
        """A constant environment convolves to itself at every roughness."""
        from fyrox_tpu.render.probe import prefilter_specular
        faces = jnp.full((6, 16, 16, 3), 0.7)
        pre = prefilter_specular(faces, out_size=4)
        np.testing.assert_allclose(np.asarray(pre), 0.7, atol=1e-4)

    def test_sharp_lobe_tracks_bright_face(self):
        """Low roughness keeps a bright +X patch localized to +X
        directions; high roughness spreads it everywhere."""
        from fyrox_tpu.render.probe import (prefilter_specular,
                                            _sample_cube)
        faces = jnp.zeros((6, 16, 16, 3)).at[0].set(1.0)  # +X face bright
        pre = prefilter_specular(faces, roughness_levels=(0.1, 1.0),
                                 out_size=8)
        px = np.asarray(_sample_cube(pre[0], jnp.asarray([1.0, 0, 0])))
        nx = np.asarray(_sample_cube(pre[0], jnp.asarray([-1.0, 0, 0])))
        assert px[0] > 0.5 and nx[0] < 0.05      # sharp: localized
        px_r = np.asarray(_sample_cube(pre[1], jnp.asarray([1.0, 0, 0])))
        nx_r = np.asarray(_sample_cube(pre[1], jnp.asarray([-1.0, 0, 0])))
        assert px_r[0] < px[0]                   # rough: spread out
        assert nx_r[0] > nx[0]

    def test_apply_specular_metal_mirror(self):
        """A metallic, smooth pixel facing a bright +X env picks up the
        reflection; a rough dielectric picks up far less."""
        from fyrox_tpu.render.probe import (prefilter_specular,
                                            apply_probe_specular)
        from fyrox_tpu.render.raster import GBuffer
        faces = jnp.zeros((6, 16, 16, 3)).at[0].set(1.0)
        pre = prefilter_specular(faces, out_size=8)
        # camera at +X above, surface normal +X → reflection goes +X-ish
        mk = lambda metal, rough: GBuffer(
            depth=jnp.zeros((1, 1)),
            albedo=jnp.full((1, 1, 3), 0.9),
            normal=jnp.asarray([[[1.0, 0.0, 0.0]]]),
            position=jnp.zeros((1, 1, 3)),
            material=jnp.asarray([[[metal, rough]]]),
            emission=jnp.zeros((1, 1, 3)),
            mask=jnp.ones((1, 1), bool))
        cam = jnp.asarray([2.0, 0.0, 0.0])
        mirror = np.asarray(apply_probe_specular(
            jnp.zeros((1, 1, 3)), mk(1.0, 0.1), cam, pre))
        dielec = np.asarray(apply_probe_specular(
            jnp.zeros((1, 1, 3)), mk(0.0, 0.9), cam, pre))
        assert mirror[0, 0, 0] > 0.5
        assert dielec[0, 0, 0] < mirror[0, 0, 0] * 0.3


class TestSkybox:
    def test_gradient_faces_sample(self):
        """Up samples zenith, horizon-level samples horizon color."""
        from fyrox_tpu.render.skybox import SkyBox, gradient_faces
        sb = SkyBox(gradient_faces((0.0, 0.0, 1.0), (1.0, 0.0, 0.0),
                                   size=16))
        up = np.asarray(sb.sample(jnp.asarray([0.0, 1.0, 0.0])))
        side = np.asarray(sb.sample(jnp.asarray([1.0, 0.0, 0.0])))
        assert up[2] > 0.9 and up[0] < 0.1
        assert side[0] > 0.8

    def test_skybox_backfill_in_pipeline(self):
        """render_frame fills background pixels from the cube skybox."""
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, render_frame)
        from fyrox_tpu.render.skybox import SkyBox
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_cube(1.0, albedo=(0.3, 0.3, 0.3)),
                    position=(0.0, 0.0, 0.0))
        sb.add_camera("cam", position=(0.0, 0.0, -4.0))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        sky = SkyBox(jnp.full((6, 8, 8, 3), 0.5).at[..., 2].set(1.0))
        cfg = RenderConfig(width=32, height=32, shadows=False, skybox=sky)
        color = np.asarray(render_frame(st, t, rt, cfg)[0][0])
        corner = color[0, 0]          # background pixel
        assert corner[2] > 0.9        # skybox blue
        center = color[16, 16]        # cube pixel
        assert center[2] < 0.9


class TestCascadePreCull:
    def test_budget_one_matches_no_budget(self):
        """tri_budget=1.0 exercises the compaction path with zero drops:
        cascade depth maps must match the un-culled ones exactly."""
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, make_plane, render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_plane(20.0), name="ground")
        for i in range(6):
            sb.add_mesh(make_cube(1.0), position=(i * 2.0 - 5.0, 0.5, 0.0))
        tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
        sb.add_light("directional", rotation=tilt)
        sb.add_camera("cam", position=(0, 4.0, -8.0),
                      rotation=(np.sin(np.pi / 10), 0, 0, np.cos(np.pi / 10)))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        base = RenderConfig(width=64, height=64, shadows=True)
        cull = base._replace(cascade_tri_budget=1.0)
        c0, _ = render_frame(st, t, rt, base)
        c1, _ = render_frame(st, t, rt, cull)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)

    def test_half_budget_keeps_in_footprint_casters(self):
        """A scene whose casters cluster in one spot: halving the budget
        must not change the shadows (off-footprint triangles compact
        away first)."""
        import numpy as np
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, make_plane, render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_plane(200.0), name="ground")
        sb.add_mesh(make_cube(1.0), position=(0.0, 0.5, 2.0), name="caster")
        # far-away geometry outside every cascade footprint
        for i in range(8):
            sb.add_mesh(make_cube(1.0), position=(500.0 + i * 3, 0.5, 500.0))
        tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
        sb.add_light("directional", rotation=tilt)
        sb.add_camera("cam", position=(0, 3.0, -6.0),
                      rotation=(np.sin(np.pi / 12), 0, 0, np.cos(np.pi / 12)))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        base = RenderConfig(width=64, height=64, shadows=True)
        cull = base._replace(cascade_tri_budget=0.5)
        c0, _ = render_frame(st, t, rt, base)
        c1, _ = render_frame(st, t, rt, cull)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)

    def test_per_cascade_tuple_budgets_lossless_when_sized(self):
        """Per-cascade budgets sized >= each cascade's occupancy must
        reproduce the un-culled frame exactly; entries >= 1 keep the
        full set for that cascade (no top_k at all)."""
        import numpy as np
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, make_plane, render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_plane(200.0), name="ground")
        sb.add_mesh(make_cube(1.0), position=(0.0, 0.5, 2.0), name="caster")
        for i in range(8):
            sb.add_mesh(make_cube(1.0), position=(500.0 + i * 3, 0.5, 500.0))
        tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
        sb.add_light("directional", rotation=tilt)
        sb.add_camera("cam", position=(0, 3.0, -6.0),
                      rotation=(np.sin(np.pi / 12), 0, 0, np.cos(np.pi / 12)))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        base = RenderConfig(width=64, height=64, shadows=True)
        cull = base._replace(cascade_tri_budget=(0.5, 1.0, 0.75))
        c0, _ = render_frame(st, t, rt, base)
        c1, _ = render_frame(st, t, rt, cull)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-5)


class TestOrthoCamera:
    def test_ortho_projection_used_and_undistorted(self):
        """Projection::Orthographic (camera.rs:196): an ortho camera's
        image has no perspective shrink — two same-size cubes at
        different depths cover the same pixel count."""
        import numpy as np
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state

        def scene(ortho):
            sb = SceneBuilder()
            sb.add_mesh(make_cube(1.0, emission=(1, 0, 0)),
                        position=(-2.0, 0.0, 2.0))
            sb.add_mesh(make_cube(1.0, emission=(0, 1, 0)),
                        position=(2.0, 0.0, 14.0))
            sb.add_camera("cam", position=(0, 0, -6.0), ortho=ortho,
                          vertical_size=4.0)
            t = sb.build()
            st = graph.update_hierarchical_data(init_state(t, 1), t)
            rt = build_render_template(t)
            assert rt.cam_ortho == ortho
            _, gbuf = render_frame(st, t, rt, RenderConfig(
                width=64, height=64, shadows=False))
            return np.asarray(gbuf.mask[0])

        # screen x mirrors world x with this RH convention: the near cube
        # (world x=-2) lands on the RIGHT half
        m_persp = scene(False)
        near_p = m_persp[:, 32:].sum()
        far_p = m_persp[:, :32].sum()
        assert near_p > 2.0 * far_p          # perspective shrinks the far cube
        m_ortho = scene(True)
        near_o = m_ortho[:, 32:].sum()
        far_o = m_ortho[:, :32].sum()
        assert near_o > 0 and far_o > 0
        assert abs(int(near_o) - int(far_o)) <= 0.2 * near_o  # same size


class TestBinDemandAudit:
    """render_frame_demand: the per-pass bin-occupancy audit that
    invalidates benchmark runs whose k_per_tile silently dropped
    triangles (ADVICE r4 medium)."""

    def _scene(self):
        import numpy as np
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, make_plane)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_plane(20.0), name="ground")
        for i in range(4):
            sb.add_mesh(make_cube(1.0), position=(i * 2.0 - 3.0, 0.5, 0.0))
        tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
        sb.add_light("directional", rotation=tilt)
        sb.add_camera("cam", position=(0, 4.0, -8.0),
                      rotation=(np.sin(np.pi / 10), 0, 0, np.cos(np.pi / 10)))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 2), t)
        return t, st, build_render_template(t)

    def test_demand_reported_per_pass_and_under_cap(self):
        import numpy as np
        from fyrox_tpu.render import RenderConfig, render_frame, \
            render_frame_demand
        t, st, rt = self._scene()
        cfg = RenderConfig(width=32, height=32, shadows=True,
                           use_pallas=True, pallas_interpret=True,
                           k_per_tile=128)
        color, demand, caps = render_frame_demand(st, t, rt, cfg)
        # camera pass + 3 CSM cascades = 4 binned passes
        assert demand.shape == (2, 4) and len(caps) == 4
        d = np.asarray(demand)
        assert (d > 0).any()
        assert all(int(m) < k for m, k in zip(d.max(0), caps))
        # audit must not change the image
        plain, _ = render_frame(st, t, rt, cfg)
        np.testing.assert_array_equal(np.asarray(color), np.asarray(plain))

    def test_overflow_detected_when_cap_too_small(self):
        import numpy as np
        from fyrox_tpu.render import RenderConfig, render_frame_demand
        t, st, rt = self._scene()
        # k_per_tile=8 (one _CHUNK) is far below this scene's ~100+
        # triangles overlapping the ground tiles: demand must hit the cap
        cfg = RenderConfig(width=32, height=32, shadows=False,
                           use_pallas=True, pallas_interpret=True,
                           k_per_tile=8)
        _, demand, caps = render_frame_demand(st, t, rt, cfg)
        d = np.asarray(demand)
        assert any(int(m) >= k for m, k in zip(d.max(0), caps))

    def test_plain_path_reports_empty(self):
        from fyrox_tpu.render import RenderConfig, render_frame_demand
        t, st, rt = self._scene()
        cfg = RenderConfig(width=32, height=32, shadows=False,
                           use_pallas=False)
        _, demand, caps = render_frame_demand(st, t, rt, cfg)
        assert demand.shape[1] == 0 and caps == []


class TestBatchedCascadeLaunch:
    def test_batched_matches_unrolled(self, monkeypatch):
        """FYROX_CSM_LAUNCH=batched (one vmapped depth raster over the
        cascade axis, per-cascade budget cull + pad) must render the
        same frame as the unrolled per-cascade launches."""
        import numpy as np
        from fyrox_tpu.render import (RenderConfig, make_cube, make_plane,
                                      build_render_template, render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        sb = SceneBuilder()
        sb.add_mesh(make_plane(20.0), name="ground")
        for i in range(6):
            sb.add_mesh(make_cube(1.0), position=(i * 2.0 - 5.0, 0.5, 0.0))
        tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
        sb.add_light("directional", rotation=tilt)
        sb.add_camera("cam", position=(0, 4.0, -8.0),
                      rotation=(np.sin(np.pi / 10), 0, 0, np.cos(np.pi / 10)))
        t = sb.build()
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        cfg = RenderConfig(width=64, height=64, shadows=True,
                           use_pallas=True, pallas_interpret=True,
                           k_per_tile=64,
                           cascade_tri_budget=(0.5, 1.0, 0.75))
        monkeypatch.setenv("FYROX_CSM_LAUNCH", "unrolled")
        a = np.asarray(render_frame(st, t, rt, cfg)[0])
        monkeypatch.setenv("FYROX_CSM_LAUNCH", "batched")
        b = np.asarray(render_frame(st, t, rt, cfg)[0])
        np.testing.assert_allclose(b, a, atol=1e-6)

    def test_joined_attr_matches_split(self, monkeypatch):
        """FYROX_RASTER_ATTR=joined (one concatenated row gather) is a
        pure re-association of the legacy per-attribute gathers."""
        import numpy as np
        from fyrox_tpu.render import raster
        from fyrox_tpu.render.pallas_raster import rasterize_pallas
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_pallas_raster import random_tris
        rng = np.random.default_rng(9)
        clip, attrs = random_tris(rng, t=40)
        monkeypatch.setenv("FYROX_RASTER_ATTR", "split")
        a = rasterize_pallas(clip, attrs, 64, 128, k_per_tile=64,
                             interpret=True)
        monkeypatch.setenv("FYROX_RASTER_ATTR", "joined")
        b = rasterize_pallas(clip, attrs, 64, 128, k_per_tile=64,
                             interpret=True)
        for f in ("albedo", "normal", "position", "material", "emission"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)))
