"""Terrain brushes (scene/terrain/brushstroke/mod.rs:695-800)."""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.scene.brush import Brush, apply_stroke, stroke_opacity


class TestBrushStroke:
    def test_raise_circle(self):
        h = jnp.zeros((32, 32))
        b = Brush(shape="circle", radius=4.0, mode="raise", amount=2.0,
                  hardness=1.0)
        out = np.asarray(apply_stroke(h, b, [(16.0, 16.0)]))
        assert abs(out[16, 16] - 2.0) < 1e-5       # center raised fully
        assert out[0, 0] == 0.0                    # far texel untouched
        assert abs(out[16, 18] - 2.0) < 1e-5       # inside radius, hard edge

    def test_hardness_falloff(self):
        b_soft = Brush(radius=8.0, mode="raise", amount=1.0, hardness=0.0)
        w = np.asarray(stroke_opacity((32, 32), b_soft, [(16.0, 16.0)]))
        assert w[16, 16] > 0.95
        assert 0.05 < w[16, 22] < 0.95             # mid-falloff
        assert w[16, 30] == 0.0

    def test_stroke_max_accumulation(self):
        """Overlapping stamps take max opacity, not sum (StrokeData)."""
        b = Brush(radius=4.0, mode="raise", amount=1.0, hardness=1.0)
        pts = [(14.0, 16.0), (16.0, 16.0), (18.0, 16.0)]
        out = np.asarray(apply_stroke(jnp.zeros((32, 32)), b, pts))
        assert out.max() <= 1.0 + 1e-5

    def test_assign_and_flatten(self):
        h = jnp.asarray(np.linspace(0, 5, 32)[None].repeat(32, 0))
        b = Brush(radius=4.0, mode="assign", value=9.0, hardness=1.0)
        out = np.asarray(apply_stroke(h, b, [(16.0, 16.0)]))
        assert abs(out[16, 16] - 9.0) < 1e-4
        bf = Brush(radius=6.0, mode="flatten", hardness=1.0)
        outf = np.asarray(apply_stroke(h, bf, [(16.0, 16.0)]))
        # flattened to the height at the first stamp center
        assert abs(outf[16, 18] - outf[16, 16]) < 1e-4
        assert abs(out[0, 0] - np.asarray(h)[0, 0]) < 1e-5

    def test_smooth_reduces_variance(self):
        rng = np.random.default_rng(0)
        h = jnp.asarray(rng.normal(0, 1, (32, 32)).astype(np.float32))
        b = Brush(radius=30.0, mode="smooth", kernel_radius=2, hardness=1.0)
        out = np.asarray(apply_stroke(h, b, [(16.0, 16.0)]))
        assert out[8:24, 8:24].std() < np.asarray(h)[8:24, 8:24].std() * 0.6

    def test_rect_shape_and_transform(self):
        b = Brush(shape="rect", width=8.0, length=2.0, mode="raise",
                  amount=1.0, hardness=1.0)
        w = np.asarray(stroke_opacity((32, 32), b, [(16.0, 16.0)]))
        assert w[16, 19] == 1.0 and w[19, 16] == 0.0   # wide in x only
        # 90° rotation via the 2x2 transform swaps the axes
        b_rot = Brush(shape="rect", width=8.0, length=2.0, mode="raise",
                      amount=1.0, hardness=1.0,
                      transform=((0.0, -1.0), (1.0, 0.0)))
        wr = np.asarray(stroke_opacity((32, 32), b_rot, [(16.0, 16.0)]))
        assert wr[19, 16] == 1.0 and wr[16, 19] == 0.0

    def test_terrain_heightmap_roundtrip(self):
        """Brush-raised terrain feeds back into the height sampler."""
        from fyrox_tpu.scene.terrain import Terrain, sample_height
        h = np.zeros((17, 17), np.float32)
        t = Terrain(heights=h, size_x=16.0, size_z=16.0)
        b = Brush(radius=3.0, mode="raise", amount=2.0, hardness=1.0)
        t.heights = np.asarray(apply_stroke(t.heights, b, [(8.0, 8.0)],
                                            cell_size=1.0))
        assert float(sample_height(t, 8.0, 8.0)) > 1.9
