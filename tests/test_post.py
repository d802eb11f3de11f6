"""Post-processing + blend shape tests."""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation.skinning import apply_blend_shapes
from fyrox_tpu.render.post import (PostConfig, auto_exposure, bloom, fxaa,
                                   post_process, tonemap_aces)


class TestPost:
    def test_tonemap_range_and_monotonic(self):
        x = jnp.linspace(0.0, 20.0, 64).reshape(1, 8, 8, 1).repeat(3, -1)
        y = np.asarray(tonemap_aces(x))
        assert y.min() >= 0.0 and y.max() <= 1.0
        flat = y[0, :, :, 0].reshape(-1)
        assert (np.diff(flat) >= -1e-6).all()

    def test_auto_exposure_normalizes_brightness(self):
        dark = jnp.full((1, 16, 16, 3), 0.01)
        bright = jnp.full((1, 16, 16, 3), 5.0)
        e_dark = float(auto_exposure(dark)[0].mean())
        e_bright = float(auto_exposure(bright)[0].mean())
        assert e_dark > 10 * e_bright  # boosts dark scenes, damps bright

    def test_bloom_spreads_highlights(self):
        img = jnp.zeros((1, 32, 32, 3)).at[0, 16, 16].set(10.0)
        out = np.asarray(bloom(img, threshold=1.0, strength=1.0, radius=3))
        assert out[0, 16, 13, 0] > 0.01     # spilled to neighbors
        assert out[0, 16, 16, 0] > 10.0     # additive at the source

    def test_fxaa_softens_edges_only(self):
        img = jnp.zeros((1, 16, 16, 3)).at[:, :, 8:].set(1.0)
        out = np.asarray(fxaa(img))
        assert 0.05 < out[0, 8, 8, 0] < 1.0       # edge blended
        np.testing.assert_allclose(out[0, 8, 2], 0.0, atol=1e-6)  # flat kept
        np.testing.assert_allclose(out[0, 8, 13], 1.0, atol=1e-6)

    def test_full_chain_shapes(self):
        img = jnp.abs(jnp.sin(jnp.arange(2 * 32 * 32 * 3, dtype=jnp.float32)
                              )).reshape(2, 32, 32, 3) * 3.0
        out = post_process(img, PostConfig())
        assert out.shape == (2, 32, 32, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestBlendShapes:
    def test_weighted_morph(self):
        verts = np.zeros((4, 3), np.float32)
        deltas = np.zeros((2, 4, 3), np.float32)
        deltas[0, :, 0] = 1.0   # shape 0 moves +x
        deltas[1, :, 1] = 2.0   # shape 1 moves +y
        weights = jnp.asarray([[100.0, 0.0], [50.0, 50.0]])
        out = np.asarray(apply_blend_shapes(verts, deltas, weights))
        np.testing.assert_allclose(out[0, 0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[1, 0], [0.5, 1.0, 0], atol=1e-6)


class TestColorGrading:
    def test_identity_lut_is_noop(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.render.post import color_grading, identity_lut
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        out = color_grading(img, identity_lut(16))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)

    def test_channel_swap_lut(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.render.post import color_grading, identity_lut
        lut = identity_lut(8)[..., [2, 1, 0]]       # swap R and B
        img = jnp.asarray([[[0.9, 0.2, 0.1]]], jnp.float32)
        out = np.asarray(color_grading(img, lut))
        np.testing.assert_allclose(out[0, 0], [0.1, 0.2, 0.9], atol=0.08)

    def test_post_process_with_lut(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.render.post import (PostConfig, identity_lut,
                                           post_process)
        img = jnp.ones((2, 16, 16, 3), jnp.float32) * 0.5
        warm = identity_lut(8).copy()
        warm[..., 0] = np.clip(warm[..., 0] * 1.3, 0, 1)   # warmer reds
        a = post_process(img, PostConfig(use_fxaa=False))
        b = post_process(img, PostConfig(use_fxaa=False,
                                         color_grading_lut=warm))
        assert float(jnp.mean(b[..., 0])) > float(jnp.mean(a[..., 0]))
        np.testing.assert_allclose(np.asarray(b[..., 1]),
                                   np.asarray(a[..., 1]), atol=1e-5)
