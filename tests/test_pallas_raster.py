"""Pallas tiled rasterizer vs the XLA streaming rasterizer (interpret mode
on CPU; the compiled kernel is exercised on real TPU by bench/drives)."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.render import raster
from fyrox_tpu.render.pallas_raster import rasterize_pallas


def random_tris(rng, t=64):
    centers = rng.uniform(-1, 1, (t, 1, 3)) * np.array([1.0, 1.0, 0])
    offs = rng.uniform(-0.15, 0.15, (t, 3, 3)) * np.array([1, 1, 0])
    depth = rng.uniform(0.2, 0.9, (t, 1, 1))
    v = centers + offs
    w = 1.0 / (1 - depth * 0.5)
    clip = np.concatenate([v[..., :2] * w,
                           np.broadcast_to(depth, (t, 3, 1)) * w,
                           np.broadcast_to(w, (t, 3, 1))], -1).astype(np.float32)
    attrs = {k: jnp.asarray(rng.uniform(0, 1, (t, 3, c)), jnp.float32)
             for k, c in [("albedo", 3), ("normal", 3), ("position", 3),
                          ("material", 2), ("emission", 3)]}
    return jnp.asarray(clip), attrs


class TestPallasRaster:
    def test_matches_xla_rasterizer(self):
        rng = np.random.default_rng(0)
        clip, attrs = random_tris(rng, t=64)
        h, w = 64, 128
        g1 = raster.rasterize(clip, attrs, h, w, chunk=16)
        g2 = rasterize_pallas(clip, attrs, h, w, tile_h=32, tile_w=128,
                              k_per_tile=160, interpret=True)
        m1 = np.asarray(g1.mask)
        m2 = np.asarray(g2.mask)
        assert (m1 == m2).mean() > 0.999
        both = m1 & m2
        assert both.sum() > 100
        # 2e-5: the 2DH path computes z = Z/W per pixel, the XLA path
        # divides per vertex then lerps — equally-valid f32 rounding
        np.testing.assert_allclose(np.asarray(g1.depth)[both],
                                   np.asarray(g2.depth)[both], atol=2e-5)
        np.testing.assert_allclose(np.asarray(g1.albedo)[both],
                                   np.asarray(g2.albedo)[both], atol=1e-4)

    def test_bin_overflow_keeps_lowest_ids(self):
        """With K smaller than the tile's triangle count the kernel still
        renders (just drops the highest-id triangles)."""
        rng = np.random.default_rng(1)
        clip, attrs = random_tris(rng, t=64)
        g = rasterize_pallas(clip, attrs, 64, 128, tile_h=32, tile_w=128,
                             k_per_tile=16, interpret=True)
        assert int(g.mask.sum()) > 0


class TestDepthOnly:
    def test_depth_only_matches_full(self):
        """depth_only (shadow-map path) returns the same depth image as the
        full G-buffer kernel."""
        rng = np.random.default_rng(2)
        clip, attrs = random_tris(rng, t=64)
        g = rasterize_pallas(clip, attrs, 64, 128, k_per_tile=160,
                             interpret=True)
        z = rasterize_pallas(clip, {}, 64, 128, k_per_tile=160,
                             interpret=True, depth_only=True)
        np.testing.assert_allclose(np.asarray(g.depth), np.asarray(z),
                                   atol=1e-6)

    def test_two_sided_sees_backfaces(self):
        """backface_cull=False (shadow passes) rasterizes triangles of
        either winding — flipping a winding must not change the depth."""
        rng = np.random.default_rng(3)
        clip, _ = random_tris(rng, t=32)
        flipped = clip[:, ::-1, :]
        z1 = rasterize_pallas(clip, {}, 64, 128, interpret=True,
                              depth_only=True, backface_cull=False)
        z2 = rasterize_pallas(flipped, {}, 64, 128, interpret=True,
                              depth_only=True, backface_cull=False)
        # 5e-5: flipped winding permutes the cross-product evaluation
        # order; 2DH z = Z/W rounds slightly differently per ordering
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=5e-5)
        # and it covers at least as much as the culled pass
        zc = rasterize_pallas(clip, {}, 64, 128, interpret=True,
                              depth_only=True)
        assert (np.asarray(z1) < 1e8).sum() >= (np.asarray(zc) < 1e8).sum()

    def test_tiny_scene_padding(self):
        """Fewer triangles than one chunk still rasterizes (row padding)."""
        rng = np.random.default_rng(4)
        clip, attrs = random_tris(rng, t=3)
        g = rasterize_pallas(clip, attrs, 32, 128, interpret=True)
        assert int(g.mask.sum()) > 0


class TestBinModes:
    def test_cumsum_binning_matches_topk(self):
        """bin_mode='cumsum' (counting-rank compaction) selects the same
        earliest-index triangle set per tile as lax.top_k — identical
        G-buffers, including under bin overflow."""
        h, w = 64, 128
        clip, attrs = random_tris(np.random.default_rng(9), t=60)
        for k in (16, 160):                      # overflow + headroom
            ga = rasterize_pallas(clip, attrs, h, w, k_per_tile=k,
                                  interpret=True, bin_mode="topk")
            gb = rasterize_pallas(clip, attrs, h, w, k_per_tile=k,
                                  interpret=True, bin_mode="cumsum")
            np.testing.assert_array_equal(np.asarray(gb.mask),
                                          np.asarray(ga.mask))
            np.testing.assert_allclose(np.asarray(gb.depth),
                                       np.asarray(ga.depth), atol=1e-6)
            np.testing.assert_allclose(np.asarray(gb.albedo),
                                       np.asarray(ga.albedo), atol=1e-6)

    def test_mxu_edge_mode_matches_vpu(self):
        """edge_mode='mxu' ([F*chunk,3]@[3,px] HIGHEST dot) evaluates the
        same affine forms as the VPU broadcast chains — identical
        visibility and near-identical interpolants, in both homogeneous
        and clipped modes and the depth-only path."""
        h, w = 64, 128
        clip, attrs = random_tris(np.random.default_rng(11), t=40)
        for mode in ("homogeneous", "clipped"):
            ga = rasterize_pallas(clip, attrs, h, w, interpret=True,
                                  mode=mode, edge_mode="vpu")
            gb = rasterize_pallas(clip, attrs, h, w, interpret=True,
                                  mode=mode, edge_mode="mxu")
            np.testing.assert_array_equal(np.asarray(gb.mask),
                                          np.asarray(ga.mask))
            np.testing.assert_allclose(np.asarray(gb.depth),
                                       np.asarray(ga.depth), atol=1e-5)
            np.testing.assert_allclose(np.asarray(gb.albedo),
                                       np.asarray(ga.albedo), atol=1e-5)
        za = rasterize_pallas(clip, {}, h, w, interpret=True,
                              depth_only=True, edge_mode="vpu")
        zb = rasterize_pallas(clip, {}, h, w, interpret=True,
                              depth_only=True, edge_mode="mxu")
        np.testing.assert_allclose(np.asarray(zb), np.asarray(za),
                                   atol=1e-5)


class TestNonTileDivisible:
    def test_192_target_matches_cropped_256(self):
        """CsmConfig map_size=192 (not a 128-lane multiple) rasterizes
        into a padded grid and crops — pixels must match the XLA
        rasterizer at the same 192 viewport (r4 session-6 finding: this
        used to trip the tile-divisibility assert)."""
        rng = np.random.default_rng(4)
        clip, attrs = random_tris(rng, t=48)
        g1 = raster.rasterize(clip, attrs, 192, 192, chunk=16)
        g2 = rasterize_pallas(clip, attrs, 192, 192, tile_h=8, tile_w=128,
                              k_per_tile=64, interpret=True)
        assert g2.depth.shape == (192, 192)
        m1 = np.asarray(g1.mask)
        m2 = np.asarray(g2.mask)
        assert (m1 == m2).mean() > 0.999
        both = m1 & m2
        assert both.sum() > 50
        # 5e-5: 2DH z = Z/W per pixel vs per-vertex divide + lerp — both
        # valid f32 roundings (same as the 64x128 case, slightly larger
        # at 192 px scale)
        np.testing.assert_allclose(np.asarray(g2.depth)[both],
                                   np.asarray(g1.depth)[both], atol=5e-5)

    def test_depth_only_192(self):
        rng = np.random.default_rng(5)
        clip, _ = random_tris(rng, t=32)
        z = rasterize_pallas(clip, {}, 192, 192, interpret=True,
                             depth_only=True, k_per_tile=64)
        assert z.shape == (192, 192)
        assert np.isfinite(np.asarray(z)).all()
