"""fyrox-math free functions + Rect (mirrors the reference's own unit
tests, fyrox-math/src/lib.rs:893-1070)."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from fyrox_tpu.core.mathutil import (
    Rect, PlaneClass, barycentric_is_inside, classify_plane, cubicf,
    cubicf_derivative, get_barycentric_coords, get_barycentric_coords_2d,
    get_farthest_point, get_polygon_normal, get_signed_triangle_area,
    ieee_remainder, lerpf, ray_rect_intersection, round_to_step,
    spherical_to_cartesian, triangle_area, vec3_to_vec2_by_plane,
    wrap_angle)


class TestRect:
    def test_constructors_getters(self):
        r = Rect(0, 0, 1, 1)
        assert r.with_position((1, 1)) == Rect(1, 1, 1, 1)
        assert r.with_size((10, 10)) == Rect(0, 0, 10, 10)
        assert r.left_top_corner() == (0, 0)
        assert r.right_bottom_corner() == (1, 1)

    def test_inflate_deflate(self):
        assert Rect(0, 0, 1, 1).inflate(5, 5) == Rect(-5, -5, 11, 11)
        assert Rect(-5, -5, 11, 11).deflate(5, 5) == Rect(0, 0, 1, 1)

    def test_contains_center(self):
        r = Rect(0, 0, 10, 10)
        for p in [(0, 0), (0, 10), (10, 0), (10, 10), (5, 5)]:
            assert r.contains(p)
        assert not r.contains((0, 20))
        assert r.center() == (5, 5)

    def test_push_extend(self):
        r = Rect(10, 10, 11, 11).push((0, 0))
        assert r == Rect(0, 0, 21, 21)
        assert r.push((30, 30)) == Rect(0, 0, 30, 30)
        r2 = Rect(0.0, 0.0, 1.0, 1.0).extend_to_contain(Rect(1, 1, 1, 1))
        assert r2 == Rect(0, 0, 2, 2)

    def test_clip_by(self):
        r = Rect(0, 0, 10, 10)
        assert r.clip_by(Rect(2, 2, 1, 1)) == Rect(2, 2, 1, 1)
        assert r.clip_by(Rect(0, 0, 15, 15)) == Rect(0, 0, 10, 10)
        assert r.clip_by(Rect(-3, 1, 1, 1)) is None
        assert r.clip_by(Rect(11, 1, 1, 1)) is None

    def test_intersects_circle(self):
        r = Rect(0.0, 0.0, 1.0, 1.0)
        assert not r.intersects_circle((5.0, 5.0), 1.0)
        assert r.intersects_circle((0.0, 0.0), 1.0)
        assert r.intersects_circle((-0.5, -0.5), 1.0)


class TestFreeFunctions:
    def test_classify_and_triplanar(self):
        assert classify_plane((0, 0, 1)) == PlaneClass.XY
        assert classify_plane((1, 0.1, 0)) == PlaneClass.YZ
        assert classify_plane((0, -2, 0.5)) == PlaneClass.XZ
        p = jnp.asarray([1.0, 2.0, 3.0])
        u, v = vec3_to_vec2_by_plane(PlaneClass.XY, (0, 0, 1), p)
        assert (float(u), float(v)) == (1.0, 2.0)
        u, v = vec3_to_vec2_by_plane(PlaneClass.XY, (0, 0, -1), p)
        assert (float(u), float(v)) == (2.0, 1.0)

    def test_polygon_normal(self):
        quad = [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)]
        n = get_polygon_normal(quad)
        np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-6)
        with pytest.raises(ValueError):
            get_polygon_normal([(0, 0, 0), (0, 0, 0), (0, 0, 0)])

    def test_angles_and_steps(self):
        assert abs(wrap_angle(3 * math.pi) - math.pi) < 1e-6
        assert abs(wrap_angle(-0.5) - (2 * math.pi - 0.5)) < 1e-6
        assert abs(ieee_remainder(5.0, 2.0) - 1.0) < 1e-9
        assert abs(round_to_step(5.3, 0.5) - 5.5) < 1e-9

    def test_cubic_hermite(self):
        assert cubicf(1.0, 3.0, 0.0, 0.5, 0.5) == 1.0
        assert cubicf(1.0, 3.0, 1.0, 0.5, 0.5) == 3.0
        # derivative at endpoints equals the tangents
        assert abs(cubicf_derivative(1.0, 3.0, 0.0, 0.5, 0.7) - 0.5) < 1e-6
        assert abs(cubicf_derivative(1.0, 3.0, 1.0, 0.5, 0.7) - 0.7) < 1e-6
        assert abs(lerpf(2.0, 4.0, 0.25) - 2.5) < 1e-9

    def test_support_and_barycentric(self):
        pts = [(0, 0, 0), (1, 0, 0), (0, 2, 0)]
        far = np.asarray(get_farthest_point(pts, jnp.asarray([0.0, 1.0, 0.0])))
        np.testing.assert_allclose(far, [0, 2, 0])
        u, v, w = get_barycentric_coords((0.25, 0.25, 0.0), (0, 0, 0),
                                         (1, 0, 0), (0, 1, 0))
        np.testing.assert_allclose([float(u), float(v), float(w)],
                                   [0.5, 0.25, 0.25], atol=1e-6)
        assert bool(barycentric_is_inside((u, v, w)))
        u2, v2, w2 = get_barycentric_coords_2d((2.0, 2.0), (0, 0), (1, 0),
                                               (0, 1))
        assert not bool(barycentric_is_inside((u2, v2, w2)))

    def test_areas_and_spherical(self):
        assert abs(float(triangle_area((0, 0, 0), (1, 0, 0), (0, 1, 0)))
                   - 0.5) < 1e-6
        assert abs(get_signed_triangle_area((0, 0), (1, 0), (0, 1))
                   + 0.5) < 1e-6 or \
               abs(get_signed_triangle_area((0, 0), (1, 0), (0, 1))
                   - 0.5) < 1e-6
        x, y, z = spherical_to_cartesian(0.0, math.pi / 2, 2.0)
        np.testing.assert_allclose([x, y, z], [2, 0, 0], atol=1e-6)

    def test_ray_rect(self):
        r = Rect(1.0, 1.0, 2.0, 2.0)
        hit = ray_rect_intersection(r, (0.0, 2.0), (1.0, 0.0))
        assert hit is not None and abs(hit[0] - 1.0) < 1e-6
        assert ray_rect_intersection(r, (0.0, 4.5), (1.0, 0.0)) is None
        # ray starting inside hits on exit
        hit2 = ray_rect_intersection(r, (2.0, 2.0), (1.0, 0.0))
        assert hit2 is not None and abs(hit2[0] - 1.0) < 1e-6
