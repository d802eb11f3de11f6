"""Golden tests for the core math layer vs independent numpy references."""
import numpy as np
import jax.numpy as jnp
import pytest

from fyrox_tpu.core import aabb, curve, frustum, quat, ray, transform


def np_quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def np_quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rand_unit_quat(rng, shape=()):
    q = rng.standard_normal(shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuat:
    def test_mul_matches_matrix_composition(self):
        rng = np.random.default_rng(0)
        a = rand_unit_quat(rng, (32,))
        b = rand_unit_quat(rng, (32,))
        got = np.asarray(quat.mul(jnp.asarray(a), jnp.asarray(b)))
        for i in range(32):
            m = np_quat_to_mat(a[i]) @ np_quat_to_mat(b[i])
            np.testing.assert_allclose(np_quat_to_mat(got[i]), m, atol=1e-5)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(1)
        q = rand_unit_quat(rng, (64,))
        v = rng.standard_normal((64, 3)).astype(np.float32)
        got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
        want = np.einsum("nij,nj->ni", np.stack([np_quat_to_mat(qq) for qq in q]), v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_to_from_mat3_roundtrip(self):
        rng = np.random.default_rng(2)
        q = rand_unit_quat(rng, (128,))
        m = quat.to_mat3(jnp.asarray(q))
        q2 = np.asarray(quat.from_mat3(m))
        # q and -q are the same rotation
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)

    def test_from_euler_axis_order(self):
        # roll=pi/2 about X must map Y → Z
        q = quat.from_euler(np.pi / 2, 0.0, 0.0)
        v = quat.rotate(q, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 0, 1], atol=1e-6)
        # yaw=pi/2 about Z must map X → Y
        q = quat.from_euler(0.0, 0.0, np.pi / 2)
        v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-6)

    def test_from_euler_composition_order(self):
        # q = Rz(yaw) * Ry(pitch) * Rx(roll)
        r, p, y = 0.3, -0.7, 1.1
        q = np.asarray(quat.from_euler(r, p, y))
        qx = np.asarray(quat.from_axis_angle(jnp.array([1.0, 0, 0]), r))
        qy = np.asarray(quat.from_axis_angle(jnp.array([0.0, 1, 0]), p))
        qz = np.asarray(quat.from_axis_angle(jnp.array([0.0, 0, 1]), y))
        want = np_quat_mul(qz, np_quat_mul(qy, qx))
        np.testing.assert_allclose(q, want, atol=1e-6)

    def test_nlerp_endpoints_and_sign(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rand_unit_quat(rng, (8,)))
        b = jnp.asarray(rand_unit_quat(rng, (8,)))
        np.testing.assert_allclose(np.asarray(quat.nlerp(a, b, 0.0)), np.asarray(a), atol=1e-6)
        q1 = np.asarray(quat.nlerp(a, b, 1.0))
        bb = np.asarray(b)
        sign = np.sign(np.sum(np.asarray(a) * bb, axis=-1, keepdims=True))
        np.testing.assert_allclose(q1, bb * sign, atol=1e-6)

    def test_slerp_constant_angular_velocity(self):
        a = jnp.asarray(np.array([0, 0, 0, 1], np.float32))
        b = np.asarray(quat.from_axis_angle(jnp.array([0.0, 1, 0]), np.pi / 2))
        mid = np.asarray(quat.slerp(a, jnp.asarray(b), 0.5))
        want = np.asarray(quat.from_axis_angle(jnp.array([0.0, 1, 0]), np.pi / 4))
        np.testing.assert_allclose(mid, want, atol=1e-6)

    def test_face_towards(self):
        q = quat.face_towards(jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        z_mapped = quat.rotate(q, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(z_mapped), [1, 0, 0], atol=1e-6)


class TestTransform:
    def test_trs_matrix(self):
        rng = np.random.default_rng(4)
        pos = rng.standard_normal((16, 3)).astype(np.float32)
        rot = rand_unit_quat(rng, (16,))
        scl = rng.uniform(0.5, 2.0, (16, 3)).astype(np.float32)
        m = np.asarray(transform.compose_trs(jnp.asarray(pos), jnp.asarray(rot), jnp.asarray(scl)))
        for i in range(16):
            t = np.eye(4, dtype=np.float32); t[:3, 3] = pos[i]
            r = np.eye(4, dtype=np.float32); r[:3, :3] = np_quat_to_mat(rot[i])
            s = np.diag(np.append(scl[i], 1.0)).astype(np.float32)
            np.testing.assert_allclose(m[i], t @ r @ s, atol=1e-5)

    def test_full_transform_matches_matrix_chain(self):
        """local_matrix == T*Roff*Rp*Rpre*R*Rpost⁻¹*Rp⁻¹*Soff*Sp*S*Sp⁻¹
        (the reference formula, transform.rs:453)."""
        rng = np.random.default_rng(5)
        n = 8

        def T(v):
            m = np.eye(4, dtype=np.float64); m[:3, 3] = v; return m

        def R(q):
            m = np.eye(4, dtype=np.float64); m[:3, :3] = np_quat_to_mat(q); return m

        def S(v):
            return np.diag(np.append(v, 1.0)).astype(np.float64)

        pos = rng.standard_normal((n, 3))
        rot = rand_unit_quat(rng, (n,))
        pre = rand_unit_quat(rng, (n,))
        post = rand_unit_quat(rng, (n,))
        scl = rng.uniform(0.5, 2.0, (n, 3))
        roff, rp, soff, sp = (rng.standard_normal((n, 3)) for _ in range(4))

        tr = transform.Transform(
            position=jnp.asarray(pos, jnp.float32),
            rotation=jnp.asarray(rot, jnp.float32),
            scale=jnp.asarray(scl, jnp.float32),
            pre_rotation=jnp.asarray(pre, jnp.float32),
            post_rotation=jnp.asarray(post, jnp.float32),
            rotation_offset=jnp.asarray(roff, jnp.float32),
            rotation_pivot=jnp.asarray(rp, jnp.float32),
            scaling_offset=jnp.asarray(soff, jnp.float32),
            scaling_pivot=jnp.asarray(sp, jnp.float32),
        )
        got = np.asarray(transform.local_matrix(tr))
        for i in range(n):
            want = (T(pos[i]) @ T(roff[i]) @ T(rp[i]) @ R(pre[i]) @ R(rot[i])
                    @ np.linalg.inv(R(post[i])) @ T(-rp[i]) @ T(soff[i]) @ T(sp[i])
                    @ S(scl[i]) @ T(-sp[i]))
            np.testing.assert_allclose(got[i], want, atol=1e-4)

    def test_invert_affine(self):
        rng = np.random.default_rng(6)
        pos = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
        rot = jnp.asarray(rand_unit_quat(rng, (4,)))
        scl = jnp.asarray(rng.uniform(0.5, 2.0, (4, 3)), jnp.float32)
        m = transform.compose_trs(pos, rot, scl)
        ident = np.asarray(transform.mat4_mul(m, transform.invert_affine(m)))
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)

    def test_decompose_roundtrip(self):
        rng = np.random.default_rng(7)
        pos = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
        rot = jnp.asarray(rand_unit_quat(rng, (8,)))
        scl = jnp.asarray(rng.uniform(0.5, 2.0, (8, 3)), jnp.float32)
        m = transform.compose_trs(pos, rot, scl)
        p2, r2, s2 = transform.decompose_mat4(m)
        m2 = transform.compose_trs(p2, r2, s2)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


class TestAabbFrustumRay:
    def test_aabb_ops(self):
        mins = jnp.array([[0.0, 0, 0], [-1, -1, -1]])
        maxs = jnp.array([[1.0, 1, 1], [1, 1, 1]])
        np.testing.assert_allclose(np.asarray(aabb.volume(mins, maxs)), [1.0, 8.0])
        assert bool(aabb.intersects_aabb(mins[0], maxs[0], mins[1], maxs[1]))
        assert not bool(aabb.intersects_aabb(mins[0], maxs[0],
                                             jnp.array([2.0, 2, 2]), jnp.array([3.0, 3, 3])))
        assert bool(aabb.intersects_sphere(mins[0], maxs[0], jnp.array([2.0, 0.5, 0.5]),
                                           jnp.asarray(1.1)))
        assert not bool(aabb.intersects_sphere(mins[0], maxs[0], jnp.array([2.0, 0.5, 0.5]),
                                               jnp.asarray(0.9)))

    def test_aabb_transform_equals_corner_transform(self):
        rng = np.random.default_rng(8)
        mins = jnp.asarray(rng.uniform(-2, 0, (8, 3)), jnp.float32)
        maxs = jnp.asarray(rng.uniform(0.1, 2, (8, 3)), jnp.float32)
        rot = jnp.asarray(rand_unit_quat(rng, (8,)))
        pos = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
        scl = jnp.ones((8, 3), jnp.float32)
        m = transform.compose_trs(pos, rot, scl)
        got_min, got_max = aabb.transform(mins, maxs, m)
        cs = aabb.corners(mins, maxs)
        tc = transform.transform_point(m[:, None], cs)
        np.testing.assert_allclose(np.asarray(got_min), np.asarray(jnp.min(tc, axis=-2)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_max), np.asarray(jnp.max(tc, axis=-2)), atol=1e-4)

    def _perspective(self, fovy, aspect, znear, zfar):
        """Row-major RH perspective (nalgebra new_perspective convention)."""
        f = 1.0 / np.tan(fovy / 2)
        m = np.zeros((4, 4), np.float32)
        m[0, 0] = f / aspect
        m[1, 1] = f
        m[2, 2] = (zfar + znear) / (znear - zfar)
        m[2, 3] = 2 * zfar * znear / (znear - zfar)
        m[3, 2] = -1.0
        return m

    def test_frustum_point_and_aabb(self):
        vp = jnp.asarray(self._perspective(np.pi / 2, 1.0, 0.1, 100.0))
        planes = frustum.from_view_projection(vp)
        # camera looks down -Z
        assert bool(frustum.contains_point(planes, jnp.array([0.0, 0, -10])))
        assert not bool(frustum.contains_point(planes, jnp.array([0.0, 0, 10])))
        assert not bool(frustum.contains_point(planes, jnp.array([0.0, 0, -200])))
        # box straddling the near plane intersects; box behind camera doesn't
        assert bool(frustum.intersects_aabb(planes, jnp.array([-1.0, -1, -5]),
                                            jnp.array([1.0, 1, -4])))
        assert not bool(frustum.intersects_aabb(planes, jnp.array([-1.0, -1, 4]),
                                                jnp.array([1.0, 1, 5])))
        assert bool(frustum.intersects_sphere(planes, jnp.array([0.0, 0, -5]), jnp.asarray(1.0)))
        # sphere centered outside but overlapping left plane
        assert bool(frustum.intersects_sphere(planes, jnp.array([-5.5, 0, -5]), jnp.asarray(1.0)))

    def test_ray_aabb_sphere_triangle(self):
        o = jnp.array([0.0, 0, 0])
        d = jnp.array([1.0, 0, 0])
        hit, tmin, _ = ray.aabb(o, d, jnp.array([2.0, -1, -1]), jnp.array([3.0, 1, 1]))
        assert bool(hit) and abs(float(tmin) - 2.0) < 1e-6
        hit, _, _ = ray.aabb(o, d, jnp.array([-3.0, -1, -1]), jnp.array([-2.0, 1, 1]))
        assert not bool(hit)

        hit, t = ray.sphere(o, d, jnp.array([5.0, 0, 0]), jnp.asarray(1.0))
        assert bool(hit) and abs(float(t) - 4.0) < 1e-5
        hit, _ = ray.sphere(o, d, jnp.array([5.0, 3, 0]), jnp.asarray(1.0))
        assert not bool(hit)

        v0 = jnp.array([3.0, -1, -1]); v1 = jnp.array([3.0, 2, -1]); v2 = jnp.array([3.0, -1, 2])
        hit, t, u, v = ray.triangle(o, d, v0, v1, v2)
        assert bool(hit) and abs(float(t) - 3.0) < 1e-5
        hit, _, _, _ = ray.triangle(o, d, v0 + 10, v1 + 10, v2 + 10)
        assert not bool(hit)


class TestCurve:
    def _np_sample(self, keys, t):
        """Scalar numpy re-implementation mirroring curve.rs fetch_at."""
        keys = sorted(keys, key=lambda k: k["time"])
        if t <= keys[0]["time"]:
            return keys[0]["value"]
        if t >= keys[-1]["time"]:
            return keys[-1]["value"]
        for i in range(1, len(keys)):
            if t < keys[i]["time"]:
                l, r = keys[i - 1], keys[i]
                tt = (t - l["time"]) / (r["time"] - l["time"])
                lk = l.get("kind", 1)
                rk = r.get("kind", 1)
                if lk == 0:
                    return r["value"] if tt == 1.0 else l["value"]
                if lk == 1:
                    return l["value"] + (r["value"] - l["value"]) * tt
                m0 = l.get("rt", 0.0)
                m1 = r.get("lt", 0.0) if rk == 2 else 0.0
                p0, p1 = l["value"], r["value"]
                scale = abs(p1 - p0)
                t2, t3 = tt * tt, tt ** 3
                return ((2 * t3 - 3 * t2 + 1) * p0 + (t3 - 2 * t2 + tt) * m0 * scale
                        + (-2 * t3 + 3 * t2) * p1 + (t3 - t2) * m1 * scale)
        raise AssertionError

    def test_matches_reference_semantics(self):
        rng = np.random.default_rng(9)
        curves = []
        for _ in range(20):
            nk = rng.integers(1, 7)
            times = np.sort(rng.uniform(0, 10, nk))
            keys = [dict(time=float(tt), value=float(rng.standard_normal()),
                         kind=int(rng.integers(0, 3)),
                         lt=float(rng.standard_normal()), rt=float(rng.standard_normal()))
                    for tt in times]
            curves.append(keys)
        cs = curve.pack_curves(curves)
        for t in [-1.0, 0.0, 0.5, 2.3, 5.0, 9.99, 10.0, 42.0]:
            got = np.asarray(curve.sample(cs, t))
            want = np.array([self._np_sample(c, t) for c in curves], np.float32)
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"t={t}")

    def test_batched_times(self):
        cs = curve.pack_curves([[dict(time=0.0, value=0.0), dict(time=1.0, value=2.0)]])
        ts = jnp.linspace(0, 1, 11)[:, None]  # [11, 1]
        got = np.asarray(curve.sample(cs, ts))[:, 0]
        np.testing.assert_allclose(got, np.linspace(0, 2, 11), atol=1e-6)
