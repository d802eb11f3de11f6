"""Physics tests: analytic trajectories, contact generation, resting
stability, restitution, friction, stacking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.core import quat
from fyrox_tpu.physics import (BALL, CAPSULE, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder, init_physics_state,
                               narrowphase, step_physics)

DT = 1.0 / 60.0


def make_world(objs, num_worlds=1, **kw):
    """objs: list of (body_type, shape, params, pos, rot, extra)."""
    b = PhysicsBuilder()
    for o in objs:
        extra = o[5] if len(o) > 5 else {}
        body_kw = {k: extra[k] for k in ("lin_damping", "ang_damping", "gravity_scale")
                   if k in extra}
        col_kw = {k: extra[k] for k in ("friction", "restitution", "density")
                  if k in extra}
        bi = b.add_body(body_type=o[0], position=o[3],
                        rotation=o[4] if o[4] is not None else (0, 0, 0, 1), **body_kw)
        b.add_collider(bi, o[1], o[2], **col_kw)
    t = b.build(**kw)
    s = init_physics_state(b, t, num_worlds)
    return b, t, s


class TestIntegration:
    def test_free_fall_matches_analytic(self):
        _, t, s = make_world([(BodyType.DYNAMIC, BALL, [0.5], (0, 100, 0), None)])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        n = 60
        for _ in range(n):
            s = step(s)
        # TGS semi-implicit Euler at substep h = DT/4: y = y0 - g*h^2*m(m+1)/2
        m = n * 4
        h = DT / 4.0
        want = 100.0 - 9.81 * h * h * m * (m + 1) / 2.0
        np.testing.assert_allclose(float(s.position[0, 0, 1]), want, atol=1e-4)
        np.testing.assert_allclose(float(s.linvel[0, 0, 1]), -9.81 * DT * n, atol=1e-4)

    def test_static_body_never_moves(self):
        _, t, s = make_world([(BodyType.STATIC, CUBOID, [1, 1, 1], (0, 5, 0), None)])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(10):
            s = step(s)
        np.testing.assert_allclose(np.asarray(s.position[0, 0]), [0, 5, 0], atol=1e-7)

    def test_angular_velocity_rotates_body(self):
        _, t, s = make_world([(BodyType.DYNAMIC, BALL, [0.5], (0, 0, 0), None,
                               dict(gravity_scale=0.0))])
        s = s._replace(angvel=s.angvel.at[0, 0].set(jnp.asarray([0.0, np.pi, 0.0])))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(60):  # 1 s → half turn about Y
            s = step(s)
        ang = 2.0 * np.arccos(np.clip(abs(float(s.rotation[0, 0, 3])), 0, 1))
        np.testing.assert_allclose(ang, np.pi, atol=0.02)

    def test_damping(self):
        _, t, s = make_world([(BodyType.DYNAMIC, BALL, [0.5], (0, 0, 0), None,
                               dict(gravity_scale=0.0, lin_damping=1.0))])
        s = s._replace(linvel=s.linvel.at[0, 0, 0].set(1.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        v = 1.0
        for _ in range(30):
            s = step(s)
            v = v / (1.0 + DT * 1.0)
        np.testing.assert_allclose(float(s.linvel[0, 0, 0]), v, rtol=1e-5)


class TestNarrowphase:
    def _rot(self, q):
        return quat.to_mat3(jnp.asarray(q, jnp.float32))

    def test_ball_ball(self):
        m = narrowphase.ball_ball(jnp.asarray([0.0, 0, 0]), jnp.asarray(1.0),
                                  jnp.asarray([1.5, 0, 0]), jnp.asarray(1.0),
                                  jnp.asarray(0.002))
        assert bool(m.active[0])
        np.testing.assert_allclose(float(m.depth[0]), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.normal), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.points[0]), [0.75, 0, 0], atol=1e-6)

    def test_ball_halfspace(self):
        ident = self._rot([0, 0, 0, 1])
        m = narrowphase.ball_halfspace(jnp.asarray([0.0, 0.8, 0]), jnp.asarray(1.0),
                                       jnp.asarray([0.0, 0, 0]), ident, jnp.asarray(0.002))
        assert bool(m.active[0])
        np.testing.assert_allclose(float(m.depth[0]), 0.2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=1e-6)

    def test_cuboid_halfspace_four_corners(self):
        ident = self._rot([0, 0, 0, 1])
        m = narrowphase.cuboid_halfspace(jnp.asarray([0.0, 0.9, 0]), ident,
                                         jnp.asarray([1.0, 1.0, 1.0]),
                                         jnp.asarray([0.0, 0, 0]), ident,
                                         jnp.asarray(0.002))
        assert int(m.active.sum()) == 4
        np.testing.assert_allclose(np.asarray(m.depth), np.full(4, 0.1), atol=1e-5)

    def test_ball_cuboid_outside_and_inside(self):
        ident = self._rot([0, 0, 0, 1])
        m = narrowphase.ball_cuboid(jnp.asarray([0.0, 1.4, 0]), jnp.asarray(0.5),
                                    jnp.asarray([0.0, 0, 0]), ident,
                                    jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray(0.002))
        assert bool(m.active[0])
        np.testing.assert_allclose(float(m.depth[0]), 0.1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=1e-5)
        # center inside the box
        m = narrowphase.ball_cuboid(jnp.asarray([0.0, 0.9, 0]), jnp.asarray(0.5),
                                    jnp.asarray([0.0, 0, 0]), ident,
                                    jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray(0.002))
        assert bool(m.active[0]) and float(m.depth[0]) >= 0.5

    def test_cuboid_cuboid_face_contact(self):
        ident = self._rot([0, 0, 0, 1])
        m = narrowphase.cuboid_cuboid(jnp.asarray([0.0, 0, 0]), ident,
                                      jnp.asarray([1.0, 1.0, 1.0]),
                                      jnp.asarray([0.0, 1.9, 0]), ident,
                                      jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray(0.002))
        assert int(m.active.sum()) == 4
        np.testing.assert_allclose(np.asarray(m.normal), [0, 1, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.depth), np.full(4, 0.1), atol=1e-5)

    def test_capsule_capsule_parallel(self):
        ident = self._rot([0, 0, 0, 1])
        m = narrowphase.capsule_capsule(
            jnp.asarray([0.0, 0, 0]), ident, jnp.asarray(1.0), jnp.asarray(0.5),
            jnp.asarray([0.8, 0, 0]), ident, jnp.asarray(1.0), jnp.asarray(0.5),
            jnp.asarray(0.002))
        assert bool(m.active[0])
        np.testing.assert_allclose(float(m.depth[0]), 0.2, atol=1e-5)


class TestContacts:
    def test_ball_rests_on_ground(self):
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None),
            (BodyType.DYNAMIC, BALL, [0.5], (0, 2.0, 0), None),
        ])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(300):
            s = step(s)
        y = float(s.position[0, 1, 1])
        # resting height ≈ radius (within allowed_linear_error + slop)
        assert abs(y - 0.5) < 0.01, y
        assert float(jnp.abs(s.linvel[0, 1]).max()) < 0.05

    def test_restitution_bounce(self):
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None, dict(restitution=1.0)),
            (BodyType.DYNAMIC, BALL, [0.5], (0, 1.0, 0), None, dict(restitution=1.0)),
        ])
        s = s._replace(linvel=s.linvel.at[0, 1, 1].set(-5.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(10):
            s = step(s)
        v = float(s.linvel[0, 1, 1])
        assert v > 4.0, f"should bounce back near +5, got {v}"

    def test_inelastic_no_bounce(self):
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None),
            (BodyType.DYNAMIC, BALL, [0.5], (0, 0.6, 0), None),
        ])
        s = s._replace(linvel=s.linvel.at[0, 1, 1].set(-5.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(30):
            s = step(s)
        assert abs(float(s.linvel[0, 1, 1])) < 0.3

    def test_box_rests_on_ground(self):
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None),
            (BodyType.DYNAMIC, CUBOID, [0.5, 0.5, 0.5], (0, 1.0, 0), None),
        ])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(300):
            s = step(s)
        assert abs(float(s.position[0, 1, 1]) - 0.5) < 0.01
        # no spin picked up
        assert float(jnp.abs(s.angvel[0, 1]).max()) < 0.05

    def test_friction_holds_box_on_incline(self):
        """20° incline, μ=0.8 (tan20°≈0.36 < μ): box must not slide."""
        tilt = np.asarray(quat.from_euler(0.0, 0.0, np.deg2rad(20.0)), np.float32)
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), tilt, dict(friction=0.8)),
            (BodyType.DYNAMIC, CUBOID, [0.5, 0.5, 0.5], (0, 1.2, 0), tilt,
             dict(friction=0.8)),
        ])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(240):
            s = step(s)
        p0 = np.asarray(s.position[0, 1])
        for _ in range(120):
            s = step(s)
        drift = np.linalg.norm(np.asarray(s.position[0, 1]) - p0)
        assert drift < 0.05, f"box slid {drift}m on a holdable incline"

    def test_frictionless_slides_on_incline(self):
        tilt = np.asarray(quat.from_euler(0.0, 0.0, np.deg2rad(20.0)), np.float32)
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), tilt, dict(friction=0.0)),
            (BodyType.DYNAMIC, CUBOID, [0.5, 0.5, 0.5], (0, 1.2, 0), tilt,
             dict(friction=0.0)),
        ])
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(120):
            s = step(s)
        assert float(jnp.linalg.norm(s.linvel[0, 1])) > 1.0

    def test_stack_of_boxes_stays_up(self):
        objs = [(BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None)]
        for i in range(5):
            objs.append((BodyType.DYNAMIC, CUBOID, [0.5, 0.5, 0.5],
                         (0, 0.55 + i * 1.02, 0), None))
        _, t, s = make_world(objs)
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(300):
            s = step(s)
        ys = np.asarray(s.position[0, 1:, 1])
        want = 0.5 + np.arange(5) * 1.0
        np.testing.assert_allclose(ys, want, atol=0.08)
        xs = np.abs(np.asarray(s.position[0, 1:, 0]))
        assert xs.max() < 0.1, "stack drifted sideways"

    def test_worlds_independent(self):
        _, t, s = make_world([
            (BodyType.STATIC, HALFSPACE, [], (0, 0, 0), None),
            (BodyType.DYNAMIC, BALL, [0.5], (0, 3.0, 0), None),
        ], num_worlds=3)
        # world 1 gets an initial sideways kick
        s = s._replace(linvel=s.linvel.at[1, 1, 0].set(3.0))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(60):
            s = step(s)
        x = np.asarray(s.position[:, 1, 0])
        assert abs(x[0]) < 1e-5 and abs(x[2]) < 1e-5 and x[1] > 2.0


class TestComOffset:
    """Bodies whose collider (hence COM) is offset from the body origin.

    Rigid-body translation state is the origin, but linvel is COM velocity:
    a torque-free spinning body must keep its COM exactly fixed while the
    origin orbits it (advisor round-1 high finding)."""

    def test_spinning_offset_body_keeps_com_fixed(self):
        b = PhysicsBuilder()
        bi = b.add_body(body_type=BodyType.DYNAMIC, position=(0, 0, 0),
                        gravity_scale=0.0)
        b.add_collider(bi, BALL, [0.5], offset=(1.0, 0.0, 0.0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        np.testing.assert_allclose(np.asarray(t.com_local[0]), [1, 0, 0], atol=1e-7)
        s = s._replace(angvel=s.angvel.at[0, 0].set(jnp.asarray([0.0, 2 * np.pi, 0.0])))
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(60):  # one full revolution about Y
            s = step(s)
        rot = np.asarray(s.rotation[0, 0])
        pos = np.asarray(s.position[0, 0])
        com_world = pos + np.asarray(quat.rotate(jnp.asarray(rot),
                                                 jnp.asarray([1.0, 0.0, 0.0])))
        # COM stays at its initial world position (1,0,0); momentum conserved
        np.testing.assert_allclose(com_world, [1, 0, 0], atol=2e-3)
        np.testing.assert_allclose(np.asarray(s.linvel[0, 0]), 0.0, atol=1e-6)
        # the origin stays on the radius-1 circle around the COM
        np.testing.assert_allclose(
            float(np.linalg.norm(pos - np.asarray([1.0, 0.0, 0.0]))), 1.0,
            atol=2e-3)

    def test_offset_body_free_fall_translates_com(self):
        b = PhysicsBuilder()
        bi = b.add_body(body_type=BodyType.DYNAMIC, position=(0, 100, 0))
        b.add_collider(bi, BALL, [0.5], offset=(0.0, 0.0, 2.0))
        t = b.build()
        s = init_physics_state(b, t, 1)
        step = jax.jit(lambda s: step_physics(s, t, DT))
        for _ in range(30):
            s = step(s)
        # no spin: origin falls exactly like a point mass
        assert abs(float(s.position[0, 0, 1]) - 100.0) > 0.1
        np.testing.assert_allclose(float(s.position[0, 0, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.rotation[0, 0]), [0, 0, 0, 1],
                                   atol=1e-5)


class TestSegmentTriangle:
    """collider.rs:511 Segment/Triangle rows: builder-level shapes that
    lower to zero-radius capsule / single-cell trimesh."""

    def test_segment_lowers_to_zero_radius_capsule(self):
        from fyrox_tpu.physics import SEGMENT, PhysicsBuilder, BodyType
        from fyrox_tpu.physics import shapes as sh
        pb = PhysicsBuilder()
        b = pb.add_body(position=(0, 1, 0))
        pb.add_collider(b, SEGMENT, points=((0, 0, -0.5), (0, 0, 0.5)))
        t = pb.build(broadphase="dense")
        assert int(t.col_shape[0]) == sh.CAPSULE
        assert abs(float(t.col_params[0, 0]) - 0.5) < 1e-6   # half length
        assert float(t.col_params[0, 1]) == 0.0              # radius
        # offset rotation maps local +Y onto the segment direction (+Z)
        q = np.asarray(t.col_rot[0], np.float64)
        y = np.array([0.0, 1.0, 0.0])
        x_, y_, z_, w_ = q
        rot = np.array([
            [1 - 2*(y_*y_+z_*z_), 2*(x_*y_-w_*z_), 2*(x_*z_+w_*y_)],
            [2*(x_*y_+w_*z_), 1 - 2*(x_*x_+z_*z_), 2*(y_*z_-w_*x_)],
            [2*(x_*z_-w_*y_), 2*(y_*z_+w_*x_), 1 - 2*(x_*x_+y_*y_)]])
        np.testing.assert_allclose(rot @ y, [0, 0, 1], atol=1e-6)

    def test_ball_rests_on_segment(self):
        """A ball dropped onto a horizontal segment comes to rest on it
        (capsule r=0 narrowphase end-to-end, dense + slab paths)."""
        from fyrox_tpu.physics import (BALL, SEGMENT, BodyType,
                                       PhysicsBuilder)
        from fyrox_tpu.physics import world as wm
        for bp in ("dense", "slab"):
            pb = PhysicsBuilder()
            g = pb.add_body(body_type=BodyType.STATIC)
            pb.add_collider(g, SEGMENT, points=((-2, 0, 0), (2, 0, 0)),
                            friction=0.8)
            b = pb.add_body(position=(0.0, 0.6, 0.0))
            pb.add_collider(b, BALL, [0.3], friction=0.5)
            t = pb.build(broadphase=bp)
            s = wm.init_physics_state(pb, t, 1)
            step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
            for _ in range(120):
                s = step(s)
            y = float(s.position[0, 1, 1])
            assert 0.25 < y < 0.35, (bp, y)   # resting at ~ball radius

    def test_triangle_lowers_to_trimesh_and_supports(self):
        from fyrox_tpu.physics import (BALL, TRIANGLE, BodyType,
                                       PhysicsBuilder)
        from fyrox_tpu.physics import shapes as sh
        from fyrox_tpu.physics import world as wm
        pb = PhysicsBuilder()
        g = pb.add_body(body_type=BodyType.STATIC)
        pb.add_collider(g, TRIANGLE,
                        points=((-2, 0, -2), (2, 0, -2), (0, 0, 2)))
        b = pb.add_body(position=(0.0, 0.8, 0.0))
        pb.add_collider(b, BALL, [0.3])
        t = pb.build(broadphase="dense")
        assert int(t.col_shape[0]) == sh.TRIMESH
        s = wm.init_physics_state(pb, t, 1)
        step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
        for _ in range(120):
            s = step(s)
        y = float(s.position[0, 1, 1])
        assert 0.25 < y < 0.35, y             # resting on the triangle

    def test_triangle_dynamic_rejected(self):
        from fyrox_tpu.physics import TRIANGLE, PhysicsBuilder
        pb = PhysicsBuilder()
        b = pb.add_body(position=(0, 1, 0))
        with pytest.raises(ValueError):
            pb.add_collider(b, TRIANGLE,
                            points=((0, 0, 0), (1, 0, 0), (0, 0, 1)))
