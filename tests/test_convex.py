"""Convex-polyhedron colliders + real cylinder/cone kernels.

ConvexPolyhedron / Cylinder / Cone rows of the reference shape set
(fyrox-impl/src/scene/collider.rs:511; parry SharedShape conversion at
scene/graph/physics/mod.rs:768-816). Cylinders/cones route through 12-gon
prism/pyramid hulls and the SAT kernels in physics/convex.py — replacing
the round-1 capsule proxy, whose round silhouette could not stand on a
flat end or stack.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.physics import world as wd, shapes as sh
from fyrox_tpu.physics.convex import (hull_from_points, hull_mass,
                                      prism_hull, cone_hull)

BOX_PTS = np.array([[x, y, z] for x in (-0.5, 0.5) for y in (-0.4, 0.4)
                    for z in (-0.3, 0.3)], np.float32)


class TestHullGeometry:
    def test_cube_hull_mass(self):
        v, n = hull_from_points(BOX_PTS)
        m, com, inertia = hull_mass(v, n, density=2.0)
        assert abs(m - 2.0 * 1.0 * 0.8 * 0.6) < 1e-4
        np.testing.assert_allclose(com, 0.0, atol=1e-6)
        # box inertia: m/12 * (b^2+c^2) per axis
        exp = m / 12.0 * np.array([0.8**2 + 0.6**2, 1.0 + 0.6**2,
                                   1.0 + 0.8**2])
        np.testing.assert_allclose(np.diag(inertia), exp, rtol=1e-3)

    def test_prism_cone_build(self):
        pv, pn = prism_hull(1.0, 0.5, n=12)
        cv, cn = cone_hull(1.0, 0.5, n=12)
        assert pv.shape[0] == 24 and cv.shape[0] == 13
        # circumscribed: support along +x must reach at least the radius
        assert pv[:, 0].max() >= 0.5


class TestConvexDynamics:
    def _world(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        return pb

    def _run(self, pb, steps=180, w=1):
        pt = pb.build(broadphase="dense")
        st = wd.init_physics_state(pb, pt, w)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(steps):
            st = step(st)
        return st

    def test_hull_rests_on_ground(self):
        pb = self._world()
        b = pb.add_body(position=(0, 1.0, 0))
        pb.add_collider(b, sh.CONVEX, points=BOX_PTS)
        st = self._run(pb)
        assert abs(float(st.position[0, b, 1]) - 0.4) < 0.02

    def test_cylinder_stands_on_flat_end(self):
        pb = self._world()
        b = pb.add_body(position=(0, 1.0, 0))
        pb.add_collider(b, sh.CYLINDER, [0.5, 0.4])
        st = self._run(pb)
        assert abs(float(st.position[0, b, 1]) - 0.5) < 0.02
        # up axis stays up (capsule proxy would report a round bottom)
        up = np.asarray(st.rotation[0, b])
        r = np.asarray(jax.jit(lambda q: jnp.sum(
            jnp.zeros(()) + q[0] * 0))(up))  # noqa - keep jit warm path quiet
        y_axis = 1.0 - 2.0 * (up[0] ** 2 + up[2] ** 2)   # R[1,1]
        assert y_axis > 0.98, up

    def test_ball_rests_on_hull(self):
        pb = self._world()
        b1 = pb.add_body(position=(0, 1.0, 0))
        pb.add_collider(b1, sh.CONVEX, points=BOX_PTS)
        b2 = pb.add_body(position=(0, 3.0, 0))
        pb.add_collider(b2, sh.BALL, [0.3])
        st = self._run(pb)
        assert abs(float(st.position[0, b2, 1]) - 1.1) < 0.03

    def test_hull_stack_stays(self):
        pb = self._world()
        b1 = pb.add_body(position=(0, 0.5, 0))
        pb.add_collider(b1, sh.CONVEX, points=BOX_PTS)
        b2 = pb.add_body(position=(0.05, 1.4, 0))
        pb.add_collider(b2, sh.CONVEX, points=BOX_PTS)
        st = self._run(pb)
        assert abs(float(st.position[0, b2, 1]) - 1.2) < 0.05


class TestSlabConvex:
    """Convex colliders on the slab (production TPU) broadphase path."""

    def test_hull_stack_and_mixed_shapes_slab(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        b1 = pb.add_body(position=(0, 1.0, 0))
        pb.add_collider(b1, sh.CONVEX, points=BOX_PTS)
        b2 = pb.add_body(position=(0.05, 1.9, 0))
        pb.add_collider(b2, sh.CONVEX, points=BOX_PTS)
        ball = pb.add_body(position=(3.0, 2.0, 0))
        pb.add_collider(ball, sh.BALL, [0.3])
        pt = pb.build(broadphase="slab")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(180):
            st = step(st)
        p = np.asarray(st.position[0])
        assert abs(p[b1, 1] - 0.4) < 0.03
        assert abs(p[b2, 1] - 1.2) < 0.05
        assert abs(p[ball, 1] - 0.3) < 0.02

    def test_ball_rests_on_hull_slab(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HALFSPACE, [0, 0, 0])
        b1 = pb.add_body(position=(0, 1.0, 0))
        pb.add_collider(b1, sh.CONVEX, points=BOX_PTS)
        b2 = pb.add_body(position=(0, 3.0, 0))
        pb.add_collider(b2, sh.BALL, [0.3])
        pt = pb.build(broadphase="slab")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(200):
            st = step(st)
        assert abs(float(st.position[0, b2, 1]) - 1.1) < 0.05


class TestEdgeEdge:
    def test_crossed_boxes_edge_contact(self):
        """Two long boxes crossed at 90° touching edge-to-edge: the SAT
        must pick the vertical cross axis and place the contact at the
        crossing point (parry edge-clipping behavior)."""
        import jax.numpy as jnp
        from fyrox_tpu.physics import convex as cx
        # box A along x at origin (top face y=+0.1); box B along z, rotated
        # 45° about its long axis so its EDGE (not a face) points down,
        # hovering so the edge dips just into A's top face
        va, vma, na, nma = cx.box_as_hull(jnp.asarray([2.0, 0.1, 0.1]))
        vb, vmb, nb, nmb = cx.box_as_hull(jnp.asarray([0.1, 0.1, 2.0]))
        s2 = float(np.sqrt(0.5))
        rot_a = jnp.eye(3)
        # rotate B by 45° about z: its lower edge (sharp) points down
        c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
        rot_b = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                            jnp.float32)
        # B's lowest point is at y_b - 0.1*sqrt(2); put it 0.02 into A's top
        yb = 0.1 + 0.1 * np.sqrt(2) - 0.02
        m = cx.convex_convex(jnp.zeros(3), rot_a, va, vma, na, nma,
                             jnp.asarray([0.0, yb, 0.3]), rot_b,
                             vb, vmb, nb, nmb, jnp.asarray(0.05))
        assert bool(m.active[0])
        n = np.asarray(m.normal)
        assert abs(abs(n[1]) - 1.0) < 0.05        # near-vertical normal
        pt = np.asarray(m.points[0])
        assert abs(pt[0]) < 0.2 and abs(pt[2]) < 0.2  # inside the overlap
        assert float(m.depth[0]) > 0.0            # penetrating
