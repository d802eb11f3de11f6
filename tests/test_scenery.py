"""Heightfield + trimesh colliders (physics/scenery.py) — the last rows of
the reference shape set (fyrox-impl/src/scene/collider.rs:511)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.physics import world as wd, shapes as sh
from fyrox_tpu.physics.scenery import hf_sample

R = 17
XS = np.linspace(-8, 8, R)
BOWL = (0.05 * (XS[None, :] ** 2 + XS[:, None] ** 2) * 0.2).astype(np.float32)


def _bowl_height(x, z):
    u = (x / 16 + 0.5) * (R - 1)
    v = (z / 16 + 0.5) * (R - 1)
    i0, j0 = int(u), int(v)
    fu, fv = u - i0, v - j0
    return ((BOWL[j0, i0] * (1 - fu) + BOWL[j0, i0 + 1] * fu) * (1 - fv)
            + (BOWL[j0 + 1, i0] * (1 - fu) + BOWL[j0 + 1, i0 + 1] * fu) * fv)


class TestHeightfield:
    def test_bilinear_sample_matches_numpy(self):
        got = float(hf_sample(jnp.asarray(BOWL), 16.0, 16.0,
                              jnp.asarray(1.3), jnp.asarray(-2.7)))
        assert abs(got - _bowl_height(1.3, -2.7)) < 1e-5

    def test_shapes_rest_on_heightfield(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HEIGHTFIELD, heights=BOWL, size=(16.0, 16.0))
        ball = pb.add_body(position=(2.0, 3.0, 0.0))
        pb.add_collider(ball, sh.BALL, [0.4])
        box = pb.add_body(position=(-2.0, 3.0, 1.0))
        pb.add_collider(box, sh.CUBOID, [0.4, 0.4, 0.4])
        cap = pb.add_body(position=(0.0, 3.0, -2.0))
        pb.add_collider(cap, sh.CAPSULE, [0.3, 0.2])
        pt = pb.build(broadphase="dense")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(240):
            st = step(st)
        p = np.asarray(st.position[0])
        assert abs(p[ball, 1] - (_bowl_height(p[ball, 0], p[ball, 2]) + 0.4)) < 0.02
        assert abs(p[box, 1] - (_bowl_height(p[box, 0], p[box, 2]) + 0.4)) < 0.05
        assert p[cap, 1] > 0.15                        # resting, not sunk
        # the bowl makes the ball roll toward the centre
        assert abs(p[ball, 0]) < 1.0

    def test_dynamic_heightfield_rejected(self):
        pb = wd.PhysicsBuilder()
        b = pb.add_body()
        with pytest.raises(ValueError):
            pb.add_collider(b, sh.HEIGHTFIELD, heights=BOWL, size=(16, 16))


class TestTrimesh:
    def test_ball_rolls_down_ramp_and_off(self):
        v = np.asarray([[-2, 0, -2], [2, 1, -2], [2, 1, 2], [-2, 0, 2]],
                       np.float32)
        f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.TRIMESH, triangles=(v, f), friction=0.1)
        b = pb.add_body(position=(0.0, 2.0, 0.0))
        pb.add_collider(b, sh.BALL, [0.3], friction=0.1)
        pt = pb.build(broadphase="dense")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        min_on_ramp = 10.0
        for i in range(90):
            st = step(st)
            x = float(st.position[0, b, 0])
            y = float(st.position[0, b, 1])
            if -2.0 <= x <= 2.0:
                # while above the ramp it must stay above the surface
                surf = (x + 2.0) / 4.0
                min_on_ramp = min(min_on_ramp, y - surf)
        assert min_on_ramp > 0.1, min_on_ramp      # never sank through
        assert float(st.position[0, b, 0]) < -1.0  # rolled down (-x)

    def test_box_rests_on_flat_trimesh(self):
        v = np.asarray([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                       np.float32)
        f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.TRIMESH, triangles=(v, f))
        b = pb.add_body(position=(0.0, 1.5, 0.0))
        pb.add_collider(b, sh.CUBOID, [0.4, 0.4, 0.4])
        pt = pb.build(broadphase="dense")
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(180):
            st = step(st)
        assert abs(float(st.position[0, b, 1]) - 0.4) < 0.05


@pytest.mark.slow
class TestSlabScenery:
    """Scenery through the slab v2 production path (physics/slab2.py
    big-partner sampling) — round-2 verdict item 2: terrain scenes must
    not be locked out of the fast path."""

    def test_shapes_rest_on_heightfield_slab(self):
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HEIGHTFIELD, heights=BOWL, size=(16.0, 16.0))
        ball = pb.add_body(position=(2.0, 3.0, 0.0))
        pb.add_collider(ball, sh.BALL, [0.4])
        box = pb.add_body(position=(-2.0, 3.0, 1.0))
        pb.add_collider(box, sh.CUBOID, [0.4, 0.4, 0.4])
        cap = pb.add_body(position=(0.0, 3.0, -2.0))
        pb.add_collider(cap, sh.CAPSULE, [0.3, 0.2])
        pt = pb.build(broadphase="slab")
        from fyrox_tpu.physics import slab2
        assert slab2.supports(pt)
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(240):
            st = step(st)
        p = np.asarray(st.position[0])
        assert abs(p[ball, 1]
                   - (_bowl_height(p[ball, 0], p[ball, 2]) + 0.4)) < 0.02
        assert abs(p[box, 1]
                   - (_bowl_height(p[box, 0], p[box, 2]) + 0.4)) < 0.05
        assert p[cap, 1] > 0.15

    def test_pile_on_terrain_slab(self):
        """A mixed pile dropped onto the bowl runs the slab path end to
        end: nothing tunnels through the terrain, and the pile comes to
        rest ON the surface (the round-2 NotImplementedError is gone)."""
        rng = np.random.default_rng(5)
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.HEIGHTFIELD, heights=BOWL, size=(16.0, 16.0),
                        friction=0.7)
        n = 60
        for i in range(n):
            x = rng.uniform(-2.5, 2.5)
            z = rng.uniform(-2.5, 2.5)
            y = 1.5 + (i % 5) * 0.55
            b = pb.add_body(position=(x, y, z))
            if i % 2:
                pb.add_collider(b, sh.BALL, [0.25], friction=0.5)
            else:
                pb.add_collider(b, sh.CUBOID, [0.2, 0.2, 0.2], friction=0.5)
        pt = pb.build(broadphase="slab")
        st = wd.init_physics_state(pb, pt, 1)
        @jax.jit
        def roll(s):
            return jax.lax.scan(
                lambda ss, _: (wd.step_physics(ss, pt, 1 / 60), None),
                s, None, length=300)[0]
        st = roll(st)
        p = np.asarray(st.position[0, 1:])
        assert np.isfinite(p).all()
        surf = np.asarray([_bowl_height(x, z) for x, z, in p[:, [0, 2]]])
        # no tunneling: every body center above its local surface
        assert (p[:, 1] > surf - 0.05).all(), (p[:, 1] - surf).min()
        # resting: near the surface, not floating
        assert np.median(p[:, 1] - surf) < 1.2
        v = np.asarray(jnp.linalg.norm(st.linvel[0, 1:], axis=-1))
        assert np.median(v) < 0.5

    def test_ball_on_trimesh_slab(self):
        verts = np.asarray([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                           np.float32)
        faces = np.asarray([[0, 1, 2], [0, 2, 3]])
        pb = wd.PhysicsBuilder()
        g = pb.add_body(body_type=wd.BodyType.STATIC)
        pb.add_collider(g, sh.TRIMESH, triangles=(verts, faces))
        b = pb.add_body(position=(0.5, 2.0, 0.2))
        pb.add_collider(b, sh.BALL, [0.3])
        pt = pb.build(broadphase="slab")
        from fyrox_tpu.physics import slab2
        assert slab2.supports(pt)
        st = wd.init_physics_state(pb, pt, 1)
        step = jax.jit(lambda s: wd.step_physics(s, pt, 1 / 60))
        for _ in range(240):
            st = step(st)
        y = float(st.position[0, b, 1])
        assert abs(y - 0.3) < 0.05, y

    def test_slab_matches_dense_on_terrain(self):
        """Same scene, dense vs slab: trajectories stay close through the
        settle (the analytic-gradient heightfield normal converges to the
        dense path's finite differences)."""
        def build():
            pb = wd.PhysicsBuilder()
            g = pb.add_body(body_type=wd.BodyType.STATIC)
            pb.add_collider(g, sh.HEIGHTFIELD, heights=BOWL,
                            size=(16.0, 16.0))
            b = pb.add_body(position=(1.0, 1.5, 0.5))
            pb.add_collider(b, sh.BALL, [0.35])
            return pb
        outs = []
        for mode in ("dense", "slab"):
            pb = build()
            pt = pb.build(broadphase=mode)
            st = wd.init_physics_state(pb, pt, 1)
            step = jax.jit(lambda s, pt=pt: wd.step_physics(s, pt, 1 / 60))
            for _ in range(120):
                st = step(st)
            outs.append(np.asarray(st.position[0, 1]))
        assert np.linalg.norm(outs[0] - outs[1]) < 0.05, outs
