"""Pool/Handle, Log, TaskPool, color, checkpointing, 2D physics mode."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core.color import ColorGradient, hsv_to_rgb, rgb_to_hsv, sample_gradient
from fyrox_tpu.core.log import Log, MessageKind
from fyrox_tpu.core.pool import Handle, Pool
from fyrox_tpu.core.task import TaskPool
from fyrox_tpu.io.checkpoint import load_state, save_state, state_to_visitor
from fyrox_tpu.io.visitor import read_rgs


class TestPool:
    def test_spawn_borrow_free_generations(self):
        p = Pool()
        h1 = p.spawn("a")
        h2 = p.spawn("b")
        assert p.borrow(h1) == "a" and p.borrow(h2) == "b"
        p.free(h1)
        assert p.try_borrow(h1) is None          # stale handle detected
        h3 = p.spawn("c")                        # recycles slot 0
        assert h3.index == h1.index and h3.generation != h1.generation
        assert p.try_borrow(h1) is None          # old handle STILL stale
        assert p.borrow(h3) == "c"

    def test_ticket_take_put_back(self):
        p = Pool()
        h = p.spawn({"x": 1})
        ticket = p.take_reserve(h)
        assert p.try_borrow(h) is None
        h2 = p.put_back(ticket, {"x": 2})
        assert h2 == h and p.borrow(h)["x"] == 2

    def test_spawn_at(self):
        p = Pool()
        h = p.spawn_at(5, "v")
        assert h.index == 5 and p.borrow(h) == "v"
        assert p.capacity == 6


class TestLogAndTasks:
    def test_listener_receives(self):
        got = []
        Log.add_listener(lambda k, m: got.append((k, m)))
        Log.info("hello")
        assert (MessageKind.INFORMATION, "hello") in got

    def test_taskpool_result(self):
        tp = TaskPool(2)
        tid = tp.spawn_with_result(lambda: 6 * 7)
        assert tp.wait_result(tid) == 42
        tp.shutdown()


class TestColor:
    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.uniform(0, 1, (32, 3)), jnp.float32)
        hsv = rgb_to_hsv(rgb)
        back = hsv_to_rgb(hsv[..., 0], hsv[..., 1], hsv[..., 2])
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_gradient(self):
        g = ColorGradient.pack([(0.0, (0, 0, 0, 1)), (1.0, (1, 0, 0, 1))])
        c = sample_gradient(g, jnp.asarray([0.0, 0.5, 1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(c[:, 0]), [0, 0.5, 1, 1], atol=1e-6)


class TestCheckpoint:
    def test_engine_state_roundtrip(self):
        from fyrox_tpu.models import build_flagship
        engine, _ = build_flagship(n_bones=8, n_verts=64, n_bodies=4)
        s = engine.init_state(num_worlds=2)
        step = jax.jit(engine.step)
        for _ in range(3):
            s = step(s)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "ckpt.npz")
            save_state(s, path)
            s0 = engine.init_state(num_worlds=2)
            s2 = load_state(s0, path)
        np.testing.assert_allclose(np.asarray(s.physics.position),
                                   np.asarray(s2.physics.position))
        # resumed state steps identically
        a = step(s)
        b = step(jax.tree.map(jnp.asarray, s2))
        np.testing.assert_allclose(np.asarray(a.physics.position),
                                   np.asarray(b.physics.position), atol=1e-6)

    def test_visitor_export_parses(self):
        from fyrox_tpu.models import build_flagship
        engine, _ = build_flagship(n_bones=4, n_verts=16, n_bodies=2)
        s = engine.init_state(num_worlds=1)
        blob = state_to_visitor(s, engine.template)
        root, _ = read_rgs(blob)
        recs = root.child("Scene").child("Graph").child("Pool").child("Records")
        assert len(recs.children) == engine.template.num_nodes


class TestDim2Physics:
    def test_bodies_stay_in_plane(self):
        from fyrox_tpu.physics import (BALL, HALFSPACE, BodyType,
                                       PhysicsBuilder, init_physics_state,
                                       step_physics)
        b = PhysicsBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        b.add_collider(g, HALFSPACE, [])
        for i in range(4):
            bi = b.add_body(position=(i * 0.4 - 0.8, 2.0 + i * 0.1, 0.0),
                            dim2=True)
            b.add_collider(bi, BALL, [0.3], restitution=0.3)
        t = b.build()
        s = init_physics_state(b, t, 1)
        # give them sideways + out-of-plane kicks
        s = s._replace(linvel=s.linvel.at[0, 1:, 2].set(3.0)
                       .at[0, 1:, 0].set(1.0))
        step = jax.jit(lambda s: step_physics(s, t, 1 / 60))
        for _ in range(120):
            s = step(s)
        z = np.abs(np.asarray(s.physics_positions if False else s.position[0, 1:, 2]))
        assert z.max() < 1e-4, f"z drift {z.max()}"
        # still moved in-plane (started at x = -0.4)
        assert abs(float(s.position[0, 1, 0]) - (-0.4)) > 0.1


class TestSpatialAccel:
    """Octree/QuadTree/RectPacker (fyrox-math octree.rs,
    fyrox-core quadtree.rs + rectpack.rs)."""

    def _boxes(self):
        import numpy as np
        rng = np.random.default_rng(0)
        c = rng.uniform(-10, 10, (200, 3))
        return c - 0.3, c + 0.3

    def test_octree_aabb_query_matches_bruteforce(self):
        import numpy as np
        from fyrox_tpu.core.spatial import Octree
        mins, maxs = self._boxes()
        tree = Octree(mins, maxs)
        qmin, qmax = np.asarray([-2, -2, -2.0]), np.asarray([3, 3, 3.0])
        got = tree.aabb_query(qmin, qmax)
        want = sorted(int(i) for i in range(200)
                      if np.all(mins[i] <= qmax) and np.all(maxs[i] >= qmin))
        assert got == want

    def test_octree_sphere_and_ray(self):
        import numpy as np
        from fyrox_tpu.core.spatial import Octree
        mins = np.asarray([[0, 0, 0], [5, 0, 0], [10, 0, 0.0]])
        maxs = mins + 1.0
        tree = Octree(mins, maxs)
        assert tree.sphere_query([0.5, 0.5, 0.5], 0.6) == [0]
        hits = tree.ray_query([-1, 0.5, 0.5], [1, 0, 0])
        assert hits == [0, 1, 2]          # nearest first

    def test_quadtree(self):
        import numpy as np
        from fyrox_tpu.core.spatial import QuadTree
        mins = np.asarray([[0, 0], [4, 4.0]])
        maxs = mins + 1.0
        t = QuadTree(mins, maxs)
        assert t.aabb_query([0, 0], [2, 2]) == [0]

    def test_rectpack_fits_without_overlap(self):
        from fyrox_tpu.core.spatial import RectPacker
        p = RectPacker(64, 64)
        placed = []
        for (w, h) in [(64, 16), (32, 32), (32, 32), (16, 16), (16, 16)]:
            xy = p.pack(w, h)
            assert xy is not None
            placed.append((xy[0], xy[1], w, h))
        for i in range(len(placed)):
            for j in range(i + 1, len(placed)):
                x0, y0, w0, h0 = placed[i]
                x1, y1, w1, h1 = placed[j]
                assert (x0 + w0 <= x1 or x1 + w1 <= x0
                        or y0 + h0 <= y1 or y1 + h1 <= y0)
        assert p.pack(64, 64) is None     # full


class TestSStorage:
    """Interned strings + sparse buffers (fyrox-core/src/{sstorage,sparse}.rs)."""

    def test_immutable_string_interning(self):
        from fyrox_tpu.core.sstorage import ImmutableString
        a = ImmutableString("diffuseTexture")
        b = ImmutableString("diffuse" + "Texture")
        assert a is b                       # same interned object
        assert a.cached_hash() == b.cached_hash()
        assert a == "diffuseTexture"        # still a str
        assert a.to_mutable() == "diffuseTexture"
        assert ImmutableString.entry_count() >= 1

    def test_sparse_buffer_spawn_free_recycle(self):
        from fyrox_tpu.core.sstorage import AtomicIndex, SparseBuffer
        buf = SparseBuffer()
        i1 = buf.spawn("a")
        i2 = buf.spawn("b")
        assert buf.get(i1) == "a" and buf.get(i2) == "b"
        assert buf.filled == 2
        assert buf.free(i1) == "a"
        assert not i1.assigned
        i3 = buf.spawn("c")                 # recycles slot 0
        assert i3.get() == 0 and buf.get(i3) == "c"
        assert sorted(buf) == ["b", "c"]
        assert buf.is_index_valid(i3) and buf.is_index_valid(i2)
        ghost = AtomicIndex.unassigned()
        assert buf.get(ghost) is None
