"""Tests for utils (A*, navmesh, behavior trees), particles, and sound."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.scene.particles import (EmitterKind, ParticleTemplate,
                                       init_particles, step_particles)
from fyrox_tpu.sound import (DistanceModel, SoundBuffers, init_sources,
                             render_block)
from fyrox_tpu.utils import (BehaviorTreeBuilder, Navmesh, NavmeshAgent,
                             Status, astar_search, build_grid_graph,
                             distance_field, pack_adjacency)


class TestAstar:
    def test_straight_grid_path(self):
        verts, nbrs = build_grid_graph(10, 10)
        path = astar_search(verts, nbrs, 0, 9)
        assert path[0] == 0 and path[-1] == 9
        assert len(path) == 10  # manhattan-optimal

    def test_wall_detour(self):
        # vertical wall at x=5 with a gap at y=9
        blocked = [y * 10 + 5 for y in range(9)]
        verts, nbrs = build_grid_graph(10, 10, blocked)
        path = astar_search(verts, nbrs, 0, 9)
        assert path and path[-1] == 9
        assert len(path) > 10  # forced detour

    def test_unreachable(self):
        blocked = [y * 10 + 5 for y in range(10)]
        verts, nbrs = build_grid_graph(10, 10, blocked)
        assert astar_search(verts, nbrs, 0, 9) == []

    def test_distance_field_matches_astar_cost(self):
        verts, nbrs = build_grid_graph(8, 8)
        idx, w = pack_adjacency(verts, nbrs)
        src = jnp.asarray([0, 63])
        dist = np.asarray(distance_field(idx, w, src))
        assert abs(dist[0, 63] - 14.0) < 1e-4  # manhattan distance
        assert abs(dist[1, 0] - 14.0) < 1e-4
        assert dist[0, 0] == 0.0


class TestNavmesh:
    def _two_room_mesh(self):
        """Two square rooms joined by a corridor (xz plane)."""
        quads = [  # (x0,z0,x1,z1)
            (0, 0, 4, 4), (4, 1.5, 6, 2.5), (6, 0, 10, 4),
        ]
        verts, tris = [], []
        for (x0, z0, x1, z1) in quads:
            base = len(verts)
            verts += [(x0, 0, z0), (x1, 0, z0), (x1, 0, z1), (x0, 0, z1)]
            tris += [(base, base + 1, base + 2), (base, base + 2, base + 3)]
        # weld duplicated vertices so adjacency sees shared edges
        verts = np.asarray(verts, np.float32)
        tris = np.asarray(tris, np.int32)
        return Navmesh(verts, tris)

    def test_path_within_triangle(self):
        nm = self._two_room_mesh()
        path = nm.build_path((0.5, 0, 0.5), (1.5, 0, 1.0))
        assert len(path) >= 2
        np.testing.assert_allclose(path[0], [0.5, 0, 0.5], atol=1e-5)
        np.testing.assert_allclose(path[-1], [1.5, 0, 1.0], atol=1e-5)

    def test_agent_walks_path(self):
        nm = self._two_room_mesh()
        agent = NavmeshAgent(position=np.asarray([1.0, 0, 2.0], np.float32),
                             speed=2.0)
        assert agent.calculate_path(nm, (3.5, 0, 2.0))
        for _ in range(300):
            agent.update(1.0 / 60.0)
        np.testing.assert_allclose(agent.position, [3.5, 0, 2.0], atol=1e-3)


class TestBehavior:
    def test_sequence_selector_semantics(self):
        b = BehaviorTreeBuilder()
        root = b.selector()
        seq = b.sequence(parent=root)
        l0 = b.leaf(seq)
        l1 = b.leaf(seq)
        l2 = b.leaf(root)
        tree = b.build(root)
        S, F, R = Status.SUCCESS, Status.FAILURE, Status.RUNNING
        cases = [
            # (leaf statuses, expected root)
            ([S, S, F], S),   # sequence succeeds → selector succeeds
            ([S, F, S], S),   # sequence fails → selector tries leaf2 → S
            ([F, S, F], F),   # sequence fails at first, leaf2 fails
            ([S, R, F], R),   # running propagates out of sequence
            ([F, S, R], R),   # selector falls through to running leaf
        ]
        stat = jnp.asarray([c[0] for c in cases], jnp.int32)
        out = np.asarray(tree.tick(stat))
        np.testing.assert_array_equal(out, [c[1] for c in cases])

    def test_inverter(self):
        b = BehaviorTreeBuilder()
        root = b.inverter()
        b.leaf(root)
        tree = b.build(root)
        out = np.asarray(tree.tick(jnp.asarray([[Status.SUCCESS],
                                                [Status.FAILURE],
                                                [Status.RUNNING]], jnp.int32)))
        np.testing.assert_array_equal(out, [Status.FAILURE, Status.SUCCESS,
                                            Status.RUNNING])


class TestParticles:
    def test_emission_lifecycle(self):
        t = ParticleTemplate(max_particles=128, emit_rate=120.0,
                             lifetime=(0.2, 0.3), seed=3)
        s = init_particles(t, num_worlds=2)
        step = jax.jit(lambda s: step_particles(s, t, 1.0 / 60.0))
        for _ in range(30):  # 0.5s → population reaches steady state
            s = step(s)
        alive = np.asarray(s.alive.sum(axis=1))
        # steady state ≈ rate * mean lifetime = 120 * 0.25 = 30
        assert 15 <= alive[0] <= 45, alive
        # deterministic across worlds with same seed counter? different
        # fold_in keys per world → different patterns but similar counts
        assert 15 <= alive[1] <= 45
        assert bool(jnp.all(jnp.isfinite(s.position)))

    def test_gravity_pulls_particles(self):
        t = ParticleTemplate(max_particles=64, emit_rate=600.0,
                             lifetime=(5.0, 5.0), initial_speed=(0.0, 0.1),
                             acceleration=(0, -9.81, 0))
        s = init_particles(t, 1)
        step = jax.jit(lambda s: step_particles(s, t, 1.0 / 60.0))
        for _ in range(60):
            s = step(s)
        vy = np.asarray(s.velocity[0, :, 1])[np.asarray(s.alive[0])]
        assert (vy < 0).mean() > 0.9


class TestSound:
    def test_mix_pan_and_distance(self):
        sr = 44100
        tone = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
        bufs = SoundBuffers.pack([tone])
        # one source left of the listener, one far away
        src = init_sources([0, 0], [[-5.0, 0, 0], [100.0, 0, 0]],
                           radius=1.0, max_distance=200.0)
        block, src2 = render_block(bufs, src, listener_pos=(0, 0, 0),
                                   listener_right=(1.0, 0, 0), block_len=512)
        block = np.asarray(block)
        assert block.shape == (512, 2)
        # left-positioned source louder in left channel overall
        l_rms = np.sqrt((block[:, 0] ** 2).mean())
        r_rms = np.sqrt((block[:, 1] ** 2).mean())
        assert l_rms > r_rms
        # playheads advanced
        assert float(src2.playhead[0]) == 512.0

    def test_nonlooping_stops_at_end(self):
        clicks = np.ones(100, np.float32)
        bufs = SoundBuffers.pack([clicks])
        src = init_sources([0], [[0.0, 0, 1.0]], looping=False)
        block, src2 = render_block(bufs, src, (0, 0, 0), (1.0, 0, 0),
                                   block_len=256)
        assert not bool(src2.playing[0])
        # samples past the buffer end are silent
        assert float(jnp.abs(block[150:]).max()) == 0.0


class TestBinaural:
    def test_itd_and_shadow(self):
        """A source hard right arrives earlier + brighter in the right ear."""
        from fyrox_tpu.sound.binaural import (render_block_binaural,
                                              spherical_head_hrir)
        sr = 44100
        click = np.zeros(513, np.float32)
        click[0] = 1.0
        out = np.asarray(render_block_binaural(
            jnp.asarray(click)[None], jnp.asarray([np.pi / 2]),
            jnp.asarray([1.0])))
        l, r = out[:, 0], out[:, 1]
        # right ear peak earlier and stronger
        assert np.argmax(np.abs(r)) < np.argmax(np.abs(l))
        assert np.abs(r).max() > np.abs(l).max()
        # centered source: symmetric
        out_c = np.asarray(render_block_binaural(
            jnp.asarray(click)[None], jnp.asarray([0.0]), jnp.asarray([1.0])))
        np.testing.assert_allclose(out_c[:, 0], out_c[:, 1], atol=1e-4)

    def test_hrir_energy_normalized(self):
        from fyrox_tpu.sound.binaural import spherical_head_hrir
        h = np.asarray(spherical_head_hrir(jnp.asarray([0.0, 1.0, -2.0])))
        assert h.shape == (3, 2, 64)
        assert np.isfinite(h).all()
        assert (np.abs(h).sum(-1) > 0.1).all()


# ---------------------------------------------------------------- triangulator

class TestTriangulator:
    def test_quad_convex(self):
        from fyrox_tpu.core.triangulator import triangulate
        quad = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
        tris = triangulate(quad)
        assert tris.shape == (2, 3)
        assert _area(quad, tris) == 1.0

    def test_quad_concave_splits_at_reflex(self):
        from fyrox_tpu.core.triangulator import triangulate
        # dart: vertex 3 is reflex — the diagonal must start there
        quad = [[0, 0, 0], [2, 0, 0], [0, 2, 0], [0.4, 0.4, 0]]
        tris = triangulate(quad)
        assert tris.shape == (2, 3)
        assert 3 in tris[0] and 3 in tris[1]

    def test_ear_clipping_L_polygon(self):
        from fyrox_tpu.core.triangulator import triangulate
        poly = [[0, 0, 0], [2, 0, 0], [2, 1, 0], [1, 1, 0], [1, 2, 0], [0, 2, 0]]
        tris = triangulate(poly)
        assert tris.shape == (4, 3)
        assert abs(_area(poly, tris) - 3.0) < 1e-6

    def test_vertical_plane_projection(self):
        from fyrox_tpu.core.triangulator import triangulate
        # pentagon in the x=0 plane (dominant axis ≠ z)
        poly = [[0, 0, 0], [0, 0, 2], [0, 1, 3], [0, 2, 2], [0, 2, 0]]
        tris = triangulate(poly)
        assert tris.shape == (3, 3)
        assert abs(_area_yz(poly, tris) - 5.0) < 1e-6


def _area(poly, tris):
    import numpy as _np
    p = _np.asarray(poly, float)
    return float(sum(abs(_np.cross(p[b] - p[a], p[c] - p[a])[2]) / 2
                     for a, b, c in tris))


def _area_yz(poly, tris):
    import numpy as _np
    p = _np.asarray(poly, float)[:, 1:]
    return float(sum(abs((p[b] - p[a])[0] * (p[c] - p[a])[1]
                         - (p[b] - p[a])[1] * (p[c] - p[a])[0]) / 2
                     for a, b, c in tris))


# -------------------------------------------------------------------- watcher

class TestFileSystemWatcher:
    def test_detects_change_and_hot_reloads(self, tmp_path):
        import time
        from fyrox_tpu.resource import ResourceManager
        from fyrox_tpu.utils.watcher import FileSystemWatcher
        f = tmp_path / "mesh.json"
        f.write_text('{"v": 1}')
        rm = ResourceManager()
        rm.register_loader(".json", lambda p: open(p).read())
        res = rm.request(str(f)).wait()
        assert '"v": 1' in res.data
        w = FileSystemWatcher([str(tmp_path)], interval=0.0, manager=rm)
        assert w.poll(now=1.0) == []            # nothing changed yet
        time.sleep(0.01)
        f.write_text('{"v": 2}')
        import os
        os.utime(f, (time.time() + 5, time.time() + 5))  # force mtime change
        reloaded = []
        w.add_listener(reloaded.append)
        changed = w.update(now=2.0)
        assert [str(f)] == [str(c) for c in changed]
        assert reloaded and str(f) in reloaded[0]
        assert '"v": 2' in rm.request(str(f)).wait().data
        rm.shutdown()

    def test_new_and_deleted_files_reported(self, tmp_path):
        from fyrox_tpu.utils.watcher import FileSystemWatcher
        w = FileSystemWatcher([str(tmp_path)], interval=0.0)
        g = tmp_path / "new.txt"
        g.write_text("x")
        assert [str(g)] == w.poll(now=1.0)
        g.unlink()
        assert [str(g)] == w.poll(now=2.0)


class TestAudioBusGraph:
    """Bus/effects graph (fyrox-sound/src/bus.rs, effects/)."""

    def _graph(self, effects_child=()):
        import numpy as np
        from fyrox_tpu.sound import bus as bus_mod
        g = bus_mod.BusGraph.build([
            dict(parent=-1, gain=1.0),                   # primary
            dict(parent=0, gain=0.5, effects=list(effects_child)),
        ])
        return bus_mod, g

    def test_tree_mix_and_gain(self):
        import numpy as np
        import jax.numpy as jnp
        bus_mod, g = self._graph()
        st = bus_mod.init_state(g)
        blocks = jnp.zeros((2, 64, 2)).at[1].set(1.0)    # child-only signal
        out, st = bus_mod.process(g, blocks, st)
        # child gain 0.5 into primary gain 1.0
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    def test_lowpass_attenuates_high_freq(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.sound.bus import biquad_coeffs
        bus_mod, g = self._graph(
            effects_child=[("biquad", biquad_coeffs("lowpass", 500.0))])
        st = bus_mod.init_state(g)
        t = np.arange(1024) / 44100.0
        hi = np.sin(2 * np.pi * 10000.0 * t).astype(np.float32)
        lo = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
        def run(sig):
            blocks = jnp.zeros((2, 1024, 2)).at[1].set(
                jnp.asarray(sig)[:, None])
            out, _ = bus_mod.process(g, blocks, bus_mod.init_state(g))
            return float(jnp.sqrt(jnp.mean(out[256:] ** 2)))
        assert run(hi) < 0.1 * run(lo)

    def test_reverb_adds_tail(self):
        import numpy as np
        import jax.numpy as jnp
        bus_mod, g = self._graph(effects_child=[("reverb", 0.8)])
        st = bus_mod.init_state(g)
        impulse = jnp.zeros((2, 2048, 2)).at[1, 0].set(1.0)
        out, st = bus_mod.process(g, impulse, st)
        tail = np.abs(np.asarray(out[1200:]))
        assert tail.max() > 1e-4          # energy long after the impulse

    def test_depth_order_children_first(self):
        import numpy as np
        from fyrox_tpu.sound import bus as bus_mod
        g = bus_mod.BusGraph.build([
            dict(parent=-1), dict(parent=0), dict(parent=1)])
        order = g.depth_order()
        assert order.index(2) < order.index(1) < order.index(0)


class TestMeasuredHrir:
    def test_sphere_interpolates_between_measurements(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.sound.binaural import (HrirSphere, sample_hrir,
                                              render_block_binaural)
        # 4 cardinal measurements: impulse amplitude encodes direction
        az = np.asarray([0.0, np.pi / 2, np.pi, 3 * np.pi / 2])
        hr = np.zeros((4, 2, 8), np.float32)
        for i in range(4):
            hr[i, :, 0] = i + 1.0
        sph = HrirSphere(az, hr)
        h = np.asarray(sample_hrir(sph, jnp.asarray([np.pi / 4])))
        assert abs(h[0, 0, 0] - 1.5) < 1e-5       # halfway 1..2
        # wrap-around: 7/8 circle blends measurement 3 toward 0
        h2 = np.asarray(sample_hrir(sph, jnp.asarray([7 * np.pi / 4])))
        assert abs(h2[0, 0, 0] - 2.5) < 1e-5      # halfway 4..1
        # end-to-end mix runs with a sphere
        out = render_block_binaural(jnp.ones((1, 64)), jnp.asarray([0.3]),
                                    jnp.ones(1), block_len=64,
                                    hrir_sphere=sph)
        assert out.shape == (64, 2)


class TestLightmapBake:
    """Per-vertex AO + direct-light bake (utils/lightmap.rs equivalent)."""

    def _scene(self):
        import numpy as np
        # a big quad roof above the origin; sample points below it and in
        # the open
        roof = np.asarray([
            [[-2, 1.0, -2], [2, 1.0, -2], [2, 1.0, 2]],
            [[-2, 1.0, -2], [2, 1.0, 2], [-2, 1.0, 2]]], np.float32)
        pts = np.asarray([[0, 0, 0], [10, 0, 0.0]], np.float32)
        nrm = np.asarray([[0, 1, 0], [0, 1, 0.0]], np.float32)
        return roof, pts, nrm

    def test_ao_darker_under_roof(self):
        from fyrox_tpu.utils.lightmap import bake_vertex_ao
        roof, pts, nrm = self._scene()
        ao = bake_vertex_ao(pts, nrm, roof, n_rays=32, max_dist=5.0,
                            chunk=2)
        assert ao[0] < 0.6          # occluded by the roof
        assert ao[1] > 0.95         # open sky

    def test_direct_light_shadowed(self):
        from fyrox_tpu.utils.lightmap import bake_direct_light
        roof, pts, nrm = self._scene()
        # directional sun straight down: under-roof point is in shadow
        lit = bake_direct_light(pts, nrm, roof, light_dir=(0, -1, 0),
                                chunk=2)
        assert lit[0] < 1e-6
        assert lit[1] > 0.9
        # point light below the roof reaches the origin point
        lit2 = bake_direct_light(pts, nrm, roof, light_pos=(0, 0.5, 0),
                                 intensity=1.0, chunk=2)
        assert lit2[0] > 0.5


class TestCommandStack:
    """Editor command stack (editor/src/command/) over functional state."""

    def test_do_undo_redo_with_reflect(self):
        import dataclasses
        from fyrox_tpu.core import reflect
        from fyrox_tpu.utils.commands import Command, CommandStack

        @dataclasses.dataclass
        class Scene:
            x: float = 0.0
            name: str = "a"

        st = CommandStack(Scene())
        st.do(Command("set x=1", lambda s: reflect.set_path(s, "x", 1.0)))
        st.do(Command("rename", lambda s: reflect.set_path(s, "name", "b")))
        assert st.state.x == 1.0 and st.state.name == "b"
        assert st.undo() == "rename"
        assert st.state.name == "a" and st.state.x == 1.0
        assert st.redo() == "rename"
        assert st.state.name == "b"
        # a new do() after undo truncates the redo branch
        st.undo()
        st.do(Command("set x=5", lambda s: reflect.set_path(s, "x", 5.0)))
        assert not st.can_redo
        assert st.state.x == 5.0 and st.state.name == "a"
        assert [n for n, _ in st.history()] == ["set x=1", "set x=5"]


class TestUvGen:
    """Box-projection UV atlas generation (utils/uvgen.rs equivalent)."""

    def test_cube_unwrap_no_chart_overlap(self):
        import numpy as np
        from fyrox_tpu.render.mesh import make_cube
        from fyrox_tpu.utils.uvgen import generate_uvs
        mesh = make_cube(1.0)
        uvs, charts = generate_uvs(mesh.positions, mesh.triangles,
                                   atlas_size=256)
        assert uvs.shape == (12, 3, 2)
        assert np.all((uvs >= 0) & (uvs <= 1))
        assert len(np.unique(charts)) == 6           # one chart per face dir
        # chart bounding rects must not overlap in the atlas
        rects = []
        for c in np.unique(charts):
            m = charts == c
            lo = uvs[m].reshape(-1, 2).min(0)
            hi = uvs[m].reshape(-1, 2).max(0)
            rects.append((lo[0], lo[1], hi[0], hi[1]))
        eps = 1e-6
        for i in range(len(rects)):
            for j in range(i + 1, len(rects)):
                a, b = rects[i], rects[j]
                assert (a[2] <= b[0] + eps or b[2] <= a[0] + eps
                        or a[3] <= b[1] + eps or b[3] <= a[1] + eps)

    def test_triangle_shape_preserved_in_chart(self):
        import numpy as np
        from fyrox_tpu.utils.uvgen import generate_uvs
        pos = np.asarray([[0, 0, 0], [2, 0, 0], [0, 1, 0.0]])
        tris = np.asarray([[0, 1, 2]])
        uvs, _ = generate_uvs(pos, tris, atlas_size=128)
        # aspect ratio of the projected triangle survives (uniform scale)
        du = np.linalg.norm(uvs[0, 1] - uvs[0, 0])
        dv = np.linalg.norm(uvs[0, 2] - uvs[0, 0])
        assert abs(du / dv - 2.0) < 1e-3
