"""Ray casting queries + script system + executor."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.physics import (BALL, CAPSULE, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder, init_physics_state)
from fyrox_tpu.physics.queries import cast_ray
from fyrox_tpu.script import Executor, Script, ScriptProcessor


def make_query_world():
    b = PhysicsBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.add_collider(g, HALFSPACE, [])
    s = b.add_body(body_type=BodyType.STATIC, position=(5, 1, 0))
    b.add_collider(s, BALL, [1.0])
    c = b.add_body(body_type=BodyType.STATIC, position=(-5, 1, 0))
    b.add_collider(c, CUBOID, [1.0, 1.0, 1.0])
    k = b.add_body(body_type=BodyType.STATIC, position=(0, 1, 5))
    b.add_collider(k, CAPSULE, [0.5, 0.4])
    t = b.build()
    return b, t, init_physics_state(b, t, 1)


class TestCastRay:
    def test_hits_each_shape(self):
        _, t, s = make_query_world()
        origins = jnp.asarray([[[0.0, 1, 0]] * 4])
        dirs = jnp.asarray([[[1.0, 0, 0], [-1.0, 0, 0], [0.0, 0, 1],
                             [0.0, -1, 0]]])
        out = jax.jit(lambda st: cast_ray(st, t, origins, dirs))(s)
        hit = np.asarray(out["hit"][0])
        toi = np.asarray(out["toi"][0])
        body = np.asarray(out["body"][0])
        assert hit.all()
        assert abs(toi[0] - 4.0) < 1e-4 and body[0] == 1    # ball at x=5 r=1
        assert abs(toi[1] - 4.0) < 1e-4 and body[1] == 2    # box at x=-5 h=1
        assert abs(toi[2] - 4.6) < 1e-3 and body[2] == 3    # capsule r=0.4
        assert abs(toi[3] - 1.0) < 1e-4 and body[3] == 0    # ground plane
        # normals
        n = np.asarray(out["normal"][0])
        np.testing.assert_allclose(n[0], [-1, 0, 0], atol=1e-3)
        np.testing.assert_allclose(n[1], [1, 0, 0], atol=1e-3)
        np.testing.assert_allclose(n[3], [0, 1, 0], atol=1e-3)

    def test_miss(self):
        _, t, s = make_query_world()
        out = cast_ray(s, t, jnp.asarray([[[0.0, 10, 0]]]),
                       jnp.asarray([[[0.0, 1, 0]]]))
        assert not bool(out["hit"][0, 0])
        assert out["collider"][0, 0] == -1

    def test_max_toi(self):
        _, t, s = make_query_world()
        out = cast_ray(s, t, jnp.asarray([[[0.0, 1, 0]]]),
                       jnp.asarray([[[1.0, 0, 0]]]), max_toi=2.0)
        assert not bool(out["hit"][0, 0])


class TestScripts:
    def test_lifecycle_order_and_messages(self):
        calls = []

        class S(Script):
            def __init__(self, tag):
                self.tag = tag

            def on_init(self, ctx):
                calls.append(("init", self.tag))

            def on_start(self, ctx):
                calls.append(("start", self.tag))

            def on_update(self, ctx):
                calls.append(("update", self.tag))

            def on_message(self, ctx, m):
                calls.append(("msg", self.tag, m))

        sp = ScriptProcessor()
        sp.add(S("a"))
        sp.add(S("b"))
        sp.send_message("hello")
        sp.update(None, None, 1 / 60)
        # all inits before all starts (the reference's ordering contract,
        # engine/mod.rs test_order)
        assert calls[:4] == [("init", "a"), ("init", "b"),
                             ("start", "a"), ("start", "b")]
        assert ("msg", "a", "hello") in calls and ("msg", "b", "hello") in calls
        assert calls[-2:] == [("update", "a"), ("update", "b")]

    def test_executor_fixed_timestep_with_script(self):
        from fyrox_tpu.models import build_flagship
        engine, _ = build_flagship(n_bones=4, n_verts=16, n_bodies=2)
        state = engine.init_state(num_worlds=1)
        ex = Executor(engine, state)
        ticks = []

        class Counter(Script):
            def on_update(self, ctx):
                ticks.append(float(ctx.dt))

        ex.scripts.add(Counter())
        out = ex.run(duration_s=0.5)
        assert len(ticks) == 30               # 0.5 s at 60 Hz exactly
        assert abs(float(out.scene.time[0]) - 0.5) < 1e-4


class TestShapeCastAndContacts:
    def test_sphere_cast_hits_earlier_than_ray(self):
        from fyrox_tpu.physics.queries import sphere_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[0.0, 1, 0]]])
        d = jnp.asarray([[[1.0, 0, 0]]])
        ray_out = cast_ray(s, t, o, d)
        sw_out = sphere_cast(s, t, o, d, radius=0.5)
        assert bool(sw_out["hit"][0, 0])
        # swept sphere reaches the ball (surface at x=4) 0.5 earlier
        assert abs(float(sw_out["toi"][0, 0]) - 3.5) < 1e-3
        assert float(sw_out["toi"][0, 0]) < float(ray_out["toi"][0, 0])

    def test_box_cast_onto_plane_analytic(self):
        """Axis-aligned box dropped onto the ground plane: exact TOI
        (reference cast_shape semantics, physics/mod.rs:1357)."""
        from fyrox_tpu.physics.queries import shape_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[20.0, 3.0, 0.0]]])        # clear of other shapes
        d = jnp.asarray([[[0.0, -1.0, 0.0]]])
        out = shape_cast(s, t, CUBOID, [0.3, 0.3, 0.3], o, None, d)
        assert bool(out["hit"][0, 0])
        assert abs(float(out["toi"][0, 0]) - 2.7) < 1e-4   # (3.0 - 0.3)/1
        assert np.allclose(np.asarray(out["normal"][0, 0]), [0, 1, 0],
                           atol=1e-5)

    def test_rotated_box_cast_onto_plane(self):
        """45°-rotated box: the corner leads — toi = h - half*sqrt(2)."""
        import math
        from fyrox_tpu.physics.queries import shape_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[20.0, 3.0, 0.0]]])
        d = jnp.asarray([[[0.0, -1.0, 0.0]]])
        a = math.pi / 4
        q = jnp.asarray([[[math.sin(a / 2), 0.0, 0.0, math.cos(a / 2)]]])
        out = shape_cast(s, t, CUBOID, [0.3, 0.3, 0.3], o, q, d)
        expect = 3.0 - 0.3 * math.sqrt(2.0)
        assert abs(float(out["toi"][0, 0]) - expect) < 1e-4

    def test_capsule_cast_onto_box(self):
        """Vertical capsule cast down onto the unit box at (-5,1,0):
        box top at y=2; capsule bottom = center - (hh+r)."""
        from fyrox_tpu.physics.queries import shape_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[-5.0, 6.0, 0.0]]])
        d = jnp.asarray([[[0.0, -1.0, 0.0]]])
        out = shape_cast(s, t, CAPSULE, [0.5, 0.4], o, None, d)
        assert bool(out["hit"][0, 0])
        assert int(out["collider"][0, 0]) == 2
        assert abs(float(out["toi"][0, 0]) - (6.0 - 2.0 - 0.9)) < 1e-4

    def test_ball_shape_cast_matches_sphere_cast(self):
        from fyrox_tpu.physics.queries import shape_cast, sphere_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[0.0, 1.0, 0.0]]])
        d = jnp.asarray([[[1.0, 0.0, 0.0]]])
        a = shape_cast(s, t, BALL, [0.5], o, None, d)
        b2 = sphere_cast(s, t, o, d, radius=0.5)
        assert bool(a["hit"][0, 0])
        assert abs(float(a["toi"][0, 0]) - float(b2["toi"][0, 0])) < 1e-3

    def test_shape_cast_miss_certificate(self):
        """Moving away from everything: the positive non-closing gap is
        an exact miss certificate."""
        from fyrox_tpu.physics.queries import shape_cast
        _, t, s = make_query_world()
        o = jnp.asarray([[[0.0, 5.0, 0.0]]])
        d = jnp.asarray([[[0.0, 1.0, 0.0]]])
        out = shape_cast(s, t, CUBOID, [0.3, 0.3, 0.3], o, None, d)
        assert not bool(out["hit"][0, 0])

    def test_compute_contacts_reports_touching_pair(self):
        from fyrox_tpu.physics import BodyType, PhysicsBuilder, init_physics_state
        from fyrox_tpu.physics.queries import compute_contacts
        b = PhysicsBuilder()
        b1 = b.add_body(position=(0, 0, 0))
        b.add_collider(b1, BALL, [1.0])
        b2 = b.add_body(position=(1.5, 0, 0))
        b.add_collider(b2, BALL, [1.0])
        t = b.build()
        s = init_physics_state(b, t, 1)
        c = compute_contacts(s, t)
        act = np.asarray(c["active"][0])
        assert act.any()
        k = int(np.nonzero(act)[0][0])
        assert abs(float(c["depth"][0, k]) - 0.5) < 1e-5
        assert {int(c["body_a"][k]), int(c["body_b"][k])} == {0, 1}


class TestPluginSystem:
    """Plugin trait + dylib hot reload analog (plugin/mod.rs:573,
    engine/hotreload.rs state round-trip)."""

    PLUGIN_V1 = '''
from fyrox_tpu.plugin import Plugin

class Counter(Plugin):
    VERSION = 1
    def __init__(self):
        self.count = 0
    def update(self, context, dt):
        self.count += 1
    def save_state(self):
        return {"count": self.count}
    def restore_state(self, state):
        self.count = state.get("count", 0)

def make_plugin():
    return Counter()
'''

    def test_lifecycle_and_hot_reload_preserves_state(self, tmp_path):
        import os
        import time
        from fyrox_tpu.plugin import PluginHost
        src = tmp_path / "game_plugin.py"
        src.write_text(self.PLUGIN_V1)
        host = PluginHost(context={}, watch_interval=0.0)
        p = host.load_file(str(src))
        assert type(p).VERSION == 1
        host.update(1 / 60, now=1.0)
        host.update(1 / 60, now=2.0)
        assert host.plugins[0].count == 2
        # live-edit the plugin: bump VERSION, keep state shape
        src.write_text(self.PLUGIN_V1.replace("VERSION = 1", "VERSION = 2"))
        os.utime(src, (time.time() + 5, time.time() + 5))
        host.update(1 / 60, now=3.0)
        fresh = host.plugins[0]
        assert type(fresh).VERSION == 2       # new code is live
        assert fresh.count == 3               # state survived + this tick


class TestStockScripts:
    """fyrox_tpu.scripts — the fyrox-scripts crate equivalent
    (fyrox-scripts/src/camera.rs FlyingCameraController + orbit)."""

    def _engine(self, w=3):
        from fyrox_tpu.engine import Engine
        from fyrox_tpu.scene import SceneBuilder
        from fyrox_tpu.render import make_cube
        sb = SceneBuilder()
        sb.add_mesh(make_cube(1.0), position=(0, 0, 0))
        cam = sb.add_camera("cam", position=(0, 1.0, -5.0))
        eng = Engine(template=sb.build())
        return eng, eng.init_state(num_worlds=w), cam

    def test_flying_camera_yaw_and_move(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.script import ScriptProcessor
        from fyrox_tpu.scripts import FlyingCameraController
        eng, state, cam = self._engine(3)
        sp = ScriptProcessor()
        ctl = sp.add(FlyingCameraController(cam, 3, speed=2.0,
                                            sensitivity=1e-2))
        # world 0: pure mouse yaw; world 1: forward move; world 2: idle
        ctl.set_input(mouse_delta=np.asarray([[10.0, 0], [0, 0], [0, 0]]),
                      move_axes=np.asarray([[0.0, 0], [0, 1.0], [0, 0]]))
        p0 = np.asarray(state.scene.position[:, cam])
        for _ in range(30):
            state = sp.update(eng, state, 1 / 60)
        q = np.asarray(state.scene.rotation[:, cam])
        p = np.asarray(state.scene.position[:, cam])
        assert abs(q[0, 1]) > 1e-3                  # world 0 yawed
        assert abs(q[1, 1]) < 1e-6                  # world 1 didn't
        np.testing.assert_allclose(p[0], p0[0], atol=1e-6)   # no move
        assert p[1, 2] > p0[1, 2] + 0.5             # forward = +Z look
        np.testing.assert_allclose(p[2], p0[2], atol=1e-6)
        # pitch limit clamps (camera.rs:146 ±89.9°)
        ctl.set_input(mouse_delta=np.asarray([[0, 1e4]] * 3),
                      move_axes=np.zeros((3, 2)))
        state = sp.update(eng, state, 1 / 60)
        assert float(jnp.max(ctl.pitch)) <= np.deg2rad(89.9) + 1e-6

    def test_orbit_camera_keeps_radius_and_renders(self):
        import numpy as np
        from fyrox_tpu.script import ScriptProcessor
        from fyrox_tpu.scripts import OrbitCameraController
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      render_frame)
        from fyrox_tpu.scene import graph
        eng, state, cam = self._engine(2)
        sp = ScriptProcessor()
        ctl = sp.add(OrbitCameraController(cam, 2, target=(0, 0, 0),
                                           radius=5.0, sensitivity=5e-3))
        ctl.set_input(mouse_delta=np.asarray([[20.0, 6.0], [-8.0, 2.0]]))
        for _ in range(25):
            state = sp.update(eng, state, 1 / 60)
        p = np.asarray(state.scene.position[:, cam])
        r = np.linalg.norm(p, axis=-1)
        np.testing.assert_allclose(r, 5.0, atol=1e-4)   # stays on sphere
        assert abs(p[0, 0] - p[1, 0]) > 0.1             # worlds diverged
        # the camera still FACES the target: the cube at origin renders
        st = graph.update_hierarchical_data(state.scene, eng.template)
        rt = build_render_template(eng.template)
        color, gbuf = render_frame(
            state.scene._replace(globals_=st.globals_), eng.template, rt,
            RenderConfig(width=32, height=32, shadows=False))
        assert np.asarray(gbuf.mask).sum(axis=(1, 2)).min() > 10
        # zoom shrinks the radius
        ctl.set_input(mouse_delta=np.zeros((2, 2)), zoom=np.ones(2))
        state = sp.update(eng, state, 1 / 60)
        assert float(np.asarray(ctl.radius).max()) < 5.0
