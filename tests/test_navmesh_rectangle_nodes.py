"""NAVMESH + RECTANGLE scene nodes get real payloads + runtime behavior
(round-4 VERDICT #6: both rows were enum-only).

NavigationalMesh: fyrox-impl/src/scene/navmesh.rs:81 + NavmeshAgent
utils/navmesh.rs:642. Rectangle: fyrox-impl/src/scene/dim2/rectangle.rs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.scene import SceneBuilder, graph, init_state
from fyrox_tpu.scene.template import NodeType


def _lshape_navmesh():
    """Two-corridor L in the XZ plane: (0..4)x(0..1) + (3..4)x(1..4),
    triangulated so consecutive triangles share exact edges (the
    adjacency the funnel algorithm walks)."""
    v = np.asarray([
        [0, 0, 0], [3, 0, 0], [4, 0, 0],          # p0 p1 p2
        [0, 0, 1], [3, 0, 1], [4, 0, 1],          # p3 p4 p5
        [3, 0, 4], [4, 0, 4],                     # p6 p7
    ], np.float32)
    t = np.asarray([
        [0, 1, 4], [0, 4, 3],          # corridor A left
        [1, 2, 5], [1, 5, 4],          # corridor A right
        [4, 5, 7], [4, 7, 6],          # corridor B up
    ], np.int32)
    return v, t


class TestNavmeshNode:
    def test_payload_in_template(self):
        sb = SceneBuilder()
        v, t = _lshape_navmesh()
        n = sb.add_navmesh(v, t, position=(1.0, 0.5, 0.0))
        tpl = sb.build()
        assert tpl.node_type[n] == NodeType.NAVMESH
        assert tpl.payload[n] == 0
        assert len(tpl.navmesh_data) == 1

    def test_template_navmesh_bakes_transform(self):
        from fyrox_tpu.utils.navagent import template_navmesh
        sb = SceneBuilder()
        v, t = _lshape_navmesh()
        sb.add_navmesh(v, t, position=(10.0, 0.0, 0.0), scale=(2, 1, 1))
        tpl = sb.build()
        nm = template_navmesh(tpl, 0)
        assert abs(float(nm.vertices[:, 0].min()) - 10.0) < 1e-5
        assert abs(float(nm.vertices[:, 0].max()) - 18.0) < 1e-5

    def test_batched_agents_reach_goals(self):
        """Two worlds, different goals: agents steer through the L-bend
        (vectorized steering under jit; host pathfind)."""
        from fyrox_tpu.utils.navagent import BatchedNavAgents, template_navmesh
        sb = SceneBuilder()
        v, t = _lshape_navmesh()
        sb.add_navmesh(v, t)
        tpl = sb.build()
        nm = template_navmesh(tpl, 0)
        agents = BatchedNavAgents(radius=0.05)
        starts = np.asarray([[0.3, 0.0, 0.5], [0.5, 0.0, 0.5]], np.float32)
        goals = np.asarray([[3.5, 0.0, 3.6], [3.6, 0.0, 3.0]], np.float32)
        st = agents.plan(nm, starts, goals)
        assert int(st.length.min()) >= 2

        @jax.jit
        def advance(carry):
            pos, st = carry
            vel, st = agents.steer(st, pos, speed=2.0, dt=1 / 30)
            return pos + vel * (1 / 30), st

        pos = jnp.asarray(starts)
        for _ in range(400):
            pos, st = advance((pos, st))
        err = np.linalg.norm(np.asarray(pos) - goals, axis=-1)
        assert (err < 0.15).all(), err
        # the L-bend forces travel through the corner region (not a
        # straight line): total path length > euclidean distance
        eu = np.linalg.norm(goals - starts, axis=-1)
        wp = np.asarray(st.waypoints)
        ln = np.asarray(st.length)
        for w in range(2):
            seg = wp[w, :ln[w]]
            plen = np.linalg.norm(np.diff(
                np.concatenate([starts[w][None], seg]), axis=0),
                axis=-1).sum()
            assert plen > eu[w] * 1.01

    def test_agent_drives_rigid_body(self):
        """The reference pattern: agent velocity written into a dynamic
        body's linvel each step (kinematic steering of a physics body)."""
        from fyrox_tpu.physics import BALL, HALFSPACE, BodyType, PhysicsBuilder
        from fyrox_tpu.physics import world as wm
        from fyrox_tpu.utils.navagent import BatchedNavAgents, template_navmesh
        sb = SceneBuilder()
        v, t = _lshape_navmesh()
        sb.add_navmesh(v, t)
        tpl = sb.build()
        nm = template_navmesh(tpl, 0)
        pb = PhysicsBuilder()
        g = pb.add_body(body_type=BodyType.STATIC)
        pb.add_collider(g, HALFSPACE, [], friction=0.1)
        b = pb.add_body(position=(0.3, 0.3, 0.5))
        pb.add_collider(b, BALL, [0.3], friction=0.1)
        pt = pb.build(broadphase="dense")
        s = wm.init_physics_state(pb, pt, 2)
        agents = BatchedNavAgents(radius=0.1)
        starts = np.asarray(s.position[:, 1], np.float32)
        goals = np.asarray([[3.5, 0.3, 3.5], [3.5, 0.3, 3.2]], np.float32)
        ast = agents.plan(nm, starts[:, [0, 2, 1]] * [1, 0, 1], goals * [1, 0, 1])

        @jax.jit
        def step(s, ast):
            planar = s.position[:, 1] * jnp.asarray([1.0, 0.0, 1.0])
            vel, ast = agents.steer(ast, planar, speed=2.0, dt=1 / 60)
            lv = s.linvel.at[:, 1, 0].set(vel[:, 0]).at[:, 1, 2].set(vel[:, 2])
            s = s._replace(linvel=lv)
            return wm.step_physics(s, pt, 1 / 60), ast

        for _ in range(350):
            s, ast = step(s, ast)
        end = np.asarray(s.position[:, 1])
        err = np.linalg.norm(end[:, [0, 2]] - goals[:, [0, 2]], axis=-1)
        assert (err < 0.3).all(), (end, err)


class TestRectangleNode:
    def test_rectangle_renders_colored_quad(self):
        from fyrox_tpu.render import RenderConfig, build_render_template, \
            render_frame
        sb = SceneBuilder()
        sb.add_rectangle(color=(1.0, 0.1, 0.1), position=(0, 0, 0),
                         scale=(2.0, 2.0, 1.0))
        sb.add_camera("cam", position=(0, 0, 3.0),
                      rotation=(0, 1, 0, 0))   # look back toward -Z→quad
        tpl = sb.build()
        st = graph.update_hierarchical_data(init_state(tpl, 1), tpl)
        rt = build_render_template(tpl)
        color, gbuf = render_frame(st, tpl, rt, RenderConfig(
            width=32, height=32, shadows=False))
        img = np.asarray(color[0])
        center = img[16, 16]
        assert center[0] > 0.5 and center[1] < 0.4     # red quad visible
        # double-sided: visible from behind too
        sb2 = SceneBuilder()
        sb2.add_rectangle(color=(0.1, 1.0, 0.1), scale=(2.0, 2.0, 1.0))
        sb2.add_camera("cam", position=(0, 0, -3.0))   # from behind
        tpl2 = sb2.build()
        st2 = graph.update_hierarchical_data(init_state(tpl2, 1), tpl2)
        rt2 = build_render_template(tpl2)
        c2, _ = render_frame(st2, tpl2, rt2, RenderConfig(
            width=32, height=32, shadows=False))
        assert np.asarray(c2[0])[16, 16, 1] > 0.5

    def test_rectangle_texture_uv_rect(self):
        """uv_rect selects the texture sub-region (rectangle.rs
        uv_rect): left half red / right half blue texture, uv_rect
        picking only the red half → whole quad red."""
        from fyrox_tpu.render import RenderConfig, build_render_template, \
            render_frame
        tex = np.zeros((8, 8, 4), np.float32)
        tex[:, :4] = [1, 0, 0, 1]
        tex[:, 4:] = [0, 0, 1, 1]
        sb = SceneBuilder()
        sb.add_rectangle(color=(1, 1, 1), texture=tex,
                         uv_rect=(0.0, 0.0, 0.45, 1.0),
                         scale=(2.0, 2.0, 1.0))
        sb.add_camera("cam", position=(0, 0, 3.0), rotation=(0, 1, 0, 0))
        tpl = sb.build()
        st = graph.update_hierarchical_data(init_state(tpl, 1), tpl)
        rt = build_render_template(tpl)
        assert rt.tex_array is not None
        color, _ = render_frame(st, tpl, rt, RenderConfig(
            width=32, height=32, shadows=False))
        px = np.asarray(color[0])[16, 16]
        assert px[0] > 0.4 and px[2] < 0.2, px

    def test_rectangle_in_prefab_instantiate(self):
        prefab = SceneBuilder()
        prefab.add_rectangle(color=(0, 0, 1))
        sb = SceneBuilder()
        sb.add_rectangle(color=(1, 0, 0))
        sb.instantiate(prefab, position=(5, 0, 0))
        tpl = sb.build()
        assert len(tpl.rectangles["node"]) == 2
        n1 = int(tpl.rectangles["node"][1])
        assert tpl.node_type[n1] == NodeType.RECTANGLE
        assert tpl.payload[n1] == 1
