"""Scene graph tests: levelized propagation vs a recursive numpy reference,
visibility/enabled/lifetime semantics, camera matrices, world AABBs."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core import quat
from fyrox_tpu.scene import SceneBuilder, NodeType, init_state, graph, camera


def np_quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def np_trs(p, q, s):
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = np_quat_to_mat(q) * s[None, :]
    m[:3, 3] = p
    return m


def build_random_scene(rng, n_nodes=40):
    b = SceneBuilder()
    for i in range(n_nodes):
        parent = -1 if i == 0 else int(rng.integers(0, i))
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        b.add_node(name=f"n{i}", parent=parent,
                   position=rng.standard_normal(3),
                   rotation=q, scale=rng.uniform(0.5, 2.0, 3),
                   bbox=(np.full(3, -0.5), np.full(3, 0.5)))
    return b.build()


class TestPropagation:
    def test_matches_recursive_reference(self):
        rng = np.random.default_rng(0)
        template = build_random_scene(rng)
        state = init_state(template, num_worlds=4)
        state = graph.update_hierarchical_data(state, template)
        got = np.asarray(state.globals_)

        # recursive numpy reference (the reference's graph/mod.rs:1216)
        n = template.num_nodes
        want = np.zeros((n, 4, 4))
        for i in range(n):  # parents precede children by construction
            local = np_trs(template.init_position[i], template.init_rotation[i],
                           template.init_scale[i])
            p = template.parent[i]
            want[i] = want[p] @ local if p >= 0 else local
        for w in range(4):
            np.testing.assert_allclose(got[w], want, atol=2e-4)

    def test_per_world_divergence(self):
        """Different worlds with different local transforms propagate independently."""
        b = SceneBuilder()
        root = b.add_pivot("root")
        child = b.add_pivot("child", parent=root, position=(1, 0, 0))
        template = b.build()
        state = init_state(template, num_worlds=3)
        # move each world's root differently
        new_pos = jnp.asarray([[0.0, 0, 0], [0, 5, 0], [0, 0, 9]])
        state = state._replace(position=state.position.at[:, root].set(new_pos))
        state = graph.update_hierarchical_data(state, template)
        got = np.asarray(state.globals_[:, child, :3, 3])
        np.testing.assert_allclose(got, [[1, 0, 0], [1, 5, 0], [1, 0, 9]], atol=1e-6)

    def test_visibility_and_enabled_propagation(self):
        b = SceneBuilder()
        a = b.add_pivot("a")
        c = b.add_pivot("b", parent=a)
        d = b.add_pivot("c", parent=c)
        template = b.build()
        state = init_state(template, num_worlds=2)
        # hide middle node in world 0, disable root in world 1
        vis = state.visibility.at[0, c].set(False)
        en = state.enabled.at[1, a].set(False)
        state = state._replace(visibility=vis, enabled=en)
        state = graph.update_hierarchical_data(state, template)
        gv = np.asarray(state.global_visibility)
        ge = np.asarray(state.global_enabled)
        assert gv[0].tolist() == [True, False, False]
        assert gv[1].tolist() == [True, True, True]
        assert ge[0].tolist() == [True, True, True]
        assert ge[1].tolist() == [False, False, False]

    def test_lifetime_kills_nodes(self):
        b = SceneBuilder()
        b.add_pivot("short", lifetime=0.05)
        b.add_pivot("long")
        template = b.build()
        state = init_state(template, num_worlds=1)
        stepper = jax.jit(lambda s: graph.step(s, template, 1.0 / 60.0))
        for _ in range(4):
            state = stepper(state)
        alive = np.asarray(state.alive[0])
        assert not alive[0] and alive[1]
        assert abs(float(state.time[0]) - 4.0 / 60.0) < 1e-6

    def test_world_bounding_boxes(self):
        b = SceneBuilder()
        m = b.add_node("box", bbox=(np.full(3, -1.0), np.full(3, 1.0)),
                       position=(10, 0, 0), scale=(2, 1, 1))
        template = b.build()
        state = init_state(template, num_worlds=1)
        state = graph.update_hierarchical_data(state, template)
        mins, maxs = graph.world_bounding_boxes(state, template)
        np.testing.assert_allclose(np.asarray(mins[0, m]), [8, -1, -1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(maxs[0, m]), [12, 1, 1], atol=1e-5)


class TestCamera:
    def test_view_matrix_inverts_camera_pose(self):
        """A camera at pose G looking along +Z: view @ camera_pos == origin."""
        b = SceneBuilder()
        rot = quat.from_euler(0.0, np.pi / 3, 0.0)
        cam = b.add_camera("cam", position=(3, 2, 1), rotation=np.asarray(rot))
        template = b.build()
        state = init_state(template, num_worlds=1)
        state = graph.update_hierarchical_data(state, template)
        view = camera.view_matrix(state.globals_[:, cam])
        eye_h = jnp.asarray([3.0, 2, 1, 1])
        out = jnp.einsum("wij,j->wi", view, eye_h)
        np.testing.assert_allclose(np.asarray(out[0, :3]), [0, 0, 0], atol=1e-5)

    def test_perspective_projects_to_ndc(self):
        proj = camera.perspective(jnp.asarray(np.pi / 2), jnp.asarray(1.0),
                                  jnp.asarray(1.0), jnp.asarray(100.0))
        # point on the near plane center → NDC z = -1
        p = jnp.asarray([0.0, 0, -1, 1])
        out = proj @ p
        ndc = out[:3] / out[3]
        np.testing.assert_allclose(np.asarray(ndc), [0, 0, -1], atol=1e-5)
        # point at the far plane → NDC z = +1
        p = jnp.asarray([0.0, 0, -100, 1])
        out = proj @ p
        np.testing.assert_allclose(float(out[2] / out[3]), 1.0, atol=1e-4)

    def test_camera_frustum_culls_correctly(self):
        b = SceneBuilder()
        cam = b.add_camera("cam", position=(0, 0, 0))  # looks along +Z
        visible = b.add_node("v", position=(0, 0, 10), bbox=(np.full(3, -1.0), np.full(3, 1.0)))
        hidden = b.add_node("h", position=(0, 0, -10), bbox=(np.full(3, -1.0), np.full(3, 1.0)))
        template = b.build()
        state = init_state(template, num_worlds=2)
        state = graph.update_hierarchical_data(state, template)
        vp = camera.view_projection(state.globals_[:, cam], fov_y=np.deg2rad(75.0),
                                    aspect=1.0, z_near=0.025, z_far=2048.0)
        planes = camera.camera_frustums(vp)
        mins, maxs = graph.world_bounding_boxes(state, template)
        from fyrox_tpu.core import frustum as fr
        vis = fr.intersects_aabb(planes[:, None], mins, maxs)
        assert bool(vis[0, visible]) and bool(vis[1, visible])
        assert not bool(vis[0, hidden]) and not bool(vis[1, hidden])


class TestIntegrity:
    def test_validate_healthy_and_broken(self):
        """Graph::restore_integrity-style checks (graph/mod.rs:2504)."""
        b = SceneBuilder()
        b.add_camera("cam")
        b.add_pivot("p")
        t = b.build()
        assert t.validate() == []
        # corrupt: camera payload pointing at a pivot
        t.cameras["node"] = np.asarray([1])
        problems = t.validate()
        assert any("camera" in p for p in problems)
        # corrupt: out-of-range parent
        t2 = b.build()
        t2.parent = t2.parent.copy()
        t2.parent[1] = 99
        assert any("parent" in p for p in t2.validate())
