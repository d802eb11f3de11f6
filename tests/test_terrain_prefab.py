"""Terrain heightfields + prefab instantiation."""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.scene import SceneBuilder, graph, init_state
from fyrox_tpu.scene.terrain import (Terrain, sample_height,
                                     terrain_ball_contacts)


class TestTerrain:
    def _terrain(self):
        xs = np.linspace(0, 2 * np.pi, 17)
        zs = np.linspace(0, 2 * np.pi, 17)
        h = (np.sin(xs)[None, :] * np.cos(zs)[:, None]).astype(np.float32)
        return Terrain(heights=h, size_x=16.0, size_z=16.0)

    def test_height_sampling_matches_grid(self):
        t = self._terrain()
        # exact at grid points
        got = float(sample_height(t, jnp.asarray(0.0), jnp.asarray(0.0)))
        assert abs(got - t.heights[0, 0]) < 1e-6
        got = float(sample_height(t, jnp.asarray(16.0), jnp.asarray(16.0)))
        assert abs(got - t.heights[-1, -1]) < 1e-6
        # bilinear between: halfway between two grid x-neighbors
        x_half = 0.5 * (16.0 / 16)
        want = 0.5 * (t.heights[0, 0] + t.heights[0, 1])
        got = float(sample_height(t, jnp.asarray(x_half), jnp.asarray(0.0)))
        assert abs(got - want) < 1e-6

    def test_mesh_generation(self):
        t = self._terrain()
        mesh = t.to_mesh()
        assert mesh.num_vertices == 17 * 17
        assert mesh.num_triangles == 16 * 16 * 2
        # normals point generally up
        assert (mesh.normals[:, 1] > 0.0).all()

    def test_ball_contacts(self):
        t = Terrain(heights=np.zeros((9, 9), np.float32), size_x=8, size_z=8)
        centers = jnp.asarray([[4.0, 0.3, 4.0], [4.0, 5.0, 4.0]])
        radii = jnp.asarray([0.5, 0.5])
        n, p, depth, active = terrain_ball_contacts(t, centers, radii)
        assert bool(active[0]) and not bool(active[1])
        assert abs(float(depth[0]) - 0.2) < 1e-5
        np.testing.assert_allclose(np.asarray(n[0]), [0, -1, 0], atol=1e-5)

    def test_sphere_rolls_downhill_with_sampled_normal(self):
        """Integration sanity: sampled normals tilt downhill on a slope."""
        xs = np.linspace(0, 1, 9, dtype=np.float32)
        h = np.tile(xs[None, :] * 2.0, (9, 1))   # rises along +x
        t = Terrain(heights=h, size_x=8, size_z=8)
        n, _, _, _ = terrain_ball_contacts(
            t, jnp.asarray([[4.0, sample_height(t, 4.0, 4.0) + 0.4, 4.0]]),
            jnp.asarray([0.5]))
        # contact normal (ball→terrain) has +x component: surface pushes -x
        assert float(n[0, 0]) > 0.05


class TestPrefabInstantiate:
    def test_instantiate_remaps_and_transforms(self):
        prefab = SceneBuilder()
        r = prefab.add_pivot("body")
        prefab.add_pivot("arm", parent=r, position=(1, 0, 0))
        prefab.add_camera("eye", parent=r, position=(0, 1, 0))

        world = SceneBuilder()
        world.add_pivot("ground")
        i1 = world.instantiate(prefab, position=(10, 0, 0), name_prefix="a_")
        i2 = world.instantiate(prefab, position=(20, 0, 0), name_prefix="b_")
        t = world.build()
        state = init_state(t, 1)
        state = graph.update_hierarchical_data(state, t)
        g = np.asarray(state.globals_[0])
        a_arm = t.find_by_name("a_arm")
        b_arm = t.find_by_name("b_arm")
        np.testing.assert_allclose(g[a_arm, :3, 3], [11, 0, 0], atol=1e-5)
        np.testing.assert_allclose(g[b_arm, :3, 3], [21, 0, 0], atol=1e-5)
        # camera payloads remapped: two cameras exist, on distinct nodes
        assert len(t.cameras["node"]) == 2
        assert t.cameras["node"][0] != t.cameras["node"][1]
