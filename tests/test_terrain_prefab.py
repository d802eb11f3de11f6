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


class TestChunkedTerrainLod:
    """Chunked terrain + per-chunk LOD (terrain/:126-135, quadtree.rs
    re-expressed via the engine's LOD-group culling)."""

    def test_chunks_cover_and_lod_switches(self):
        import numpy as np
        import jax.numpy as jnp
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        from fyrox_tpu.scene.terrain import Terrain, add_chunked_terrain

        hts = np.zeros((17, 17), np.float32)
        terr = Terrain(hts, size_x=32.0, size_z=32.0)
        sb = SceneBuilder()
        pairs = add_chunked_terrain(sb, terr, chunks=(2, 2), lod_split=0.2,
                                    decimate=4)
        sb.add_camera("cam", position=(0, 2.0, 0), z_near=0.1, z_far=100.0)
        t = sb.build()
        assert len(pairs) == 4
        # hi mesh has (9x9) grid per chunk; lo is 4x decimated (3x3)
        hi_mesh = t.meshes[t.payload[pairs[0][0]]]
        lo_mesh = t.meshes[t.payload[pairs[0][1]]]
        assert hi_mesh.positions.shape[0] > lo_mesh.positions.shape[0] * 4
        # the union of chunk meshes spans the full terrain rectangle
        all_pos = np.concatenate([t.meshes[t.payload[h]].positions
                                  for h, _ in pairs])
        assert all_pos[:, 0].min() == 0.0 and abs(all_pos[:, 0].max() - 32) < 1e-5
        # LOD machinery: near camera -> hi nodes visible in the render cull
        from fyrox_tpu.render import RenderConfig, build_render_template, render_frame
        st = graph.update_hierarchical_data(init_state(t, 1), t)
        rt = build_render_template(t)
        color, g = render_frame(st, t, rt, RenderConfig(width=16, height=16,
                                                        shadows=False,
                                                        chunk=16))
        assert color.shape == (1, 16, 16, 3)    # renders without error
