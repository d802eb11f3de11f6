"""TileMap + autotile/WFC (scene/tilemap/, fyrox-autotile/src/lib.rs)."""
import numpy as np
import pytest

from fyrox_tpu.scene.tilemap import (EMPTY, TileMap, TileSet, tilemap_mesh,
                                     tilemap_collider_boxes)
from fyrox_tpu.utils.autotile import WfcModel, autotile_bitmask, wfc_collapse


def _map():
    ts = TileSet()
    grass = ts.add(color=(0.2, 0.8, 0.2), solid=False)
    rock = ts.add(color=(0.5, 0.5, 0.5), solid=True)
    grid = np.full((4, 6), EMPTY)
    grid[0, :] = rock            # floor row
    grid[1, 2] = grass
    grid[2, 2:4] = rock          # floating 2-wide platform
    return TileMap(TileSet(ts.tiles), grid, cell_size=2.0)


class TestTileMap:
    def test_mesh_quads_per_occupied_cell(self):
        tm = _map()
        mesh = tilemap_mesh(tm)
        occupied = int((tm.grid != EMPTY).sum())
        assert mesh.positions.shape == (occupied * 4, 3)
        assert mesh.triangles.shape == (occupied * 2, 3)

    def test_collider_boxes_merge_runs(self):
        tm = _map()
        boxes = tilemap_collider_boxes(tm)
        # floor row merges to ONE box; platform to ONE box; grass is not solid
        assert len(boxes) == 2
        floor = max(boxes, key=lambda b: b[2])
        assert floor[2] == 6.0 and floor[3] == 1.0      # 6x1 cells, cs=2
        assert floor[0] == 6.0 and floor[1] == 1.0      # centered


class TestAutotile:
    def test_bitmask_blob(self):
        filled = np.zeros((3, 3), bool)
        filled[1, :] = True           # horizontal strip
        m = autotile_bitmask(filled)
        assert m[0, 0] == -1
        assert m[1, 0] == 4           # east neighbor only
        assert m[1, 2] == 64          # west neighbor only
        assert m[1, 1] == 68          # east + west
        full = autotile_bitmask(np.ones((3, 3), bool))
        assert full[1, 1] == 255      # all 8 neighbors


class TestWfc:
    def test_checkerboard_rules(self):
        # two tiles that must alternate in every direction
        model = WfcModel.from_pairs(2, [(0, 1, d) for d in range(4)]
                                    + [(1, 0, d) for d in range(4)])
        g = wfc_collapse(model, 6, 6, seed=3)
        assert g.shape == (6, 6)
        for y in range(6):
            for x in range(5):
                assert g[y, x] != g[y, x + 1]
            if y < 5:
                assert not np.any(g[y] == g[y + 1])

    def test_learn_from_sample_deterministic(self):
        sample = np.asarray([[0, 1, 0, 1], [1, 0, 1, 0],
                             [0, 1, 0, 1], [1, 0, 1, 0]])
        model = WfcModel.from_sample(sample)
        g1 = wfc_collapse(model, 5, 5, seed=7)
        g2 = wfc_collapse(model, 5, 5, seed=7)
        np.testing.assert_array_equal(g1, g2)      # deterministic
        assert g1[0, 0] != g1[0, 1]


class TestAutotileBridge:
    """Autotile↔tilemap bridge + WFC placement + colliders
    (fyrox-impl/src/scene/tilemap/ autotile bridge + collider shapes)."""

    def _tileset(self):
        from fyrox_tpu.scene.tilemap import TileSet
        ts = TileSet()
        air = ts.add(solid=False, properties={"cost": 1.0})
        ground = ts.add(solid=True, properties={"cost": 10.0})
        g_top = ts.add(solid=True, color=(0.2, 0.8, 0.2),
                       properties={"cost": 10.0})   # grassy-top variant
        return ts, air, ground, g_top

    def test_apply_autotile_replaces_by_bitmask(self):
        from fyrox_tpu.scene.tilemap import TileMap, apply_autotile
        ts, air, ground, g_top = self._tileset()
        grid = np.full((4, 6), air, np.int64)
        grid[2:, :] = ground                      # flat terrain, rows 2-3
        tm = TileMap(tile_set=ts, grid=grid)
        # any mask WITHOUT the N bit (bit 0) is a surface cell → grass top
        table = {m: g_top for m in range(256) if not (m & 1)}
        out = apply_autotile(tm, {ground}, table)
        # row 2 has nothing above (N empty) → grass; row 3 stays ground
        # (autotile_bitmask rows: y grows downward, N = y-1)
        assert np.all(out.grid[2] == g_top)
        assert np.all(out.grid[3] == ground)
        assert np.all(out.grid[:2] == air)

    def test_property_layer(self):
        from fyrox_tpu.scene.tilemap import TileMap, tilemap_property_layer
        ts, air, ground, g_top = self._tileset()
        grid = np.full((2, 2), air, np.int64)
        grid[1, :] = ground
        layer = tilemap_property_layer(TileMap(tile_set=ts, grid=grid), "cost")
        assert layer[0, 0] == 1.0 and layer[1, 1] == 10.0

    @pytest.mark.slow
    def test_wfc_tilemap_colliders_support_a_ball(self):
        """WFC-generated map → autotile variants → merged cuboid
        colliders → a dim2 ball rests on the generated ground."""
        import jax
        from fyrox_tpu.physics import BALL, PhysicsBuilder
        from fyrox_tpu.physics import world as wm
        from fyrox_tpu.scene.tilemap import (apply_autotile, tilemap_from_wfc,
                                             tilemap_to_physics)
        ts, air, ground, g_top = self._tileset()
        # train on a horizon sample: ground strictly below air
        sample = np.asarray([[0, 0, 0, 0]] * 2 + [[1, 1, 1, 1]] * 2)
        model = WfcModel.from_sample(sample)
        tm = None
        for seed in range(16):      # all-air grids are also valid WFC output
            cand = tilemap_from_wfc(model, ts, 6, 8,
                                    wfc_to_tile={0: air, 1: ground},
                                    seed=seed)
            if np.any(cand.grid == ground):
                tm = cand
                break
        assert tm is not None, "WFC produced no ground in 16 seeds"
        tm = apply_autotile(tm, {ground}, {m: g_top for m in range(256)
                                           if not (m & 1)})
        # NOTE tilemap y grows downward in grid space but the collider
        # extraction maps rows to +y directly; find the top solid y extent
        pb = PhysicsBuilder()
        body, n_boxes = tilemap_to_physics(tm, pb)
        assert n_boxes >= 1
        top = max(cy + hy for (cx, cy, hx, hy) in
                  __import__("fyrox_tpu.scene.tilemap",
                             fromlist=["tilemap_collider_boxes"]
                             ).tilemap_collider_boxes(tm))
        b = pb.add_body(position=(4.0, top + 2.0, 0.0), dim2=True)
        pb.add_collider(b, BALL, [0.3])
        t = pb.build(broadphase="dense")
        s = wm.init_physics_state(pb, t, 1)
        step = jax.jit(lambda s: wm.step_physics(s, t, 1 / 60))
        for _ in range(180):
            s = step(s)
        y = float(s.position[0, -1, 1])
        assert abs(y - (top + 0.3)) < 0.05, (y, top)
