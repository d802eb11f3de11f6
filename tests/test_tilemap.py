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
