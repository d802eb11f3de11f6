"""Navmesh agent example — the equivalent of the reference's
examples/navmesh.rs (an A* agent walking a small 3D scene; a BASELINE.json
config). Loads the reference's actual navmesh scene file, builds a navmesh,
and steers an agent along a funnel-smoothed path.

Run: python examples/example_navmesh.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pick a safe platform BEFORE any backend init: the axon TPU tunnel hangs
# uninterruptibly when down (see fyrox_tpu/platform.py).
from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import numpy as np

from fyrox_tpu.io import load_scene
from fyrox_tpu.utils import Navmesh, NavmeshAgent


def main():
    # load the reference's scene to prove .rgs interop (hierarchy only; the
    # walkable surface below is a simple two-room floor plan)
    t = load_scene("/root/reference/examples/data/navmesh_scene.rgs")
    print(f"loaded reference scene: {t.num_nodes} nodes "
          f"({', '.join(t.names[:4])}...)")

    # L-shaped floor: two legs sharing welded edges; the funnel has to cut
    # the corner rather than chaining triangle centers
    quads = [(0, 0, 4, 4), (0, 4, 4, 8), (4, 4, 8, 8)]
    verts, tris = [], []
    for (x0, z0, x1, z1) in quads:
        b = len(verts)
        verts += [(x0, 0, z0), (x1, 0, z0), (x1, 0, z1), (x0, 0, z1)]
        tris += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    nm = Navmesh(np.asarray(verts, np.float32), np.asarray(tris, np.int32))

    agent = NavmeshAgent(position=np.asarray([0.5, 0, 0.5], np.float32),
                         speed=2.0)
    ok = agent.calculate_path(nm, (7.5, 0, 7.5))
    assert ok, "no path found"
    print("waypoints:")
    for wp in agent.path:
        print(f"  ({wp[0]:.2f}, {wp[2]:.2f})")

    steps = 0
    while np.linalg.norm(agent.position - np.asarray([7.5, 0, 7.5])) > 0.05:
        agent.update(1.0 / 60.0)
        steps += 1
        if steps > 2000:
            raise RuntimeError("agent failed to arrive")
    print(f"agent arrived in {steps} steps ({steps / 60.0:.2f} s sim time)")


if __name__ == "__main__":
    main()
