"""Utility layer: pathfinding, navmeshes, behavior trees.

Equivalent of fyrox-impl/src/utils/ (astar.rs, navmesh.rs, behavior/).
"""

from fyrox_tpu.utils import astar, behavior, navmesh
from fyrox_tpu.utils.astar import astar as astar_search
from fyrox_tpu.utils.astar import build_grid_graph, distance_field, pack_adjacency
from fyrox_tpu.utils.behavior import BehaviorTree, BehaviorTreeBuilder, Status
from fyrox_tpu.utils.navmesh import Navmesh, NavmeshAgent

__all__ = ["astar", "behavior", "navmesh", "astar_search", "build_grid_graph",
           "distance_field", "pack_adjacency", "BehaviorTree",
           "BehaviorTreeBuilder", "Status", "Navmesh", "NavmeshAgent"]
