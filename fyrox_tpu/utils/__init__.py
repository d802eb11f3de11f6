"""Utility layer: pathfinding, navmeshes, behavior trees.

Equivalent of fyrox-impl/src/utils/ (astar.rs, navmesh.rs, behavior/).
"""

from fyrox_tpu.utils import astar, behavior, navagent, navmesh, watcher
from fyrox_tpu.utils.navagent import (BatchedNavAgents, NavAgentState,
                                      template_navmesh)
from fyrox_tpu.utils.astar import astar as astar_search
from fyrox_tpu.utils.astar import build_grid_graph, distance_field, pack_adjacency
from fyrox_tpu.utils.behavior import BehaviorTree, BehaviorTreeBuilder, Status
from fyrox_tpu.utils.navmesh import Navmesh, NavmeshAgent
from fyrox_tpu.utils.watcher import FileSystemWatcher

__all__ = ["astar", "behavior", "navagent", "navmesh", "watcher",
           "FileSystemWatcher", "BatchedNavAgents", "NavAgentState",
           "template_navmesh",
           "astar_search", "build_grid_graph",
           "distance_field", "pack_adjacency", "BehaviorTree",
           "BehaviorTreeBuilder", "Status", "Navmesh", "NavmeshAgent"]
