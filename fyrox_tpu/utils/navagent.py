"""NavigationalMesh scene-node runtime: template accessor + batched
world-parallel agents.

Closes the round-4 enum-only NAVMESH row: `SceneBuilder.add_navmesh`
puts navmesh geometry in the scene graph (fyrox-impl/src/scene/
navmesh.rs:81 NavigationalMesh node), `template_navmesh` bakes the
node's template transform into a `utils.navmesh.Navmesh` for
pathfinding, and `BatchedNavAgents` is the world-batched equivalent of
`NavmeshAgent` (fyrox-impl/src/utils/navmesh.rs:642): A* + funnel
pathfinding runs per world on the HOST (tiny graphs, exactly like the
reference runs it on CPU; SURVEY.md §7.7 keeps navmesh host-side), the
per-step waypoint STEERING is one vectorized jnp function over [W]
agents, suitable for driving rigid bodies inside a jitted step.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import quat
from fyrox_tpu.scene.template import NodeType, SceneTemplate
from fyrox_tpu.utils.navmesh import Navmesh

__all__ = ["template_navmesh", "BatchedNavAgents", "NavAgentState"]


def template_navmesh(template: SceneTemplate, index: int = 0) -> Navmesh:
    """Build a pathfinding Navmesh from the template's index-th NAVMESH
    node, with the node's template-time local TRS baked into the
    vertices (navmeshes are static geometry; per-world animated navmesh
    transforms are out of scope, as in the reference where the node's
    data is edited, not driven)."""
    nm = template.navmeshes
    if not nm or index >= len(nm.get("node", [])):
        raise IndexError(f"template has no NAVMESH payload {index}")
    node = int(nm["node"][index])
    verts, tris = template.navmesh_data[int(nm["data"][index])]
    p = np.asarray(template.init_position[node], np.float64)
    q = np.asarray(template.init_rotation[node], np.float64)
    s = np.asarray(template.init_scale[node], np.float64)
    rot = np.asarray(quat.to_mat3(jnp.asarray(q)), np.float64)
    world = (np.asarray(verts, np.float64) * s) @ rot.T + p
    return Navmesh(vertices=world.astype(np.float32),
                   triangles=np.asarray(tris, np.int32))


class NavAgentState(NamedTuple):
    """Device-side batched agent state."""
    waypoints: jnp.ndarray   # [W, P, 3] padded per-world paths
    length: jnp.ndarray      # [W] int32 true waypoint counts
    wp: jnp.ndarray          # [W] int32 current waypoint index


class BatchedNavAgents:
    """World-batched NavmeshAgent (utils/navmesh.rs:642): host
    `plan()` → device `steer()`.

    plan(navmesh, starts [W,3], goals [W,3]) computes one funnel-
    smoothed path per world on the host and pads them to a static
    [W, P, 3] tensor; steer(state, pos, speed, dt) returns the velocity
    toward the active waypoint and the advanced NavAgentState —
    pure jnp, usable inside jit/scan (e.g. written into a rigid body's
    linvel each step, the reference's agent-drives-body pattern)."""

    def __init__(self, radius: float = 0.05):
        self.radius = float(radius)

    def plan(self, navmesh: Navmesh, starts, goals) -> NavAgentState:
        starts = np.asarray(starts, np.float32)
        goals = np.asarray(goals, np.float32)
        paths = [navmesh.build_path(s, g) for s, g in zip(starts, goals)]
        pmax = max(max(len(p) for p in paths), 1)
        w = len(paths)
        wp = np.zeros((w, pmax, 3), np.float32)
        ln = np.zeros(w, np.int32)
        for i, p in enumerate(paths):
            if len(p):
                wp[i, :len(p)] = p
                wp[i, len(p):] = p[-1]      # pad with the goal
                ln[i] = len(p)
        return NavAgentState(waypoints=jnp.asarray(wp),
                             length=jnp.asarray(ln),
                             wp=jnp.zeros(w, jnp.int32))

    def steer(self, st: NavAgentState, pos, speed, dt):
        """pos [W,3] current agent/body positions → (vel [W,3],
        NavAgentState). Advances the waypoint cursor when within
        `radius` (or a dt step) of the target; velocity is zero once
        the path is exhausted."""
        w, pmax = st.waypoints.shape[:2]
        idx = jnp.minimum(st.wp, pmax - 1)
        target = jnp.take_along_axis(
            st.waypoints, idx[:, None, None].repeat(3, -1), axis=1)[:, 0]
        to = target - pos
        d = jnp.linalg.norm(to, axis=-1)
        step = jnp.asarray(speed) * dt
        arrived = d <= jnp.maximum(self.radius, step)
        active = st.wp < st.length
        new_wp = jnp.where(arrived & active, st.wp + 1, st.wp)
        dir_ = to / jnp.maximum(d, 1e-8)[:, None]
        vel = jnp.where((active & ~arrived)[:, None],
                        dir_ * jnp.asarray(speed).reshape(-1, 1), 0.0)
        return vel, st._replace(wp=new_wp)
