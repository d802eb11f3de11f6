"""Pathfinding.

Equivalent of fyrox-impl/src/utils/astar.rs (grid/graph A*, 603 LoC). Two
implementations:

  * `astar` — host-side numpy A* over an explicit graph (vertices +
    adjacency), matching the reference's per-query usage pattern (the
    reference also runs this on the game thread per query).
  * `distance_field` — batched Bellman-Ford relaxation on device: computes
    shortest-path distances from (per-world) source vertices over a static
    padded adjacency table, vmappable over worlds. The TPU-idiomatic
    formulation when thousands of agents need distances every step.
"""
from __future__ import annotations

import heapq
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["astar", "distance_field", "build_grid_graph"]


def astar(vertices: np.ndarray, neighbors: List[List[int]], start: int,
          goal: int) -> List[int]:
    """A* over a graph with Euclidean heuristic. Returns vertex index path
    (start..goal inclusive), or [] when unreachable."""
    n = len(vertices)
    if start == goal:
        return [start]
    dist = np.full(n, np.inf)
    dist[start] = 0.0
    came = np.full(n, -1, np.int64)
    h = np.linalg.norm(vertices - vertices[goal], axis=-1)
    open_heap = [(h[start], start)]
    closed = np.zeros(n, bool)
    while open_heap:
        _, u = heapq.heappop(open_heap)
        if u == goal:
            path = [goal]
            while path[-1] != start:
                path.append(int(came[path[-1]]))
            return path[::-1]
        if closed[u]:
            continue
        closed[u] = True
        for v in neighbors[u]:
            nd = dist[u] + np.linalg.norm(vertices[u] - vertices[v])
            if nd < dist[v]:
                dist[v] = nd
                came[v] = u
                heapq.heappush(open_heap, (nd + h[v], v))
    return []


def build_grid_graph(width: int, height: int, blocked=None):
    """4-connected grid graph (the reference's grid benches use the same
    construction). Returns (vertices [N,3], neighbors list)."""
    verts = np.zeros((width * height, 3), np.float32)
    neighbors: List[List[int]] = [[] for _ in range(width * height)]
    blocked = set() if blocked is None else set(blocked)
    for y in range(height):
        for x in range(width):
            i = y * width + x
            verts[i] = (x, 0, y)
            if i in blocked:
                continue
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nx, ny = x + dx, y + dy
                j = ny * width + nx
                if 0 <= nx < width and 0 <= ny < height and j not in blocked:
                    neighbors[i].append(j)
    return verts, neighbors


def pack_adjacency(vertices, neighbors, max_degree=None):
    """Pad the neighbor lists into [N, D] index + weight tables for the
    device distance field."""
    n = len(neighbors)
    d = max_degree or max((len(nb) for nb in neighbors), default=1)
    idx = np.zeros((n, d), np.int32)
    w = np.full((n, d), np.inf, np.float32)
    for i, nb in enumerate(neighbors):
        for k, j in enumerate(nb[:d]):
            idx[i, k] = j
            w[i, k] = np.linalg.norm(vertices[i] - vertices[j])
    return jnp.asarray(idx), jnp.asarray(w)


def distance_field(adj_idx, adj_w, sources, num_iters=None):
    """Batched Bellman-Ford: shortest distances from `sources`.

    adj_idx [N,D] int32, adj_w [N,D] f32 (inf = no edge).
    sources: [Wb] int32 (one source per world) or [Wb, N] bool masks.
    Returns [Wb, N] distances (inf unreachable). num_iters defaults to a
    diameter-ish bound (sqrt(N)*2 relaxation rounds under lax.scan).
    """
    n = adj_idx.shape[0]
    if sources.ndim == 1:
        src_mask = jax.nn.one_hot(sources, n, dtype=bool)
    else:
        src_mask = sources
    wb = src_mask.shape[0]
    dist0 = jnp.where(src_mask, 0.0, jnp.inf).astype(jnp.float32)
    iters = num_iters or int(2 * np.sqrt(n) + 8)

    def relax(dist, _):
        nbd = dist[:, adj_idx] + adj_w[None]          # [Wb,N,D]
        new = jnp.minimum(dist, jnp.min(nbd, axis=-1))
        return new, None

    dist, _ = jax.lax.scan(relax, dist0, None, length=iters)
    return dist
