"""Batched scene-graph update kernels.

The reference updates hierarchical data with per-node recursion and dirty
chains (fyrox-impl/src/scene/graph/mod.rs:1199 transform recursion, :1303
message-driven dirty propagation). In the batched TPU regime almost every
world touches almost every node each step, so dense levelized recompute is
both simpler and faster: one gather + 4x4-compose per hierarchy depth level,
vectorized over [W, nodes-at-level].

Visibility and enabled flags propagate the same way with AND in place of
matrix multiply (graph/mod.rs update_visibility_recursively semantics:
global = parent_global && own).
"""
from __future__ import annotations

import jax.numpy as jnp

from fyrox_tpu.core import transform as tfm
from fyrox_tpu.scene.state import WorldState
from fyrox_tpu.scene.template import SceneTemplate

__all__ = ["local_matrices", "update_hierarchical_data", "step", "world_bounding_boxes"]


def local_matrices(state: WorldState) -> jnp.ndarray:
    """[W,N,4,4] local matrices (Transform::matrix, scene/transform.rs:544)."""
    t = tfm.Transform(
        position=state.position,
        rotation=state.rotation,
        scale=state.scale,
        pre_rotation=state.pre_rotation,
        post_rotation=state.post_rotation,
        rotation_offset=state.rotation_offset,
        rotation_pivot=state.rotation_pivot,
        scaling_offset=state.scaling_offset,
        scaling_pivot=state.scaling_pivot,
    )
    return tfm.local_matrix(t)


def update_hierarchical_data(state: WorldState, template: SceneTemplate) -> WorldState:
    """Recompute global transforms + global visibility/enabled flags.

    Equivalent of Graph::update_hierarchical_data (graph/mod.rs:1275):
        global = parent_global @ local          (:1216)
        global_visibility = parent_gv && visibility
        global_enabled    = parent_ge && enabled
    levelized so each depth is one batched gather + compose.
    """
    locals_ = local_matrices(state)
    w = locals_.shape[0]
    dtype = locals_.dtype

    # Pointer doubling: ceil(log2(depth)) rounds of gather + batched 4x4
    # matmul — no scatters, so the program is a handful of large fused ops
    # instead of one small scatter chain per hierarchy level. A virtual
    # identity node at slot N absorbs exhausted ancestor chains.
    tables = template.doubling_pointers()
    ident = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (w, 1, 4, 4))
    acc = jnp.concatenate([locals_, ident], axis=1)            # [W,N+1,4,4]
    true_col = jnp.ones((w, 1), bool)
    vis = jnp.concatenate([state.visibility & state.alive, true_col], axis=1)
    en = jnp.concatenate([state.enabled, true_col], axis=1)
    for p in tables:
        idx = jnp.asarray(p)
        acc = tfm.mat4_mul(acc[:, idx], acc)
        vis = vis[:, idx] & vis
        en = en[:, idx] & en

    return state._replace(globals_=acc[:, :-1], global_visibility=vis[:, :-1],
                          global_enabled=en[:, :-1])


def step(state: WorldState, template: SceneTemplate, dt: float,
         update_hierarchy: bool = True) -> WorldState:
    """Pure scene-graph part of Graph::update (graph/mod.rs:1459):
    hierarchical data + lifetimes. Physics/animation are layered on top by
    the engine facade (fyrox_tpu.engine). The engine may skip the
    hierarchy pass here when it refreshes globals again post-physics."""
    if update_hierarchy:
        state = update_hierarchical_data(state, template)
    # Lifetime countdown; expired nodes die (graph/mod.rs:1495-1510 frees
    # nodes whose lifetime crossed zero — here death is a mask, not a free).
    lifetime = state.lifetime - dt
    alive = state.alive & (lifetime > 0.0)
    time = state.time + dt
    return state._replace(lifetime=lifetime, alive=alive, time=time)


def world_bounding_boxes(state: WorldState, template: SceneTemplate):
    """[W,N] world-space AABBs: local bbox transformed by the global matrix
    (NodeTrait::world_bounding_box, scene/node/mod.rs:178)."""
    from fyrox_tpu.core import aabb as aabb_mod
    if template.local_bbox_min is None:
        raise ValueError("template has no local bounding boxes")
    mins = jnp.asarray(template.local_bbox_min)[None]  # [1,N,3]
    maxs = jnp.asarray(template.local_bbox_max)[None]
    return aabb_mod.transform(jnp.broadcast_to(mins, state.position.shape),
                              jnp.broadcast_to(maxs, state.position.shape),
                              state.globals_)
