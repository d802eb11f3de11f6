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
    n = locals_.shape[1]
    dtype = locals_.dtype

    # Pointer doubling: ceil(log2(depth)) rounds of gather + affine
    # compose — no scatters. A virtual identity node at slot N absorbs
    # exhausted ancestor chains.
    #
    # The rounds run in PLANE FORM (14 planes [W,N+1]: a 3x4 affine + the
    # visibility/enabled flags as 0/1 floats): [W,N,4,4] tensors pad
    # their (4,4) minor dims to TPU (8,128) tiles — an 8x HBM blowup per
    # round that made this the engine's hottest non-physics op. The
    # gather is one static one-hot matmul over the 14-plane stack.
    tables = template.doubling_pointers()
    import numpy as _np
    ident_vals = (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    planes = [jnp.concatenate(
        [locals_[..., i, j], jnp.full((w, 1), v, dtype)], axis=1)
        for (i, j), v in zip([(r, c) for r in range(3) for c in range(4)],
                             ident_vals)]
    one_col = jnp.ones((w, 1), dtype)
    vis = jnp.concatenate([(state.visibility & state.alive).astype(dtype),
                           one_col], axis=1)
    en = jnp.concatenate([state.enabled.astype(dtype), one_col], axis=1)
    stack = jnp.stack(planes + [vis, en], axis=1)              # [W,14,N+1]
    for p in tables:
        m = _np.zeros((n + 1, n + 1), _np.float32)
        m[_np.arange(n + 1), _np.asarray(p)] = 1.0
        par = jnp.einsum("in,wan->wai", jnp.asarray(m), stack,
                         precision="highest")
        pr = [par[:, k] for k in range(12)]
        ch = [stack[:, k] for k in range(12)]
        out = []
        for r in range(3):
            for c in range(4):
                v = (pr[r * 4 + 0] * ch[0 * 4 + c]
                     + pr[r * 4 + 1] * ch[1 * 4 + c]
                     + pr[r * 4 + 2] * ch[2 * 4 + c])
                if c == 3:
                    v = v + pr[r * 4 + 3]
                out.append(v)
        out.append(par[:, 12] * stack[:, 12])
        out.append(par[:, 13] * stack[:, 13])
        stack = jnp.stack(out, axis=1)

    aff = jnp.stack([stack[:, r * 4 + c, :n] for r in range(3)
                     for c in range(4)], axis=-1).reshape(w, n, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), (w, n, 1, 4))
    globals_ = jnp.concatenate([aff, bottom], axis=2)
    return state._replace(globals_=globals_,
                          global_visibility=stack[:, 12, :n] > 0.5,
                          global_enabled=stack[:, 13, :n] > 0.5)


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
