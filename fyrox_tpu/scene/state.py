"""WorldState: the dynamic, batched half of a scene.

The reference mutates nodes in place each frame (`Graph::update`,
fyrox-impl/src/scene/graph/mod.rs:1459). Here the per-world dynamic data is
a PyTree of dense arrays with a leading world axis W, and stepping is a pure
function WorldState -> WorldState (scene/graph.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from fyrox_tpu.scene.template import SceneTemplate

__all__ = ["WorldState", "init_state"]


class WorldState(NamedTuple):
    """Batched dynamic scene state. All arrays lead with the world axis W.

    `globals_` / `global_visibility` / `global_enabled` are derived fields
    recomputed by `graph.update_hierarchical_data`; they are carried in the
    state so consumers (render, physics sync, scripts) can read them without
    recomputation, mirroring the reference's cached `global_transform`
    (scene/base.rs:441-482).
    """
    # local transforms [W,N,...]
    position: jnp.ndarray
    rotation: jnp.ndarray
    scale: jnp.ndarray
    # flags
    visibility: jnp.ndarray        # [W,N] bool — like Base::visibility
    enabled: jnp.ndarray           # [W,N] bool — like Base::enabled
    lifetime: jnp.ndarray          # [W,N] f32, +inf = unlimited (base.rs lifetime)
    alive: jnp.ndarray             # [W,N] bool — dense-pool validity mask
    # derived (filled by update_hierarchical_data)
    globals_: jnp.ndarray          # [W,N,4,4]
    global_visibility: jnp.ndarray # [W,N] bool
    global_enabled: jnp.ndarray    # [W,N] bool
    # simulation clock
    time: jnp.ndarray              # [W] f32
    # optional full-transform extras; None when the scene doesn't use them
    pre_rotation: Optional[jnp.ndarray] = None
    post_rotation: Optional[jnp.ndarray] = None
    rotation_offset: Optional[jnp.ndarray] = None
    rotation_pivot: Optional[jnp.ndarray] = None
    scaling_offset: Optional[jnp.ndarray] = None
    scaling_pivot: Optional[jnp.ndarray] = None
    # subsystem states (physics / animation), attached by the engine facade
    physics: Optional[NamedTuple] = None
    animation: Optional[NamedTuple] = None

    @property
    def num_worlds(self) -> int:
        return self.position.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.position.shape[1]


def _tile(a, w):
    return jnp.broadcast_to(jnp.asarray(a), (w,) + a.shape)


def init_state(template: SceneTemplate, num_worlds: int, dtype=jnp.float32) -> WorldState:
    """Broadcast the template's initial values into a [W, ...] WorldState."""
    w = num_worlds
    n = template.num_nodes

    def opt(a, d=4):
        return None if a is None else _tile(a.astype(np.float32), w)

    return WorldState(
        position=_tile(template.init_position.astype(np.float32), w),
        rotation=_tile(template.init_rotation.astype(np.float32), w),
        scale=_tile(template.init_scale.astype(np.float32), w),
        visibility=_tile(template.init_visibility.astype(bool), w),
        enabled=_tile(template.init_enabled.astype(bool), w),
        lifetime=_tile(template.init_lifetime.astype(np.float32), w),
        alive=jnp.ones((w, n), bool),
        globals_=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (w, n, 4, 4)),
        global_visibility=jnp.ones((w, n), bool),
        global_enabled=jnp.ones((w, n), bool),
        time=jnp.zeros((w,), dtype),
        pre_rotation=opt(template.init_pre_rotation),
        post_rotation=opt(template.init_post_rotation),
        rotation_offset=opt(template.init_rotation_offset),
        rotation_pivot=opt(template.init_rotation_pivot),
        scaling_offset=opt(template.init_scaling_offset),
        scaling_pivot=opt(template.init_scaling_pivot),
    )
