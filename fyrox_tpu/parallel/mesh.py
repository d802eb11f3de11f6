"""Device-mesh parallelism: shard the world axis over chips.

The reference engine is single-process/single-GPU (SURVEY.md §2.12); the
TPU rebuild's scaling axis is the world batch W. Worlds are independent by
construction, so the sharding story is pure data parallelism over ICI:

  * a 1-D mesh ("worlds",) over all devices
  * every [W, ...] array in EngineState sharded on axis 0
  * collectives only for metric reductions (env·steps/sec, diagnostics)

shard_map is used rather than relying on jit's sharding propagation so the
per-device program is explicit (no accidental cross-world gathers), and so
the same code path scales to multi-host DCN (more worlds, still no
cross-world communication).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["world_mesh", "shard_state", "make_sharded_step", "make_sharded_rollout"]


def world_mesh(devices=None, axis_name="worlds") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _state_spec(state, axis_name):
    """PartitionSpec tree: shard leading (world) axis of every array leaf."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return P(axis_name)
        return P()
    return jax.tree.map(spec, state)


def shard_state(state, mesh: Mesh, axis_name="worlds"):
    """Place an EngineState (or any [W,...] PyTree) onto the mesh."""
    specs = _state_spec(state, axis_name)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def make_sharded_step(engine, mesh: Mesh, axis_name="worlds"):
    """jit-compiled per-chip engine step over the sharded world axis."""
    def step_fn(state):
        return engine.step(state)

    def wrapped(state):
        specs = _state_spec(state, axis_name)
        f = jax.shard_map(step_fn, mesh=mesh, in_specs=(specs,),
                          out_specs=specs)
        return f(state)

    return jax.jit(wrapped)


def make_sharded_rollout(engine, mesh: Mesh, num_steps: int,
                         axis_name="worlds", with_metrics=True):
    """Rollout of num_steps engine ticks per call, one dispatch, sharded.

    Returns fn(state) -> (state, metrics) where metrics are psum-reduced
    across the mesh (the only collective in the program)."""
    def roll(state):
        state = engine.rollout(state, num_steps)
        if with_metrics:
            # cross-chip reduction: mean body speed + world count, over ICI
            if state.physics is not None:
                speed = jnp.mean(jnp.linalg.norm(state.physics.linvel, axis=-1))
            else:
                speed = jnp.zeros(())
            n_worlds = jnp.asarray(state.scene.position.shape[0], jnp.float32)
            metrics = {
                "mean_body_speed": jax.lax.pmean(speed, axis_name),
                "total_worlds": jax.lax.psum(n_worlds, axis_name),
            }
            return state, metrics
        return state, {}

    def wrapped(state):
        specs = _state_spec(state, axis_name)
        f = jax.shard_map(roll, mesh=mesh, in_specs=(specs,),
                          out_specs=(specs, P()))
        return f(state)

    return jax.jit(wrapped)
