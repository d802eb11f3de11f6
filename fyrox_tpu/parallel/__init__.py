"""Parallel layer: world-axis sharding over TPU device meshes."""

from fyrox_tpu.parallel.mesh import (make_sharded_rollout, make_sharded_step,
                                     shard_state, world_mesh)

__all__ = ["world_mesh", "shard_state", "make_sharded_step",
           "make_sharded_rollout"]
