"""fyrox_tpu — a TPU-native batched game/simulation engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Fyrox game
engine (reference: FyroxEngine/Fyrox v2.0.0-rc.1). Instead of a single
mutable scene stepped on a CPU, the engine here is a *pure functional state
transition system*:

    WorldState (PyTree of dense SoA arrays)  --step(dt)-->  WorldState
    WorldState --render--> images

vmapped over a world axis (thousands of identical-topology worlds) and
shard_mapped over a TPU device mesh for rollout-scale throughput.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  core/       math: quaternions, transforms, AABB/frustum/ray, curves
              (fyrox-math + fyrox-core equivalents)
  scene/      scene graph: node pools as SoA arrays, levelized transform
              propagation (fyrox-impl/src/scene/graph)
  physics/    batched rigid-body pipeline (rapier3d/2d equivalents)
  animation/  tracks, pose blending, ABSM, skinning (fyrox-animation)
  render/     frustum culling, Pallas software rasterizer, deferred
              lighting, CSM shadows (fyrox-impl/src/renderer + graphics HAL)
  parallel/   device-mesh sharding of the world axis (no reference
              equivalent; the reference is single-process)
  io/         .rgs Visitor-format (de)serialization (fyrox-core/src/visitor)
  utils/      navmesh A*, behavior trees, misc (fyrox-impl/src/utils)
"""

from fyrox_tpu import core

__version__ = "0.1.0"
