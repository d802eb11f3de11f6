"""2D scene example — the equivalent of the reference's examples/2d.rs
(sprites + rapier2d, headless step loop; one of the BASELINE.json configs).

Builds a batch of 2D worlds: sprite rectangles attached to plane-locked
rigid bodies bouncing in a box, steps them headless at 60 Hz, and prints
throughput.

Run: python examples/example_2d.py [num_worlds]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pick a safe platform BEFORE any backend init: the axon TPU tunnel hangs
# uninterruptibly when down (see fyrox_tpu/platform.py).
from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.engine import Engine
from fyrox_tpu.physics import (BALL, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder)
from fyrox_tpu.scene import NodeType, SceneBuilder


def build(num_sprites=32):
    sb = SceneBuilder()
    sb.add_camera("camera", position=(0, 5, -12), ortho=True, vertical_size=8.0)
    pb = PhysicsBuilder()
    # floor + two walls (2D arena)
    floor = pb.add_body(node=sb.add_pivot("floor"), body_type=BodyType.STATIC)
    pb.add_collider(floor, HALFSPACE, [], friction=0.4, restitution=0.4)
    rng = np.random.default_rng(7)
    for i in range(num_sprites):
        pos = (rng.uniform(-5, 5), rng.uniform(2, 10), 0.0)
        node = sb.add_node(f"sprite{i}", node_type=NodeType.RECTANGLE,
                           position=pos,
                           bbox=(np.full(3, -0.25), np.full(3, 0.25)))
        bi = pb.add_body(node=node, position=pos, dim2=True)
        if i % 2:
            pb.add_collider(bi, BALL, [0.2], restitution=0.6, friction=0.3)
        else:
            pb.add_collider(bi, CUBOID, [0.18, 0.18, 0.18], restitution=0.4,
                            friction=0.3)
    return Engine(template=sb.build(), physics=pb.build())


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    engine = build()
    state = engine.init_state(num_worlds)
    roll = jax.jit(lambda s: engine.rollout(s, 60))

    state = roll(state)  # compile + 1s of simulation
    jax.block_until_ready(state.physics.position)
    t0 = time.perf_counter()
    n_calls = 5
    for _ in range(n_calls):
        state = roll(state)
    jax.block_until_ready(state.physics.position)
    el = time.perf_counter() - t0

    z = float(jnp.abs(state.physics.position[..., 2]).max())
    print(f"2d example: {num_worlds} worlds x 32 sprites, "
          f"{num_worlds * 60 * n_calls / el:,.0f} env·steps/s, "
          f"max |z| = {z:.2e} (plane lock)")


if __name__ == "__main__":
    main()
