"""1k-body contact-heavy pile — the BASELINE.json physics stress config.

Run: python examples/example_pile.py [num_bodies] [num_worlds]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pick a safe platform BEFORE any backend init: the axon TPU tunnel hangs
# uninterruptibly when down (see fyrox_tpu/platform.py).
from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import time

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.physics import (BALL, CUBOID, HALFSPACE, BodyType,
                               PhysicsBuilder, init_physics_state,
                               step_physics)


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    b = PhysicsBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.add_collider(g, HALFSPACE, [], friction=0.6)
    grid = max(int(np.ceil(nb ** (1 / 3))), 1)
    for i in range(nb):
        gx, gy, gz = i % grid, (i // grid) % grid, i // (grid * grid)
        pos = ((gx - grid / 2) * 0.7 + rng.uniform(-0.03, 0.03),
               0.5 + gy * 0.7,
               (gz - grid / 2) * 0.7 + rng.uniform(-0.03, 0.03))
        bi = b.add_body(position=pos)
        if i % 2:
            b.add_collider(bi, BALL, [0.25], friction=0.5)
        else:
            b.add_collider(bi, CUBOID, [0.22] * 3, friction=0.5)
    # compacted broadphase: dense incidence matrices do not scale to 500k
    # candidate pairs, so the top-k dynamic path is used here
    t = b.build(max_active_pairs=min(nb * 4, b and 500_000))
    print(f"{nb} bodies, {t.num_pairs} candidate pairs, cap {t.max_active_pairs}")

    s = init_physics_state(b, t, w)
    step = jax.jit(lambda s: step_physics(s, t, 1 / 60))
    s = step(s)
    _ = np.asarray(s.position)  # hard sync (block_until_ready lies via tunnel)
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        s = step(s)
    _ = np.asarray(s.position)
    el = (time.perf_counter() - t0) / n
    print(f"{el * 1e3:.1f} ms/step x {w} worlds = "
          f"{w * nb / el:,.0f} body-steps/s")
    pos = np.asarray(s.position)
    print(f"after {n / 60:.1f}s sim: min y {pos[:, 1:, 1].min():.2f}, "
          f"max |v| {np.abs(np.asarray(s.linvel)).max():.2f}")


if __name__ == "__main__":
    main()
