"""Batched deferred-render example — the BASELINE.json "4096-world deferred
render + CSM at 256x256" config at a single-chip-friendly world count.

Renders a lit scene (ground + objects + sun with 3-cascade shadow maps +
point light) for a batch of worlds with the Pallas tiled rasterizer and
writes the first world's frame to /tmp/fyrox_tpu_frame.ppm.

Run: python examples/example_render.py [num_worlds]
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

from fyrox_tpu.core import quat
from fyrox_tpu.render import (RenderConfig, build_render_template, make_cube,
                              make_plane, make_sphere, render_frame)
from fyrox_tpu.scene import SceneBuilder, graph, init_state


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    b = SceneBuilder()
    cam_rot = quat.face_towards(jnp.asarray([0.0, -0.5, 1.0]),
                                jnp.asarray([0.0, 1.0, 0.0]))
    b.add_camera("cam", position=(0, 5, -8), rotation=np.asarray(cam_rot))
    b.add_mesh(make_plane(30.0, albedo=(0.5, 0.5, 0.55)), "ground")
    rng = np.random.default_rng(0)
    for i in range(24):
        mesh = (make_sphere(0.5, 12, 12, albedo=tuple(rng.uniform(0.2, 0.9, 3)))
                if i % 2 else
                make_cube(1.0, albedo=tuple(rng.uniform(0.2, 0.9, 3))))
        b.add_mesh(mesh, f"obj{i}", position=(rng.uniform(-6, 6),
                                              rng.uniform(0.5, 3),
                                              rng.uniform(-3, 6)))
    sun_rot = quat.from_euler(np.pi / 2.3, 0.0, 0.4)
    b.add_light("directional", "sun", rotation=np.asarray(sun_rot), intensity=3.0)
    b.add_light("point", "lamp", position=(0, 3, 0), radius=10.0, intensity=8.0)
    t = b.build()

    state = init_state(t, num_worlds)
    state = graph.update_hierarchical_data(state, t)
    rt = build_render_template(t)
    cfg = RenderConfig(width=256, height=256, shadows=True,
                       use_pallas=True, k_per_tile=1024)
    f = jax.jit(lambda s: render_frame(s, t, rt, cfg))

    color, gbuf = f(state)
    jax.block_until_ready(color)
    t0 = time.perf_counter()
    for _ in range(5):
        color, gbuf = f(state)
    jax.block_until_ready(color)
    el = (time.perf_counter() - t0) / 5
    print(f"render: {rt.num_triangles} tris, {num_worlds} worlds at 256x256 "
          f"with CSM: {el * 1e3:.1f} ms/batch "
          f"({num_worlds / el:,.1f} world-frames/s)")

    img = np.asarray(jnp.clip(color[0] ** (1 / 2.2), 0, 1) * 255).astype(np.uint8)
    with open("/tmp/fyrox_tpu_frame.ppm", "wb") as fh:
        fh.write(b"P6\n256 256\n255\n")
        fh.write(img.tobytes())
    print("wrote /tmp/fyrox_tpu_frame.ppm")


if __name__ == "__main__":
    main()
