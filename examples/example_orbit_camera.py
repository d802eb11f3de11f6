"""Stock-script example: per-world orbit cameras circling one scene.

Every world's OrbitCameraController (fyrox_tpu/scripts.py — the
fyrox-scripts/src/camera.rs equivalent, batched) receives a different
mouse stream, so each world renders the SAME scene from a different
orbit angle. Writes two worlds' frames to /tmp/fyrox_tpu_orbit_{0,1}.ppm.

Run: python examples/example_orbit_camera.py [num_worlds]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.engine import Engine
from fyrox_tpu.render import (RenderConfig, build_render_template, make_cube,
                              make_plane, render_frame)
from fyrox_tpu.scene import SceneBuilder, graph
from fyrox_tpu.script import ScriptProcessor
from fyrox_tpu.scripts import OrbitCameraController


def write_ppm(path, img):
    h, w = img.shape[:2]
    data = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(data.tobytes())


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sb = SceneBuilder()
    sb.add_mesh(make_plane(20.0, albedo=(0.45, 0.5, 0.45)), "ground")
    sb.add_mesh(make_cube(1.0, albedo=(0.8, 0.3, 0.2)), position=(0, 0.5, 0))
    sb.add_mesh(make_cube(0.6, albedo=(0.2, 0.3, 0.8)),
                position=(1.5, 0.3, 0.5))
    tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
    sb.add_light("directional", rotation=tilt, intensity=1.5)
    cam = sb.add_camera("cam", position=(0, 2, -6))
    eng = Engine(template=sb.build())
    state = eng.init_state(num_worlds=num_worlds)

    sp = ScriptProcessor()
    ctl = sp.add(OrbitCameraController(cam, num_worlds, target=(0, 0.5, 0),
                                       radius=6.0, sensitivity=4e-3))
    # a different mouse stream per world: world i orbits at its own rate
    rates = np.linspace(2.0, 14.0, num_worlds)
    for _ in range(60):
        ctl.set_input(mouse_delta=np.stack(
            [rates, np.full(num_worlds, 1.0)], -1))
        state = sp.update(eng, state, 1 / 60)

    scene = graph.update_hierarchical_data(state.scene, eng.template)
    rt = build_render_template(eng.template)
    color, _ = render_frame(scene, eng.template, rt,
                            RenderConfig(width=128, height=128))
    for wi in range(min(2, num_worlds)):
        out = f"/tmp/fyrox_tpu_orbit_{wi}.ppm"
        write_ppm(out, color[wi])
        print("wrote", out)
    # the orbit desyncs the worlds: frames must differ
    d = float(jnp.abs(color[0] - color[-1]).mean())
    print(f"mean |world0 - world{num_worlds-1}| = {d:.4f}")
    assert d > 1e-3


if __name__ == "__main__":
    main()
