"""HUD over a 3D scene: UI draw commands rasterized and composed onto
rendered frames (the VERDICT round-1 'ui_renderer' done-criterion).

Run:  python examples/example_hud.py
Writes hud_frame.npy ([H,W,3] f32) and prints a summary.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pick a safe platform BEFORE any backend init: the axon TPU tunnel hangs
# uninterruptibly when down (see fyrox_tpu/platform.py).
from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import numpy as np

import jax
import jax.numpy as jnp

from fyrox_tpu.render import (RenderConfig, build_render_template, make_cube,
                              make_plane, render_frame)
from fyrox_tpu.scene import SceneBuilder, graph, init_state
from fyrox_tpu.ui import UserInterface, Widget, compose_over, render_ui

H = W = 128


def main():
    # ---- 3D scene: ground + a couple of lit cubes ----
    sb = SceneBuilder()
    sb.add_mesh(make_plane(20.0, albedo=(0.45, 0.5, 0.4)), name="ground")
    sb.add_mesh(make_cube(1.0, albedo=(0.8, 0.3, 0.2)), position=(0, 0.5, 4))
    sb.add_mesh(make_cube(1.0, albedo=(0.2, 0.4, 0.8)), position=(2, 0.5, 6))
    tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
    sb.add_light("directional", rotation=tilt, intensity=2.0)
    down = (np.sin(np.pi / 10), 0.0, 0.0, np.cos(np.pi / 10))
    sb.add_camera("cam", position=(0, 3.0, -4.0), rotation=down)
    t = sb.build()
    st = graph.update_hierarchical_data(init_state(t, 1), t)
    rt = build_render_template(t)
    frames, _ = render_frame(st, t, rt, RenderConfig(
        width=W, height=H, shadows=True,
        sky_zenith=(0.3, 0.5, 0.8), sky_horizon=(0.8, 0.85, 0.9)))

    # ---- HUD: a stat window + health bar, laid out by the UI core ----
    ui = UserInterface((W, H))
    win = ui.add(Widget(kind="window", title="STATS", width=70.0,
                        height=46.0, margin=(4, 4, 0, 0), title_height=14.0,
                        background=(0.05, 0.05, 0.1, 0.65)))
    body = ui.add(Widget(kind="stack"), win)
    ui.add(Widget(kind="text", text="FPS 60", height=14.0), body)
    ui.add(Widget(kind="text", text="HP 87", height=14.0), body)
    bar = ui.add(Widget(kind="border", width=100.0, height=8.0,
                        margin=(4, float(H - 16), 0, 0),
                        background=(0.2, 0.0, 0.0, 0.9),
                        foreground=(0.9, 0.9, 0.9, 1.0)))
    ui.add(Widget(kind="border", width=87.0, height=8.0,
                  background=(0.1, 0.8, 0.1, 0.9)), bar)
    ui.update_layout()
    hud = render_ui(ui.draw(), H, W)

    out = np.asarray(compose_over(frames, hud))[0]
    np.save("hud_frame.npy", out)
    covered = float((hud[..., 3] > 0).mean())
    print(f"frame {out.shape}, HUD covers {covered:.1%} of the screen, "
          f"mean luminance {out.mean():.3f} -> hud_frame.npy")


if __name__ == "__main__":
    main()
