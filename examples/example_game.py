"""Integration showcase: textured render + physics + sound + per-world HUD.

A miniature complete game loop over a 4-world batch:
  * checkered ground + falling crates (slab physics, broadphase reuse)
  * a Sound node riding the first crate, Listener at the camera
  * deferred render with texture sampling + CSM shadows
  * per-world HUD (kinetic-energy bar + step counter) composed on top

Run: python examples/example_game.py [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pick a safe platform BEFORE any backend init: the axon TPU tunnel hangs
# uninterruptibly when down (see fyrox_tpu/platform.py).
from fyrox_tpu.platform import platform_guard  # noqa: E402

platform_guard()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fyrox_tpu.engine import Engine  # noqa: E402
from fyrox_tpu.physics import world as phys  # noqa: E402
from fyrox_tpu.physics import shapes as sh  # noqa: E402
from fyrox_tpu.render import (RenderConfig, build_render_template,  # noqa: E402
                              make_cube, make_plane, render_frame)
from fyrox_tpu.render.texture import Texture  # noqa: E402
from fyrox_tpu.scene import SceneBuilder  # noqa: E402
from fyrox_tpu.scene.template import NodeType  # noqa: E402
from fyrox_tpu.sound.engine import SAMPLE_RATE  # noqa: E402
from fyrox_tpu.ui.hud import Hud  # noqa: E402


def _checker(res=16):
    y, x = np.mgrid[0:res, 0:res]
    cell = ((x * 4 // res) + (y * 4 // res)) % 2
    a = np.asarray([0.55, 0.55, 0.6], np.float32)
    b = np.asarray([0.25, 0.3, 0.25], np.float32)
    return np.where(cell[..., None] == 0, a, b).astype(np.float32)


def build(num_worlds=4, n_crates=24, seed=0):
    rng = np.random.default_rng(seed)
    sb = SceneBuilder()
    ground = make_plane(24.0, albedo=(1.0, 1.0, 1.0))
    ground.albedo_texture = Texture.from_array(_checker())
    sb.add_mesh(ground, name="ground")
    tilt = (np.sin(np.pi / 5), 0.0, 0.0, np.cos(np.pi / 5))
    sb.add_light("directional", rotation=tilt, intensity=1.8)
    cam = sb.add_camera("cam", position=(0, 6.0, -12.0),
                        rotation=(np.sin(np.pi / 14), 0, 0,
                                  np.cos(np.pi / 14)))
    sb.add_listener("ears", parent=cam)

    pb = phys.PhysicsBuilder()
    g = pb.add_body(body_type=phys.BodyType.STATIC)
    pb.add_collider(g, sh.HALFSPACE, [], friction=0.6)
    crate_nodes = []
    for i in range(n_crates):
        p = (rng.uniform(-4, 4), 1.0 + 0.9 * i % 7, rng.uniform(-4, 4))
        node = sb.add_node(f"crate{i}", node_type=NodeType.RIGID_BODY,
                           position=p,
                           bbox=(np.full(3, -0.35), np.full(3, 0.35)))
        sb.add_mesh(make_cube(0.6, albedo=(0.75, 0.45, 0.2)),
                    name=f"crate{i}_mesh", parent=node)
        b = pb.add_body(node=node, position=p)
        pb.add_collider(b, sh.CUBOID, [0.3, 0.3, 0.3], friction=0.5)
        crate_nodes.append(node)

    # a hum riding the first crate
    t = np.arange(SAMPLE_RATE // 4) / SAMPLE_RATE
    hum = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sb.add_sound(hum, name="crate_hum", parent=crate_nodes[0],
                 radius=1.0, max_distance=30.0)

    template = sb.build()
    pt = pb.build(broadphase="slab" if n_crates >= 192 else "dense")
    engine = Engine(template=template, physics=pt)
    return engine, template


def main(steps=120, num_worlds=4):
    engine, template = build(num_worlds=num_worlds)
    state = engine.init_state(num_worlds)
    rt = build_render_template(template)
    cfg = RenderConfig(width=128, height=128, shadows=True,
                       use_pallas=jax.default_backend() == "tpu")
    hud = (Hud(128, 128)
           .add_bar("energy", x=8, y=8, w=112, h=6)
           .add_counter("step", x=8, y=18, digits=4, scale=1))

    @jax.jit
    def tick(s):
        s = engine.step(s)
        block, s = engine.render_audio(s, block_len=256)
        return s, block

    @jax.jit
    def draw(s, step_no):
        color, _ = render_frame(s.scene, template, rt, cfg)
        ke = 0.5 * jnp.sum(s.physics.linvel ** 2, axis=(1, 2))
        overlay = hud.render({
            "energy": jnp.clip(ke / 100.0, 0.0, 1.0),
            "step": jnp.full((color.shape[0],), step_no, jnp.int32)})
        from fyrox_tpu.ui.renderer import compose_over
        return compose_over(color, overlay)

    peak = 0.0
    for i in range(steps):
        state, block = tick(state)
        peak = max(peak, float(jnp.max(jnp.abs(block))))
    frames = draw(state, steps)
    print(f"ran {steps} ticks x {num_worlds} worlds on "
          f"{jax.default_backend()}; audio peak {peak:.3f}; "
          f"frame batch {tuple(frames.shape)}, "
          f"mean luma {float(jnp.mean(frames)):.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
