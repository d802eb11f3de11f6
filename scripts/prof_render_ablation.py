"""Profile render stages by ablating inside the FULL pipeline program
(standalone stage programs crash the axon worker; the full render_frame
shape is known-good)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp


def p(*a):
    print(*a); sys.stdout.flush()


from fyrox_tpu.render import (RenderConfig, build_render_template,
                              make_cube, make_plane, make_sphere,
                              render_frame)
from fyrox_tpu.render import pallas_raster as pr
from fyrox_tpu.scene import SceneBuilder, graph, init_state

W, SIZE = 16, 256
sb = SceneBuilder()
sb.add_mesh(make_plane(40.0, albedo=(0.5, 0.5, 0.5)), name="ground")
rng = np.random.default_rng(0)
for i in range(64):
    x, z = rng.uniform(-10, 10, 2)
    if i % 2:
        sb.add_mesh(make_cube(1.0, albedo=(0.7, 0.3, 0.2)), position=(x, 0.5, z))
    else:
        sb.add_mesh(make_sphere(0.5, slices=8, stacks=8, albedo=(0.2, 0.4, 0.7)),
                    position=(x, 0.5, z))
tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
sb.add_light("directional", rotation=tilt, intensity=2.0)
look_down = (np.sin(np.pi / 8), 0.0, 0.0, np.cos(np.pi / 8))
sb.add_camera("cam", position=(0, 8.0, -14.0), rotation=look_down)
t = sb.build()
st = graph.update_hierarchical_data(init_state(t, W), t)
rt = build_render_template(t)


def timeit(name, cfg):
    f = jax.jit(lambda s: render_frame(s, t, rt, cfg)[0])
    out = f(st)
    float(jnp.sum(out))
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(st)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    p(f"{name:34s} {dt*1e3:8.2f} ms total {dt/W*1e3:8.3f} ms/world")


cfg_ns = RenderConfig(width=SIZE, height=SIZE, shadows=False, use_pallas=True)
cfg_sh = RenderConfig(width=SIZE, height=SIZE, shadows=True, use_pallas=True)

timeit("baseline noshadow", cfg_ns)

orig_bin = pr._bin_triangles
orig_vis = pr._visibility_pallas
orig_feat = pr._tri_features


def stub_bin(bbox, ok, height, width, tile_h, tile_w, k_per_tile):
    nty, ntx = height // tile_h, width // tile_w
    ids = jnp.broadcast_to(jnp.arange(k_per_tile, dtype=jnp.int32),
                           (nty, ntx, k_per_tile))
    valid = jnp.ones((nty, ntx, k_per_tile), bool)
    count = jnp.full((nty, ntx), k_per_tile, jnp.int32)
    return ids, valid, count


pr._bin_triangles = stub_bin
timeit("no-topk (stub bins, full K)", cfg_ns)
pr._bin_triangles = orig_bin


def stub_vis(feats, tile_ids, tile_count, height, width, tile_h, tile_w,
             k_per_tile, interpret=False, depth_only=False,
             homogeneous=False):
    z = jnp.full((height, width), jnp.sum(feats) * 0 + 0.5, jnp.float32)
    if depth_only:
        return z
    idx = jnp.zeros((height, width), jnp.int32)
    w0 = jnp.full((height, width), 0.3)
    return z, idx, w0, w0


pr._visibility_pallas = stub_vis
timeit("no-kernel (stub visibility)", cfg_ns)
pr._visibility_pallas = orig_vis

pr._bin_triangles = stub_bin
pr._visibility_pallas = stub_vis
timeit("no-topk+no-kernel", cfg_ns)
pr._bin_triangles = orig_bin
pr._visibility_pallas = orig_vis

timeit("baseline shadows", cfg_sh)
pr._bin_triangles = stub_bin
timeit("shadows no-topk", cfg_sh)
pr._bin_triangles = orig_bin
p("done")
