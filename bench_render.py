"""Render benchmark: BASELINE config #5 — deferred render + CSM at
256x256/world (the target shape is W=4096 over 8 chips; this measures
one chip's share and reports ms/frame/world and frames/s/chip).

Prints ONE JSON line like bench.py. Tune with:
    FYROX_BENCH_RENDER_WORLDS (default 16)
    FYROX_BENCH_RENDER_SIZE   (default 256)
"""
import json
import os
import time

import numpy as np


def main():
    if os.environ.get("FYROX_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from fyrox_tpu.render import (RenderConfig, build_render_template,
                                  make_cube, make_plane, make_sphere,
                                  render_frame, render_frame_demand)
    from fyrox_tpu.scene import SceneBuilder, graph, init_state

    n_worlds = int(os.environ.get("FYROX_BENCH_RENDER_WORLDS", 16))
    size = int(os.environ.get("FYROX_BENCH_RENDER_SIZE", 256))
    use_pallas = jax.default_backend() == "tpu"

    # a deferred-lit scene: ground + a grid of lit objects + dir light (CSM)
    sb = SceneBuilder()
    sb.add_mesh(make_plane(40.0, albedo=(0.5, 0.5, 0.5)), name="ground")
    rng = np.random.default_rng(0)
    for i in range(64):
        x, z = rng.uniform(-10, 10, 2)
        if i % 2:
            sb.add_mesh(make_cube(1.0, albedo=(0.7, 0.3, 0.2)),
                        position=(x, 0.5, z))
        else:
            sb.add_mesh(make_sphere(0.5, slices=8, stacks=8, albedo=(0.2, 0.4, 0.7)),
                        position=(x, 0.5, z))
    tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
    sb.add_light("directional", rotation=tilt, intensity=2.0)
    look_down = (np.sin(np.pi / 8), 0.0, 0.0, np.cos(np.pi / 8))
    sb.add_camera("cam", position=(0, 8.0, -14.0), rotation=look_down)
    t = sb.build()
    st = graph.update_hierarchical_data(init_state(t, n_worlds), t)
    rt = build_render_template(t)
    # pre-cull budgets: comma-separated per-cascade fractions or one
    # scalar. Default sizes each cascade to this scene's measured
    # occupancy (+headroom): c0 ~0%, c1 89%, c2 59% of T in-footprint.
    raw = os.environ.get("FYROX_BENCH_RENDER_PRECULL", "0.05,1.0,0.75")
    parts = [float(x) for x in raw.split(",")]
    budget = tuple(parts) if len(parts) > 1 else parts[0]
    cfg = RenderConfig(width=size, height=size, shadows=True,
                       use_pallas=use_pallas,
                       cascade_tri_budget=budget,
                       # per-tile bin capacity sized to this scene's
                       # measured max occupancy (350-405 of the old 512
                       # default, scripts/TPU_SESSION5_r4.json) + headroom
                       k_per_tile=int(os.environ.get(
                           "FYROX_BENCH_RENDER_KTILE", 424)),
                       # shadow passes concentrate casters into few
                       # tiles: the r5 audit measured 801 true demand on
                       # this scene (the camera pass stays < 424)
                       csm_k_per_tile=int(os.environ.get(
                           "FYROX_BENCH_RENDER_CSM_KTILE", 896)),
                       bin_mode=os.environ.get(
                           "FYROX_BENCH_RENDER_BINMODE", "cumsum"),
                       edge_mode=os.environ.get(
                           "FYROX_BENCH_RENDER_EDGEMODE", "vpu"))

    # bin-demand AUDIT (one world, separate program): binning silently
    # drops triangles past the k_per_tile cap, so a run whose true
    # per-tile demand reaches any pass's cap rendered a cheaper,
    # incorrect frame and must be invalidated (ADVICE r4: the 424
    # default sits just above measured 350-405). The audit runs once on
    # a 1-world slice — the TIMED program below stays the untouched
    # production render_frame (the audit variant unrolls cascades for
    # its demand trace and must not be what gets measured).
    if cfg.use_pallas and not os.environ.get("FYROX_BENCH_SKIP_AUDIT"):
        st1 = jax.tree_util.tree_map(lambda x: x[:1], st)
        _, demand, caps = jax.jit(
            lambda s: render_frame_demand(s, t, rt, cfg))(st1)
        dmax = np.asarray(demand).max(axis=0)           # per pass
        print(json.dumps({"bin_demand_max": [int(d) for d in dmax],
                          "bin_caps": [int(k) for k in caps]}), flush=True)
        over = [(p, int(d), int(k))
                for p, (d, k) in enumerate(zip(dmax, caps)) if int(d) >= k]
        if over:
            raise RuntimeError(
                f"bin overflow: (pass, demand, cap) {over} — raise "
                f"FYROX_BENCH_RENDER_KTILE / _CSM_KTILE; run invalid")

    frame = jax.jit(lambda s: render_frame(s, t, rt, cfg)[0])
    color = jax.block_until_ready(frame(st))
    float(jnp.sum(color))            # hard sync through the axon tunnel
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        color = frame(st)
        float(jnp.sum(color))
        times.append(time.time() - t0)
    dt = min(times)
    ms_per_world = dt / n_worlds * 1e3
    fps_chip = n_worlds / dt
    result = {
        "metric": f"deferred+CSM frames/s/chip (W={n_worlds}, {size}x{size}, "
                  f"65 meshes, dir light 3-cascade CSM)",
        "value": round(fps_chip, 1),
        "unit": "frames/s/chip",
        "ms_per_frame_per_world": round(ms_per_world, 3),
        "vs_baseline": round(fps_chip / (4096 * 60 / 8), 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    # driver-visible per-round artifact (the driver only captures bench.py;
    # the render number must not live in README prose alone)
    rnd = os.environ.get("FYROX_BENCH_ROUND", "")
    out = f"BENCH_render_r{rnd}.json" if rnd else "BENCH_render.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), out),
              "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    if os.environ.get("FYROX_BENCH_CHILD"):
        main()
    else:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fyrox_tpu.platform import run_benchmark_guarded
        run_benchmark_guarded(os.path.abspath(__file__),
                              metric="deferred+CSM frames/s/chip",
                              unit="frames/s/chip")
