"""TPU session 6 (round 4 cont.): one-process A/B of the round-5 perf levers.

Levers measured end-to-end on the flagship step (W=128, 1k bodies):
  A. gather mode: flat [BP,BLK] one-hot vs two-level (hi,lo) decomposition
     (pallas_ops._gather_kernel2)
  B. broadphase rank: argsort vs counting-rank + permutation scatter
     (pallas_ops.rank_rows/scatter_rows)
  C. compact mode: 14 masked-sum reductions vs one HIGHEST-precision
     einsum contraction (slab2._compact)
plus the render bench A/B:
  D. k_per_tile 512 vs 424 (measured max occupancy 350-405)
  E. CSM map_size 256 vs 192 (quality knob; records ms only)

ONE python process; every measurement is a fresh jit (mode env vars are
read at trace time). Timing: R-iteration jitted rolls, min over reps,
hard float() sync. Prints one JSON dict; tee to scripts/TPU_SESSION6_r4.json.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np
import jax
import jax.numpy as jnp

OUT = {}

W = int(os.environ.get("FYROX_PROF_WORLDS", 128))
STEPS = 20
REPS = 3


def _roll_rate(engine, skin, n_worlds):
    from fyrox_tpu.animation import skinning
    state = engine.init_state(num_worlds=n_worlds)
    params = jnp.zeros((n_worlds, 1), bool)

    @jax.jit
    def roll(state):
        def body(s, _):
            return engine.step(s, machine_params=params), None
        state, _ = jax.lax.scan(body, state, None, length=STEPS)
        bm = skinning.bone_matrices(state.scene.globals_, skin)
        verts = skinning.skin_positions_dense(bm, skin, precision="default")
        return state, jnp.sum(verts[..., 0])

    state, chk = roll(state)
    float(chk)
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, chk = roll(state)
        float(chk)
        dt = time.perf_counter() - t0
        best = max(best, n_worlds * STEPS / dt)
    return round(best, 1)


def physics_ab():
    from fyrox_tpu.models import build_flagship
    engine, skin = build_flagship(n_bones=100, n_verts=50_000,
                                  n_bodies=1000)
    configs = [
        ("old_all", dict(FYROX_GATHER_MODE="flat", FYROX_BP_RANK="sort",
                         FYROX_COMPACT_MODE="where")),
        ("new_all", dict(FYROX_GATHER_MODE="two", FYROX_BP_RANK="count",
                         FYROX_COMPACT_MODE="einsum")),
        ("two_only", dict(FYROX_GATHER_MODE="two", FYROX_BP_RANK="sort",
                          FYROX_COMPACT_MODE="where")),
        ("count_only", dict(FYROX_GATHER_MODE="flat", FYROX_BP_RANK="count",
                            FYROX_COMPACT_MODE="where")),
        ("einsum_only", dict(FYROX_GATHER_MODE="flat", FYROX_BP_RANK="sort",
                             FYROX_COMPACT_MODE="einsum")),
    ]
    for name, env in configs:
        os.environ.update(env)
        try:
            OUT[f"flagship_{name}"] = _roll_rate(engine, skin, W)
        except Exception as e:          # record and keep going
            OUT[f"flagship_{name}"] = f"ERROR: {type(e).__name__}: {e}"[:200]
        print(json.dumps({name: OUT.get(f'flagship_{name}')}), flush=True)


def render_ab():
    from fyrox_tpu.render import (RenderConfig, build_render_template,
                                  make_cube, make_plane, make_sphere,
                                  render_frame)
    from fyrox_tpu.render import shadows as shadows_mod
    from fyrox_tpu.scene import SceneBuilder, graph, init_state

    n_worlds, size = 16, 256
    sb = SceneBuilder()
    sb.add_mesh(make_plane(40.0, albedo=(0.5, 0.5, 0.5)), name="ground")
    rng = np.random.default_rng(0)
    for i in range(64):
        x, z = rng.uniform(-10, 10, 2)
        if i % 2:
            sb.add_mesh(make_cube(1.0, albedo=(0.7, 0.3, 0.2)),
                        position=(x, 0.5, z))
        else:
            sb.add_mesh(make_sphere(0.5, slices=8, stacks=8,
                                    albedo=(0.2, 0.4, 0.7)),
                        position=(x, 0.5, z))
    tilt = (np.sin(np.pi / 3), 0.0, 0.0, np.cos(np.pi / 3))
    sb.add_light("directional", rotation=tilt, intensity=2.0)
    look_down = (np.sin(np.pi / 8), 0.0, 0.0, np.cos(np.pi / 8))
    sb.add_camera("cam", position=(0, 8.0, -14.0), rotation=look_down)
    t = sb.build()
    st = graph.update_hierarchical_data(init_state(t, n_worlds), t)
    rt = build_render_template(t)

    def measure(tag, **kw):
        cfg = RenderConfig(width=size, height=size, shadows=True,
                           use_pallas=True,
                           cascade_tri_budget=(0.05, 1.0, 0.75),
                           bin_mode="cumsum", **kw)
        frame = jax.jit(lambda s: render_frame(s, t, rt, cfg)[0])
        color = frame(st)
        float(jnp.sum(color))
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            color = frame(st)
            float(jnp.sum(color))
            best = min(best, time.perf_counter() - t0)
        OUT[tag] = round(best / n_worlds * 1e3, 3)     # ms/frame/world
        print(json.dumps({tag: OUT[tag]}), flush=True)

    try:
        measure("render_k512", k_per_tile=512)
        measure("render_k424", k_per_tile=424)
        measure("render_k424_map192", k_per_tile=424,
                csm=shadows_mod.CsmConfig(map_size=192))
    except Exception as e:
        OUT["render_error"] = f"{type(e).__name__}: {e}"[:200]
        print(OUT["render_error"], flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    physics_ab()
    render_ab()
    print(json.dumps(OUT))
