"""Round-5 TPU session 1: fused narrow+compact+solve kernel A/B +
demand stats + render A/Bs. ONE process, one JSON line per measurement,
flushed immediately (axon tunnel discipline — a mid-session crash keeps
earlier numbers). Run via scripts/tpu_run.sh.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(name, **kw):
    print(json.dumps({"name": name, **kw}), flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    emit("session", backend=jax.default_backend(),
         devices=len(jax.devices()))

    from fyrox_tpu.models import build_flagship
    eng, skin = build_flagship(n_bones=100, n_verts=50_000, n_bodies=1000)
    w = int(os.environ.get("FYROX_BENCH_WORLDS", 128))

    from fyrox_tpu.animation import skinning

    def measure_headline(env, steps=20, calls=4, worlds=None):
        """Fresh jit per env config (bench.py flow)."""
        ww = worlds or w
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        state = eng.init_state(num_worlds=ww)
        params = jnp.zeros((ww, 1), bool)

        @jax.jit
        def roll(state):
            def body(s, _):
                return eng.step(s, machine_params=params), None
            state, _ = jax.lax.scan(body, state, None, length=steps)
            bm = skinning.bone_matrices(state.scene.globals_, skin)
            verts = skinning.skin_positions_dense(bm, skin,
                                                  precision="default")
            return state, jnp.sum(verts[..., 0])

        state, chk = roll(state)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(calls):
            state, chk = roll(state)
        float(chk)
        dt_ = time.perf_counter() - t0
        return ww * steps * calls / dt_

    # A/B: staged default first (the provenance number), then the
    # fused kernel opt-in — probe at W=8 before committing the big
    # flagship compile (session-1 Mosaic remote-compile failure)
    probe_ok = {}
    for name, env, ww in (
            ("headline_staged_default", {"FYROX_FUSED_STEP": None}, None),
            # exact take-form pose gathers (new default) vs the bf16
            # one-hot dot form they replace (r5 pose-quantization fix)
            ("headline_pose_dot", {"FYROX_POSE_GATHER": "dot"}, None),
            ("headline_pose_take", {"FYROX_POSE_GATHER": None}, None),
            # split mode (=2): narrow+compact kernel -> solver kernel,
            # half the per-kernel program for the Mosaic AOT compiler
            # (the monolithic kernel's 62 MB MLIR crashed it at W=8)
            ("fused_split_probe_w8", {"FYROX_FUSED_STEP": "2"}, 8),
            ("headline_fused_split", {"FYROX_FUSED_STEP": "2"}, None),
            ("headline_staged_again", {"FYROX_FUSED_STEP": None}, None),
    ):
        try:
            if name == "headline_fused_split" and not probe_ok.get("s"):
                emit(name, skipped="probe failed")
                continue
            v = measure_headline(env, worlds=ww)
            emit(name, env_steps_per_sec_per_chip=round(v, 1))
            if name == "fused_split_probe_w8":
                probe_ok["s"] = True
        except Exception as e:  # noqa: BLE001 — record and continue
            emit(name, error=f"{type(e).__name__}: {e}"[:800])
    os.environ.pop("FYROX_FUSED_STEP", None)

    # ---- slab demand stats on a settled flagship state (sizes S and
    # the walk window for round-5 reduction work) ----
    try:
        from fyrox_tpu.physics import slab2
        t = eng.physics
        st = eng.init_state(num_worlds=8)
        params8 = jnp.zeros((8, 1), bool)

        @jax.jit
        def roll8(s):
            def body(x, _):
                return eng.step(x, machine_params=params8), None
            return jax.lax.scan(body, s, None, length=60)[0]

        st = roll8(st)
        st = roll8(st)          # 120 steps: settled
        ph = st.physics
        def mx(v):
            if isinstance(v, dict):
                return {k2: mx(v2) for k2, v2 in v.items()}
            if isinstance(v, (list, tuple)):
                return [mx(x) for x in v]
            return float(np.max(np.asarray(v)))
        dem = slab2.bp_demand_stats(t, ph)
        emit("bp_demand", **{k: mx(v) for k, v in dem.items()})
        ov = slab2.overflow_stats(t, ph)
        emit("overflow_stats", **{k: float(np.max(np.asarray(v)))
                                  for k, v in ov.items()})
    except Exception as e:  # noqa: BLE001
        emit("bp_demand", error=f"{type(e).__name__}: {e}"[:500])

    # ---- render A/Bs ----
    try:
        from fyrox_tpu.render import (RenderConfig, build_render_template,
                                      make_cube, make_plane, make_sphere,
                                      render_frame)
        from fyrox_tpu.scene import SceneBuilder, graph, init_state
        wr, size = 16, 256
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
        look = (np.sin(np.pi / 8), 0.0, 0.0, np.cos(np.pi / 8))
        sb.add_camera("cam", position=(0, 8.0, -14.0), rotation=look)
        ts = sb.build()
        sts = graph.update_hierarchical_data(init_state(ts, wr), ts)
        rts = build_render_template(ts)

        def rmeasure(name, env, **cfg_kw):
            for k, v in env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            cfg = RenderConfig(width=size, height=size,
                               shadows=cfg_kw.pop("shadows", True),
                               use_pallas=True,
                               cascade_tri_budget=cfg_kw.pop(
                                   "cascade_tri_budget", (0.05, 1.0, 0.75)),
                               k_per_tile=int(cfg_kw.pop("ktile", 424)),
                               csm_k_per_tile=int(cfg_kw.pop("csm_ktile",
                                                             896)),
                               bin_mode="cumsum", **cfg_kw)
            f = jax.jit(lambda s: render_frame(s, ts, rts, cfg)[0])
            out = f(sts)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(sts)
            float(jnp.sum(out))
            dt_ = (time.perf_counter() - t0) / 3
            emit(name, ms_per_frame_per_world=round(dt_ / wr * 1e3, 3))

        # Session-1 render numbers (13.56 best) are INVALID: the bin
        # audit later measured true cascade demand 801 > the 424 cap,
        # so those frames silently dropped shadow casters. Session 2:
        # valid-caps baseline first, then demand-reduction A/Bs.
        from fyrox_tpu.render.shadows import CsmConfig
        rmeasure("render_valid_base", {})               # csm_k 896
        rmeasure("render_noshadow", {}, shadows=False)  # camera floor
        rmeasure("render_csmk1024", {}, csm_ktile=1024)
        rmeasure("render_budget_tight", {},
                 cascade_tri_budget=(0.05, 0.6, 0.5), csm_ktile=896)
        rmeasure("render_map128_csmk2048", {},
                 csm=CsmConfig(map_size=128), csm_ktile=2048)
        rmeasure("render_unrolled_valid", {"FYROX_CSM_LAUNCH": "unrolled"})
        os.environ.pop("FYROX_CSM_LAUNCH", None)
    except Exception as e:  # noqa: BLE001
        emit("render", error=f"{type(e).__name__}: {e}"[:500])

    emit("session_done")


if __name__ == "__main__":
    main()
