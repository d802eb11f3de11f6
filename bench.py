"""Headline benchmark: env·steps/sec/chip on the flagship world.

Config (BASELINE.json): animated skinned character (100 bones / 50k verts,
ABSM-blended clips) + rigid-body pile + scene-graph propagation per world,
batched over as many worlds as fit. North star: >= 1M env·steps/sec on a
v5e-8 (= 125k/chip); vs_baseline is measured against the per-chip share.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env overrides: FYROX_BENCH_WORLDS, FYROX_BENCH_BODIES, FYROX_BENCH_VERTS,
FYROX_BENCH_BONES, FYROX_BENCH_STEPS.

FYROX_BENCH_SCALING=1 additionally sweeps W (32..512) and writes the
per-chip W-scaling table to BENCH_scaling.json (one compile + timed roll
per W; the headline line still prints last, at the best-throughput W).
"""
import json
import os
import time


def _measure_sharded(engine, n_worlds, steps_per_call, n_calls, devices):
    """Multi-chip path: shard the world axis over the device mesh
    (parallel/mesh.py shard_map rollout; psum metrics are the only
    collective). Returns per-CHIP env·steps/s."""
    import time as _time

    import jax
    from fyrox_tpu.parallel import (make_sharded_rollout, shard_state,
                                    world_mesh)

    nd = len(devices)
    n_worlds = max(n_worlds // nd, 1) * nd
    mesh = world_mesh(devices)
    state = engine.init_state(num_worlds=n_worlds)
    state = shard_state(state, mesh)
    roll = make_sharded_rollout(engine, mesh, num_steps=steps_per_call)
    state, m = roll(state)
    float(m["total_worlds"])                       # hard sync
    t0 = _time.perf_counter()
    for _ in range(n_calls):
        state, m = roll(state)
    float(m["mean_body_speed"])                    # hard sync
    elapsed = _time.perf_counter() - t0
    return n_worlds * steps_per_call * n_calls / elapsed / nd


def _measure(engine, skin, n_worlds, steps_per_call, n_calls):
    import jax
    import jax.numpy as jnp
    from fyrox_tpu.animation import skinning

    devices = jax.devices()
    if len(devices) > 1:
        # sharded headline when real multi-chip hardware shows up
        return _measure_sharded(engine, n_worlds, steps_per_call, n_calls,
                                devices)

    state = engine.init_state(num_worlds=n_worlds)
    params = jnp.zeros((n_worlds, 1), bool)

    @jax.jit
    def roll(state):
        def body(s, _):
            return engine.step(s, machine_params=params), None
        state, _ = jax.lax.scan(body, state, None, length=steps_per_call)
        bm = skinning.bone_matrices(state.scene.globals_, skin)
        verts = skinning.skin_positions_dense(bm, skin, precision="default")
        return state, jnp.sum(verts[..., 0])  # force materialization

    state, chk = roll(state)           # compile
    float(chk)   # hard sync: host-transfer (block_until_ready can return
                 # early through the axon tunnel)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, chk = roll(state)
    float(chk)   # hard sync
    elapsed = time.perf_counter() - t0
    return n_worlds * steps_per_call * n_calls / elapsed


def main():
    if os.environ.get("FYROX_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    from fyrox_tpu.models import build_flagship

    # Defaults are the BASELINE.json flagship config: 1k-body pile (the
    # honest headline — round 1 benched a 16x easier 64-body config).
    n_worlds = int(os.environ.get("FYROX_BENCH_WORLDS", 128))
    n_bodies = int(os.environ.get("FYROX_BENCH_BODIES", 1000))
    n_verts = int(os.environ.get("FYROX_BENCH_VERTS", 50_000))
    n_bones = int(os.environ.get("FYROX_BENCH_BONES", 100))
    steps_per_call = int(os.environ.get("FYROX_BENCH_STEPS", 20))
    n_calls = max(int(os.environ.get("FYROX_BENCH_CALLS", 5)), 1)

    engine, skin = build_flagship(n_bones=n_bones, n_verts=n_verts,
                                  n_bodies=n_bodies)
    baseline_per_chip = 125_000.0  # 1M on v5e-8 → per-chip share

    if os.environ.get("FYROX_BENCH_SCALING"):
        table = []
        for w in (32, 64, 128, 256, 512):
            v = _measure(engine, skin, w, steps_per_call, n_calls)
            table.append({"worlds": w,
                          "env_steps_per_sec_per_chip": round(v, 1)})
        best = max(table, key=lambda r: r["env_steps_per_sec_per_chip"])
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_scaling.json"), "w") as f:
            json.dump({"config": f"{n_bodies}-body pile, {n_bones} bones/"
                                 f"{n_verts} verts skinned",
                       "table": table}, f, indent=1)
        n_worlds = best["worlds"]
        value = best["env_steps_per_sec_per_chip"]
    else:
        value = _measure(engine, skin, n_worlds, steps_per_call, n_calls)

    import jax as _jax
    nd = len(_jax.devices())
    out = {
        "metric": f"env_steps_per_sec_per_chip (W={n_worlds}, {n_bones} bones/"
                  f"{n_verts} verts skinned, {n_bodies}-body pile)",
        "value": round(value, 1),
        "unit": "env·steps/s/chip",
        "vs_baseline": round(value / baseline_per_chip, 4),
    }
    if nd > 1:
        out["n_devices"] = nd       # sharded rollout (parallel/mesh.py)
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("FYROX_BENCH_CHILD"):
        main()
    else:
        # Parent-side guard: probe the axon tunnel in a killable subprocess
        # (it HANGS uninterruptibly when down), run the bench as a child
        # under a hard timeout, and on ultimate failure print one honest
        # JSON skip line so the driver artifact always parses.
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fyrox_tpu.platform import run_benchmark_guarded
        run_benchmark_guarded(os.path.abspath(__file__),
                              metric="env_steps_per_sec_per_chip",
                              unit="env·steps/s/chip")
