"""Round-4 TPU measurement session — ONE script per tunnel session.

Axon tunnel discipline (ROADMAP engineering notes): batch every
measurement into a single serialized session instead of many short
clients. Runs, in order:

  1. headline bench (broadphase reuse ON, flagship defaults)
  2. reuse ablation (FYROX_SLAB_BP_PERIOD=1)
  3. W-scaling sweep (FYROX_BENCH_SCALING=1)
  4. render bench (writes BENCH_render_r04.json)
  5. occlusion on/off timing on the 65-mesh scene (pays-for-itself note)
  6. slab window demand stats on the settled 1k pile at period=4

Results accumulate into scripts/TPU_SESSION_r4.json as they land, so a
mid-session tunnel crash keeps everything measured so far.

Run: python scripts/tpu_session_r4.py   (probes the tunnel first; exits
early with a clear message when it is down)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SESSION_r4.json")
sys.path.insert(0, ROOT)

results = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def run(name, cmd, env_extra=None, timeout=1800):
    env = dict(os.environ)
    env["FYROX_BENCH_CHILD"] = "1"      # bench guards: we ARE the session
    env.update(env_extra or {})
    t0 = time.time()
    try:
        res = subprocess.run(cmd, env=env, cwd=ROOT, capture_output=True,
                             text=True, timeout=timeout)
        tail = res.stdout.strip().splitlines()
        results[name] = {
            "rc": res.returncode,
            "seconds": round(time.time() - t0, 1),
            "last_line": tail[-1] if tail else "",
            "stderr_tail": res.stderr[-800:],
        }
        print(f"[{name}] rc={res.returncode} "
              f"{results[name]['last_line']}", flush=True)
    except subprocess.TimeoutExpired:
        results[name] = {"rc": "timeout", "seconds": timeout}
        print(f"[{name}] TIMEOUT", flush=True)
    save()


def main():
    from fyrox_tpu.platform import probe_tpu
    for attempt in range(4):
        if probe_tpu(timeout=120):
            break
        print(f"probe {attempt + 1}/4 failed; waiting 90s", flush=True)
        time.sleep(90)
    else:
        print("TPU tunnel down — aborting session (run again later)")
        results["probe"] = "tpu-unavailable"
        save()
        return 1
    results["probe"] = "ok"
    save()

    py = sys.executable
    run("bench_reuse_on", [py, "bench.py"])
    run("bench_reuse_off", [py, "bench.py"],
        {"FYROX_SLAB_BP_PERIOD": "1"})
    # solver work scales with the s_active compaction window — A/B a
    # tighter window (valid only if slab_demand_1k shows active demand
    # fits; check that result before trusting this number)
    run("bench_active10", [py, "bench.py"], {"FYROX_SLAB_ACTIVE": "10"})
    run("bench_period8", [py, "bench.py"], {"FYROX_SLAB_BP_PERIOD": "8"})
    run("bench_scaling", [py, "bench.py"],
        {"FYROX_BENCH_SCALING": "1"}, timeout=3000)
    run("bench_render", [py, "bench_render.py"],
        {"FYROX_BENCH_ROUND": "04"})
    run("bench_render_precull", [py, "bench_render.py"],
        {"FYROX_BENCH_RENDER_PRECULL": "0.4"})
    run("render_occlusion_ablation", [py, "-c", _OCC_SNIPPET], timeout=1200)
    run("slab_demand_1k", [py, "-c", _DEMAND_SNIPPET], timeout=1800)
    print("session complete ->", OUT)
    return 0


_OCC_SNIPPET = r"""
import json, time
import numpy as np, jax, jax.numpy as jnp
from fyrox_tpu.render import (RenderConfig, build_render_template, make_cube,
                              make_plane, make_sphere, render_frame)
from fyrox_tpu.scene import SceneBuilder, graph, init_state
sb = SceneBuilder()
sb.add_mesh(make_plane(40.0), name="ground")
rng = np.random.default_rng(0)
for i in range(64):
    x, z = rng.uniform(-10, 10, 2)
    m = make_cube(1.0) if i % 2 else make_sphere(0.5, slices=8, stacks=8)
    sb.add_mesh(m, position=(x, 0.5, z))
tilt = (np.sin(np.pi/3), 0.0, 0.0, np.cos(np.pi/3))
sb.add_light("directional", rotation=tilt)
sb.add_camera("cam", position=(0, 8.0, -14.0),
              rotation=(np.sin(np.pi/8), 0, 0, np.cos(np.pi/8)))
t = sb.build()
st = graph.update_hierarchical_data(init_state(t, 8), t)
rt = build_render_template(t)
out = {}
for occ in (False, True):
    cfg = RenderConfig(width=256, height=256, shadows=True, use_pallas=True,
                       occlusion=occ)
    f = jax.jit(lambda s: render_frame(s, t, rt, cfg)[0])
    c = f(st); float(jnp.sum(c))
    ts = []
    for _ in range(3):
        t0 = time.time(); c = f(st); float(jnp.sum(c)); ts.append(time.time()-t0)
    out["occ_on" if occ else "occ_off"] = round(min(ts)/8*1e3, 3)
print(json.dumps(out))
"""

_DEMAND_SNIPPET = r"""
import json
import numpy as np, jax, jax.numpy as jnp
from fyrox_tpu.models import build_flagship
from fyrox_tpu.physics import slab2
engine, _ = build_flagship(n_bones=8, n_verts=256, n_bodies=1000)
st = engine.init_state(num_worlds=4)
@jax.jit
def roll(s):
    def body(s, _):
        return engine.step(s), None
    return jax.lax.scan(body, s, None, length=120)[0]
st = roll(st)
stats = slab2.bp_demand_stats(engine.physics, st.physics, period=4)
ov = slab2.overflow_stats(engine.physics, st.physics)
print(json.dumps({"demand": stats, "active": ov}))
"""


if __name__ == "__main__":
    raise SystemExit(main())
