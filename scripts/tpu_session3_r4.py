"""Round-4 TPU session 3: solver gather-mode A/B + render A/Bs.

  1. prof_physics_stages for GATHER_MODE in (select, wide, premask),
     all at GATHER_PREC=split3 (session-2 winner).
  2. bench.py with the winning (mode, prec).
  3. bench_render edge_mode vpu-vs-mxu at W=16, then W=64 with the
     winning edge mode (round target shape).

Results accumulate into scripts/TPU_SESSION3_r4.json.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SESSION3_r4.json")
sys.path.insert(0, ROOT)

results = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def run(name, cmd, env_extra=None, timeout=1800):
    env = dict(os.environ)
    env["FYROX_BENCH_CHILD"] = "1"
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
            "stderr_tail": res.stderr[-500:]}
    except subprocess.TimeoutExpired:
        results[name] = {"rc": "timeout", "seconds": timeout}
    print(f"[{name}] {results[name].get('last_line', 'TIMEOUT')}",
          flush=True)
    save()


def main():
    solver_ms = {}
    for mode in ("wide", "premask", "select"):
        run(f"prof_{mode}",
            [sys.executable, os.path.join(HERE, "prof_physics_stages.py")],
            env_extra={"FYROX_SOLVER_GATHER_PREC": "split3",
                       "FYROX_SOLVER_GATHER_MODE": mode})
        try:
            d = json.loads(results[f"prof_{mode}"]["last_line"])
            solver_ms[mode] = d["solver_ms"]
        except Exception:
            pass
    results["solver_ms_by_mode"] = solver_ms
    save()
    best = min(solver_ms, key=solver_ms.get) if solver_ms else "select"
    results["picked_mode"] = best
    save()
    run("bench_headline", [sys.executable, os.path.join(ROOT, "bench.py")],
        env_extra={"FYROX_SOLVER_GATHER_PREC": "split3",
                   "FYROX_SOLVER_GATHER_MODE": best})

    render_ms = {}
    for em in ("vpu", "mxu"):
        run(f"render_{em}",
            [sys.executable, os.path.join(ROOT, "bench_render.py")],
            env_extra={"FYROX_BENCH_RENDER_EDGEMODE": em})
        try:
            d = json.loads(results[f"render_{em}"]["last_line"])
            render_ms[em] = d["ms_per_frame_per_world"]
        except Exception:
            pass
    results["render_ms_by_edge_mode"] = render_ms
    save()
    best_em = min(render_ms, key=render_ms.get) if render_ms else "vpu"
    results["picked_edge_mode"] = best_em
    save()
    run("render_w64",
        [sys.executable, os.path.join(ROOT, "bench_render.py")],
        env_extra={"FYROX_BENCH_RENDER_EDGEMODE": best_em,
                   "FYROX_BENCH_RENDER_WORLDS": "64"})
    print("DONE")


if __name__ == "__main__":
    main()
