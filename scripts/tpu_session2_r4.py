"""Round-4 TPU session 2: solver gather-precision sweep + benches.

One serialized tunnel session (ROADMAP engineering discipline):

  1. prof_physics_stages for FYROX_SOLVER_GATHER_PREC in
     (default, split3, split2, highest) — loop-timed, transfer-free.
  2. bench.py with the fastest precision whose accuracy class is exact
     (default/split3/highest; split2 reported but never auto-picked).
  3. bench_render.py with the measured per-cascade pre-cull budgets.

Results accumulate into scripts/TPU_SESSION2_r4.json as they land.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SESSION2_r4.json")
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
    for prec in ("default", "split3", "split2", "highest"):
        run(f"prof_{prec}",
            [sys.executable, os.path.join(HERE, "prof_physics_stages.py")],
            env_extra={"FYROX_SOLVER_GATHER_PREC": prec})
        try:
            d = json.loads(results[f"prof_{prec}"]["last_line"])
            solver_ms[prec] = d["solver_ms"]
        except Exception:
            pass
    results["solver_ms_by_prec"] = solver_ms
    save()

    exact = {p: v for p, v in solver_ms.items()
             if p in ("default", "split3", "highest")}
    best = min(exact, key=exact.get) if exact else "default"
    results["picked_prec"] = best
    save()
    run("bench_headline", [sys.executable, os.path.join(ROOT, "bench.py")],
        env_extra={"FYROX_SOLVER_GATHER_PREC": best})
    run("bench_render",
        [sys.executable, os.path.join(ROOT, "bench_render.py")],
        env_extra={"FYROX_BENCH_ROUND": "04b"})
    run("bench_render_w64",
        [sys.executable, os.path.join(ROOT, "bench_render.py")],
        env_extra={"FYROX_BENCH_RENDER_WORLDS": "64"})
    print("DONE")


if __name__ == "__main__":
    main()
