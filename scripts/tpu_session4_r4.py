"""Round-4 TPU session 4: final artifacts with the shipped defaults.

  1. bench.py FYROX_BENCH_SCALING=1 — W-sweep (32..512) with the new
     solver defaults (wide + split3); refreshes BENCH_scaling.json.
  2. bench_render.py — refreshes BENCH_render_r04.json (per-cascade
     pre-cull budgets, vpu edge mode).
  3. bench_render binmode=cumsum A/B (last open render knob).

Results accumulate into scripts/TPU_SESSION4_r4.json.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SESSION4_r4.json")
sys.path.insert(0, ROOT)

results = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def run(name, cmd, env_extra=None, timeout=2400):
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
    run("bench_scaling", [sys.executable, os.path.join(ROOT, "bench.py")],
        env_extra={"FYROX_BENCH_SCALING": "1"})
    run("bench_render_r04",
        [sys.executable, os.path.join(ROOT, "bench_render.py")],
        env_extra={"FYROX_BENCH_ROUND": "04"})
    run("bench_render_cumsum",
        [sys.executable, os.path.join(ROOT, "bench_render.py")],
        env_extra={"FYROX_BENCH_RENDER_BINMODE": "cumsum"})
    print("DONE")


if __name__ == "__main__":
    main()
