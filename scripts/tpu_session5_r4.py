"""Round-4 TPU session 5: merged-selfcast solver + final artifacts.

  1. prof_physics_stages with shipped defaults (wide+split3, selfcast
     merged into the wide dot) — expects solver < 4.04 ms.
  2. bench.py headline with shipped defaults.
  3. bench.py FYROX_BENCH_SCALING=1 → refresh BENCH_scaling.json.

Results accumulate into scripts/TPU_SESSION5_r4.json.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SESSION5_r4.json")
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


if __name__ == "__main__":
    run("prof_defaults",
        [sys.executable, os.path.join(HERE, "prof_physics_stages.py")])
    run("bench_headline", [sys.executable, os.path.join(ROOT, "bench.py")])
    run("bench_scaling", [sys.executable, os.path.join(ROOT, "bench.py")],
        env_extra={"FYROX_BENCH_SCALING": "1"})
    print("DONE")
