"""One serialized TPU session: verify drive + gather-precision profile.

Leg 1 (verify): import fyrox_tpu, build the flagship, jit ONE scan of 20
engine steps on the real TPU with FYROX_SOLVER_GATHER_PREC=split3, print
a scalar summary (finite => pipeline healthy end-to-end).

Leg 2 (profile): scripts/prof_physics_stages.py as subprocesses for
gather_prec in (default, split3) — decides the production default.

Results accumulate into scripts/TPU_SPLIT3.json.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "TPU_SPLIT3.json")
sys.path.insert(0, ROOT)

results = {}


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def leg1():
    env = dict(os.environ)
    env["FYROX_SOLVER_GATHER_PREC"] = "split3"
    code = r"""
import time
import jax, jax.numpy as jnp
from fyrox_tpu.models import build_flagship
engine, _ = build_flagship(n_bones=8, n_verts=256, n_bodies=1000)
st = engine.init_state(num_worlds=8)
@jax.jit
def drive(s):
    def body(s, _):
        return engine.step(s), None
    return jax.lax.scan(body, s, None, length=20)[0]
t0 = time.time()
st = drive(st)
p = float(jnp.sum(st.physics.position))
v = float(jnp.max(jnp.abs(st.physics.linvel)))
print(f"VERIFY pos_sum={p:.3f} max|v|={v:.3f} "
      f"finite={p == p and v == v} secs={time.time()-t0:.1f}")
"""
    t0 = time.time()
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT,
                         capture_output=True, text=True, timeout=900)
    tail = res.stdout.strip().splitlines()
    results["verify_split3"] = {
        "rc": res.returncode, "seconds": round(time.time() - t0, 1),
        "last_line": tail[-1] if tail else "",
        "stderr_tail": res.stderr[-500:]}
    print(f"[verify] rc={res.returncode} "
          f"{results['verify_split3']['last_line']}", flush=True)
    save()


def leg2():
    for prec in ("default", "split3"):
        env = dict(os.environ)
        env["FYROX_SOLVER_GATHER_PREC"] = prec
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, os.path.join(HERE,
                                              "prof_physics_stages.py")],
                env=env, cwd=ROOT, capture_output=True, text=True,
                timeout=1800)
            tail = res.stdout.strip().splitlines()
            results[f"prof_{prec}"] = {
                "rc": res.returncode,
                "seconds": round(time.time() - t0, 1),
                "last_line": tail[-1] if tail else "",
                "stderr_tail": res.stderr[-500:]}
        except subprocess.TimeoutExpired:
            results[f"prof_{prec}"] = {"rc": "timeout"}
        print(f"[prof_{prec}] {results[f'prof_{prec}'].get('last_line', 'TIMEOUT')}",
              flush=True)
        save()


if __name__ == "__main__":
    leg1()
    leg2()
    print("DONE")
