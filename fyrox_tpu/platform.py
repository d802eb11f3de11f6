"""Platform guard: survive TPU (axon tunnel) outages in every entry point.

This machine's ``sitecustomize`` registers the axon TPU plugin at interpreter
start and sets ``jax.config.jax_platforms = "axon,cpu"`` *before* any user
code runs.  When the tunnel is down, the first call that initializes the
backend either raises ``RuntimeError`` or **hangs indefinitely** (the
connection blocks inside the plugin, uninterruptible by signals from Python).
The only reliable probe is therefore a *killable subprocess* with a hard
timeout — never ``jax.devices()`` in the calling process.

Public API (all safe to call before any JAX backend touch):

    probe_tpu(timeout)     -> bool   subprocess probe; never hangs
    platform_guard(...)    -> str    "tpu" | "cpu"; forces the CPU platform
                                     via jax.config.update when the TPU is
                                     unhealthy (or FYROX_FORCE_CPU is set)
    run_benchmark_guarded(...)       parent-side bench orchestration:
                                     probe with retries (riding out the
                                     ~5-minute tunnel re-setup window), run
                                     the bench as a killable child, and on
                                     ultimate failure print ONE honest JSON
                                     skip line instead of a stack trace.

Reference behavior being guarded: the driver contract captures bench.py's
last stdout line into BENCH_r{N}.json and runs __graft_entry__ entry points
under a wall-clock timeout; round 3 lost both artifacts to tunnel churn
(BENCH_r03.json rc=1, MULTICHIP_r03.json rc=124).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_PROBE_CODE = (
    "import jax\n"
    "jax.config.update('jax_platforms', 'axon')\n"
    "import jax.numpy as jnp\n"
    "x = jnp.ones((128, 128), jnp.bfloat16)\n"
    "print(float((x @ x).sum()))\n"
)


def probe_tpu(timeout: float = 75.0) -> bool:
    """Run a tiny matmul on the TPU in a killable subprocess.

    Returns True iff the program completed within ``timeout`` seconds and
    produced the expected value. Never raises, never hangs.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("FYROX_BENCH_CHILD", None)
    try:
        res = subprocess.run([sys.executable, "-c", _PROBE_CODE], env=env,
                             capture_output=True, text=True, timeout=timeout)
    except (subprocess.TimeoutExpired, OSError):
        return False
    if res.returncode != 0:
        return False
    try:
        return abs(float(res.stdout.strip().splitlines()[-1]) - 128.0 ** 3) < 1.0
    except (ValueError, IndexError):
        return False


def platform_guard(prefer_tpu: bool = True, probe_timeout: float = 75.0) -> str:
    """Pick a safe JAX platform BEFORE the backend is initialized.

    If the TPU probe fails (or ``FYROX_FORCE_CPU`` is set, or
    ``prefer_tpu=False``), pin the process to the CPU platform via
    ``jax.config.update`` — env vars alone cannot override sitecustomize's
    ``jax_platforms="axon,cpu"``, which hangs on backend init when the
    tunnel is down.

    Returns the chosen platform name ("tpu" or "cpu"). Must be called
    before any jax array/device operation in this process.
    """
    import jax

    if not prefer_tpu or os.environ.get("FYROX_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    if probe_tpu(timeout=probe_timeout):
        # Leave "axon,cpu" so a mid-run tunnel death degrades rather than
        # wedging config; callers needing hard guarantees use subprocesses.
        return "tpu"
    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def _emit(line: dict) -> None:
    sys.stdout.write(json.dumps(line) + "\n")
    sys.stdout.flush()


def run_benchmark_guarded(script_path: str, metric: str, unit: str,
                          require_tpu: bool = True) -> None:
    """Parent-side orchestration for bench.py / bench_render.py.

    1. Probe the TPU in a killable subprocess, retrying with backoff to ride
       out the ~5-minute tunnel re-setup window after client churn.
    2. Re-exec ``script_path`` as a child with FYROX_BENCH_CHILD=1 under a
       hard timeout; relay its stdout (the JSON line) verbatim.
    3. On ultimate failure print ONE honest JSON line
       ``{"metric": ..., "value": null, "skipped": "tpu-unavailable", ...}``
       so the driver's artifact always parses.

    Env knobs: FYROX_BENCH_PROBE_ATTEMPTS (3), FYROX_BENCH_PROBE_TIMEOUT (75),
    FYROX_BENCH_PROBE_BACKOFF (75), FYROX_BENCH_TIMEOUT (1500),
    FYROX_BENCH_RUN_ATTEMPTS (2), FYROX_BENCH_ALLOW_CPU (off).
    """
    attempts = int(os.environ.get("FYROX_BENCH_PROBE_ATTEMPTS", 3))
    probe_timeout = float(os.environ.get("FYROX_BENCH_PROBE_TIMEOUT", 75))
    backoff = float(os.environ.get("FYROX_BENCH_PROBE_BACKOFF", 75))
    run_timeout = float(os.environ.get("FYROX_BENCH_TIMEOUT", 1500))
    run_attempts = int(os.environ.get("FYROX_BENCH_RUN_ATTEMPTS", 2))
    allow_cpu = bool(os.environ.get("FYROX_BENCH_ALLOW_CPU"))

    tpu_ok = False
    if require_tpu or not allow_cpu:
        for i in range(attempts):
            if probe_tpu(timeout=probe_timeout):
                tpu_ok = True
                break
            sys.stderr.write(f"[bench-guard] TPU probe {i + 1}/{attempts} "
                             f"failed; backoff {backoff:.0f}s\n")
            if i + 1 < attempts:
                time.sleep(backoff)

    if not tpu_ok and not allow_cpu:
        _emit({"metric": metric, "value": None, "unit": unit,
               "vs_baseline": None, "skipped": "tpu-unavailable",
               "detail": f"axon tunnel probe failed {attempts}x "
                         f"(timeout {probe_timeout:.0f}s, backoff "
                         f"{backoff:.0f}s); see ROADMAP 'axon tunnel "
                         f"discipline'"})
        return

    env = dict(os.environ)
    env["FYROX_BENCH_CHILD"] = "1"
    if not tpu_ok:                       # CPU fallback explicitly requested
        env["JAX_PLATFORMS"] = "cpu"
        env["FYROX_FORCE_CPU"] = "1"
    last_err = ""
    for i in range(run_attempts):
        try:
            res = subprocess.run([sys.executable, script_path], env=env,
                                 cwd=os.path.dirname(os.path.abspath(script_path)),
                                 capture_output=True, text=True,
                                 timeout=run_timeout)
        except subprocess.TimeoutExpired as e:
            last_err = f"bench child timed out after {run_timeout:.0f}s"
            sys.stderr.write(f"[bench-guard] attempt {i + 1}: {last_err}\n")
            tail = (e.stderr or b"")
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            sys.stderr.write(tail[-2000:] + "\n")
            continue
        sys.stderr.write(res.stderr[-4000:])
        if res.returncode == 0 and res.stdout.strip():
            sys.stdout.write(res.stdout)
            sys.stdout.flush()
            return
        last_err = f"bench child rc={res.returncode}"
        sys.stderr.write(f"[bench-guard] attempt {i + 1}: {last_err}\n")
        if i + 1 < run_attempts and probe_tpu(timeout=probe_timeout):
            continue                     # tunnel still healthy: real bug? retry once
    _emit({"metric": metric, "value": None, "unit": unit,
           "vs_baseline": None, "skipped": "bench-failed",
           "detail": last_err})
