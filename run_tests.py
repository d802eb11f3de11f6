#!/usr/bin/env python
"""Chunked test runner: full suite inside a 10-minute-per-invocation cap.

The complete suite no longer fits one pytest invocation inside a
10-minute window on a 1-CPU image (the oracle/slab trajectory tests
alone take minutes each). This runner splits tests/ into file chunks,
runs each chunk as its own pytest process, and fails if any chunk fails.

Usage:
    python run_tests.py            # everything, chunked (CI entrypoint)
    python run_tests.py --fast     # skip @pytest.mark.slow tests
    python run_tests.py --chunks 6 # override chunk count

Each chunk is balanced by measured weight (the heavy files are listed in
HEAVY below and spread across chunks).
"""
import argparse
import glob
import os
import subprocess
import sys
import time

# measured-slow files (minutes each on 1 CPU) — spread one per chunk
HEAVY = [
    "test_oracle.py",
    "test_slab.py",
    "test_physics.py",
    "test_scenery.py",
    "test_joints.py",
    "test_convex.py",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--fast", action="store_true",
                    help='run with -m "not slow"')
    ap.add_argument("--list", action="store_true",
                    help="print the chunk layout and exit")
    args, extra = ap.parse_known_args()
    args.extra = extra

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(here, "tests", "test_*.py")))
    heavy = [f for f in HEAVY if f in files]
    light = [f for f in files if f not in heavy]
    n = max(args.chunks, len(heavy)) if heavy else args.chunks
    chunks = [[] for _ in range(n)]
    for i, f in enumerate(heavy):
        chunks[i % n].append(f)
    for i, f in enumerate(light):
        chunks[(len(heavy) + i) % n].append(f)
    chunks = [c for c in chunks if c]
    if args.list:
        for i, c in enumerate(chunks):
            print(f"chunk {i + 1}: {' '.join(c)}")
        return

    rc = 0
    t_all = time.time()
    for i, chunk in enumerate(chunks):
        cmd = [sys.executable, "-m", "pytest", "-q"] + \
            [os.path.join("tests", f) for f in chunk] + args.extra
        if args.fast:
            cmd += ["-m", "not slow"]
        t0 = time.time()
        print(f"[chunk {i + 1}/{len(chunks)}] {' '.join(chunk)}", flush=True)
        r = subprocess.run(cmd, cwd=here)
        print(f"[chunk {i + 1}] rc={r.returncode} "
              f"({time.time() - t0:.0f}s)", flush=True)
        # pytest rc 5 = "no tests collected" (a -k/-m filter can empty a
        # whole chunk) — not a failure
        rc = rc or (0 if r.returncode == 5 else r.returncode)
    print(f"total: {time.time() - t_all:.0f}s rc={rc}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
