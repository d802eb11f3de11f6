#!/bin/bash
# One TPU session: produce the round-3 bench artifacts in priority order.
# Run via: bash scripts/tpu_run.sh bash _tpu_artifacts.sh
set -x
cd /root/repo
# 1) render bench (new kernel) + driver-visible artifact
FYROX_BENCH_ROUND=03 timeout 580 python bench_render.py
# 2) render bench at W=64 (ms/frame/world target check; separate artifact)
FYROX_BENCH_ROUND=03_w64 FYROX_BENCH_RENDER_WORLDS=64 \
    timeout 580 python bench_render.py
# 3) W-scaling table + headline at best W
FYROX_BENCH_SCALING=1 FYROX_BENCH_CALLS=3 timeout 3500 python bench.py
