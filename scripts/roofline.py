"""Roofline table for the flagship physics step (VERDICT r4 #1).

Derives per-stage FLOP and HBM-byte counts from the flagship template's
actual shapes (not guesses), compares each stage against v5e peaks, and
writes scripts/ROOFLINE.md. Measured stage times come from the committed
loop-timed profile (scripts/TPU_SESSION5_r4.json, W=32) so round-6 can
optimize against a ceiling instead of A/B roulette.

v5e public peaks (jax-ml.github.io/scaling-book numbers):
  MXU  bf16  197 TFLOP/s   (f32 via 3-pass split ~ 1/3 of that)
  VPU  f32   ~4  TFLOP/s   (8x128 lanes x 4 ALUs x ~1 GHz)
  HBM        819 GB/s
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_BF16 = 197e12
VPU_F32 = 4e12
HBM = 819e9


def main():
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fyrox_tpu.models import build_flagship
    from fyrox_tpu.physics import slab2
    from fyrox_tpu.physics.pallas_ops import pad_to

    eng, _ = build_flagship(n_bones=100, n_verts=50_000, n_bodies=1000)
    t = eng.physics
    cx = slab2._ctx(t)
    sc = t.grid
    w = 32                                    # the profiled config
    b, c, cg, s = cx.b, cx.c, cx.cg, cx.s_active
    bp, cpp, cgp = pad_to(b, 128), pad_to(c, 128), pad_to(cg, 128)
    n_hi = cpp // 128
    nslots = [sc.nslot(k) for k in range(3)]
    npts = (1, 2, 4)
    ns = sum(nslots)
    wd = sum(n * p for n, p in zip(nslots, npts))
    s_walk = sc.s_walk
    f4 = 4

    stages = []

    def add(name, flops_mxu, flops_vpu, hbm_bytes, measured_ms, note):
        t_mxu = flops_mxu / MXU_BF16 * 1e3
        t_vpu = flops_vpu / VPU_F32 * 1e3
        t_hbm = hbm_bytes / HBM * 1e3
        floor = max(t_mxu, t_vpu, t_hbm)
        stages.append(dict(
            stage=name, mxu_gflop=flops_mxu / 1e9, vpu_gflop=flops_vpu / 1e9,
            hbm_mb=hbm_bytes / 1e6, t_mxu_ms=t_mxu, t_vpu_ms=t_vpu,
            t_hbm_ms=t_hbm, floor_ms=floor, measured_ms=measured_ms,
            headroom=(measured_ms / floor if floor > 0 else float("inf")),
            note=note))

    # ---- pose + AABB (XLA elementwise) ----
    add("pose+aabb",
        0.0,
        w * c * 260.0,                       # quat mul/rotate + fat AABB
        w * (b * 13 + c * 34) * f4 * 2,      # body planes in, cpos/aabb out
        1.3,
        "pure VPU/elementwise; HBM round trip of pose+aabb planes")

    # ---- broadphase rank + walk ----
    # rank: XLA row argsort over [W, Cg] per axis (comparator network),
    # walk: [W, Cg, s_walk] candidate compares
    add("broadphase",
        0.0,
        w * (cg * np.log2(max(cg, 2)) * 32 + cg * s_walk * 24),
        w * (cg * s_walk * 3) * f4 * 2,      # walk windows written+read
        3.9,
        "argsort comparator + column walk; intermediates [W,Cg,s_walk]")

    # ---- narrowphase (staged XLA): one-hot MXU gathers + manifolds ----
    # one wide dot per class: [n_hi*20, 128] @ [128, nsl*cg]
    gather_flops = sum(
        2 * (n_hi * 20) * 128 * (nsl * cg) for nsl in nslots if nsl)
    add("narrowphase",
        w * gather_flops,
        w * wd * cg * 500.0,                 # np_planes manifold math
        w * (wd * cg * 14) * f4 * 2,         # window planes HBM round trip
        3.9,
        "j-gather one-hot dots (MXU) + manifolds; windows hit HBM twice")

    # ---- compaction (staged XLA) ----
    add("compaction",
        w * 2 * wd * wd * 2 * cg,            # tril cumsum dot
        w * s * 14 * wd * cg * 3.0,          # per-slot masked sums
        w * (wd * cg * 14 + s * cg * 15) * f4,
        1.9,
        "two-tier cumsum + slot selection; reads windows, writes [S,Cg]")

    # ---- solver (Pallas kernel, resident) ----
    # per substep x pgs: rel_vel gather (A=6) + scatter (A=6) wide dots
    n_inner = t.n_substeps * (t.n_pgs + 2)   # pgs + warm + restitution-ish
    # rel_vel/scatter wide dot: [n_hi*6, 128] @ [128, s*cg + cg]
    solver_dot = 2 * (n_hi * 6) * 128 * (s * cg + cg)
    add("solver kernel",
        w * n_inner * solver_dot * 3,        # split3 = 3 bf16 passes
        w * n_inner * s * cg * 200.0,
        w * ((15 + 3) * s * cg + 29 * bp) * f4 * 2,
        4.1,
        "in-VMEM TGS; HBM only at kernel entry/exit")

    total_meas = sum(st["measured_ms"] for st in stages)
    total_floor = sum(st["floor_ms"] for st in stages)

    lines = [
        "# Flagship physics-step roofline (v5e, W=32, 1k bodies)",
        "",
        f"Shapes: B={b} (pad {bp}), C={c} (pad {cpp}), Cg={cg} (pad {cgp}),"
        f" s_active={s}, nslots={nslots}, window rows={wd},"
        f" s_walk={s_walk}, n_hi={n_hi}.",
        "",
        "Peaks: MXU bf16 197 TFLOP/s, VPU f32 ~4 TFLOP/s, HBM 819 GB/s.",
        "Measured column: loop-timed stage profile,"
        " scripts/TPU_SESSION5_r4.json (W=32).",
        "",
        "| stage | MXU GFLOP | VPU GFLOP | HBM MB | t_mxu | t_vpu | t_hbm |"
        " floor ms | measured ms | headroom |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for st in stages:
        lines.append(
            f"| {st['stage']} | {st['mxu_gflop']:.2f} | {st['vpu_gflop']:.2f}"
            f" | {st['hbm_mb']:.1f} | {st['t_mxu_ms']:.3f}"
            f" | {st['t_vpu_ms']:.3f} | {st['t_hbm_ms']:.3f}"
            f" | {st['floor_ms']:.3f} | {st['measured_ms']:.1f}"
            f" | {st['headroom']:.0f}x |")
    lines += [
        "",
        f"Stage-sum measured: {total_meas:.1f} ms (fused step measured"
        " 10.1 ms — stages overlap under XLA fusion); roofline floor sum:"
        f" {total_floor:.2f} ms.",
        "",
        "## Reading",
        "",
        "- Every stage sits 10-100x above its compute/bandwidth floor:",
        "  the step is LATENCY/OVERHEAD bound (many small kernels, VPU",
        "  broadcast chains, layout changes), not roofline bound. That is",
        "  why per-stage micro-A/Bs plateaued (+-1%) in rounds 4-5.",
        "- The narrowphase windows' HBM round trip"
        f" ({stages[2]['hbm_mb']:.0f} MB at W=32) costs"
        f" ~{stages[2]['t_hbm_ms']:.2f} ms of pure bandwidth — the fused",
        "  narrow+compact kernel (physics/pallas_step.py) removes it;",
        "  the remaining gap is dispatch+VPU count, which only a resident",
        "  program (fewer, larger kernels) addresses.",
        "- To reach 10k env-steps/s/chip at W=128, the full step must",
        "  cost <= 12.8 ms per 128 worlds = ~0.1 ms/world-step; the",
        "  roofline floor per world-step is ~0.01 ms — the hardware",
        "  allows 10k (and the 125k north star within ~8x of floor);",
        "  the gap is entirely program structure.",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.md")
    open(out, "w").write("\n".join(lines) + "\n")
    print(json.dumps(dict(stages=[{k: (round(v, 3)
                                       if isinstance(v, float) else v)
                                   for k, v in st.items()} for st in stages],
                          floor_ms=round(total_floor, 3))))
    print("wrote", out)


if __name__ == "__main__":
    main()
