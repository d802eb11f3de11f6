"""Fused narrowphase + compaction + TGS solve: ONE resident Pallas
program per world (grid=(W,)).

Round-4 stage profile (W=32, v5e): broadphase 3.9 / narrowphase 3.9 /
compaction 1.9 / solver 4.0 ms. The solver already ran resident in VMEM
(pallas_solver.py); narrowphase and compaction still materialized every
[W,Cg,Wd]-window plane through HBM between XLA ops — ~58 MB/world for
the compaction one-hot alone. This kernel extends the resident program
upstream: candidate windows enter as ONE [Wd_rows, Cg] int tensor
(j_real, −1 = invalid), the per-class manifolds (np_planes — pure
elementwise, reused verbatim in-kernel), the two-tier active-point
compaction and the warmstart pid matching all happen in VMEM, and the
solve (pallas_solver.solve_planes) continues in the same kernel.
Windows and manifolds never touch HBM.

Everything derivable from static tables rides the j-gather instead of
being passed in: body_j = col_body[j_real], kind_j = kinds[j_real],
swap/pid from kind/index compares — so the broadphase→kernel boundary
is a single int32 tensor per step.

Scope (supports_fused): primitive shape classes incl. big halfspace
partners; scenes with convex hulls, trimesh/heightfield scenery, COM
offsets or joints take the XLA path. Same rapier parameter mapping as
the XLA path (fyrox-impl/src/scene/graph/physics/mod.rs:892-908);
equivalence tests run this kernel in interpreter mode against the
unfused XLA stages (tests/test_pallas_step.py).

Layouts in-kernel (per world):
  candidate rows  [NS, Cg]    NS = Σ_cls nslot_cls; lane = grid collider
  window planes   [Wd, Cg]    Wd = Σ_cls nslot_cls·npts_cls, same
                              point-major row order as the XLA
                              _narrowphase_windows concat
  contact planes  [S, Cg]     compacted; identical to pallas_solver
  body planes     [A, Bp]
Compaction cumsums run as one strict-lower-triangular [Wd,Wd] MXU dot
(0/1 values, f32 accumulation — exact); the per-slot selection is S
masked sublane reductions per attribute.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fyrox_tpu.physics import np_planes
from fyrox_tpu.physics import pallas_solver as _ps
from fyrox_tpu.physics.broadphase import _QBITS_XY
from fyrox_tpu.physics.pallas_solver import _AB, _B_NAMES, solve_planes
from fyrox_tpu.physics.planes import (norm3, q_to_rot9, qmul, qrotate,
                                      splat, where3, where_n)
from fyrox_tpu.physics.shapes import (BALL as _SH_BALL,
                                      CAPSULE as _SH_CAPSULE,
                                      CUBOID as _SH_CUBOID)

__all__ = ["fused_step_pallas", "fused_full_step_pallas",
           "supports_fused", "supports_fused_bp"]

# dynamic collider plane rows (world-varying, [10, Cp]/[10, Cgp])
_DYN = ("px", "py", "pz", "qx", "qy", "qz", "qw", "vsx", "vsy", "vsz")
# static collider table rows: j-side [10, Cp] (last row col_body),
# i-side [10, Cgp] (last row = grid collider index)
_STA = ("p0", "p1", "p2", "p3", "p4", "p5", "fric", "rest", "kind", "idx")


def supports_fused(cx, t) -> bool:
    """Kernel scope: everything the primitive plane narrowphase covers.
    Joints/COM run in the SOLVER kernel (pallas_solver joint tables) but
    are not yet threaded through this fused front end, so such scenes
    use the staged narrowphase + solver-kernel path."""
    joints = t.joints
    return (not cx.has_com
            and (joints is None or joints.num_joints == 0)
            and not cx.scenery
            and cx.hull_flat is None
            and any(t.grid.nslot(c) for c in range(3)))


def supports_fused_bp(cx, t) -> bool:
    """Scope of the IN-KERNEL broadphase (the full-step resident
    program): fused-step scope, plus period=1 rebuilds (temporal reuse
    caches live across steps in XLA) and every broadphase-big collider
    a HALFSPACE (big-partner slots are then static rows — see
    _bp_candidates; finite-bound big partners would need real AABB
    tests against state)."""
    import numpy as np_
    if not supports_fused(cx, t):
        return False
    if int(getattr(t, "broadphase_period", 1) or 1) > 1:
        return False
    big = t.grid.big_cols
    from fyrox_tpu.physics import shapes as _sh
    return big.size == 0 or bool(
        np_.all(np_.asarray(cx.shape)[big] == _sh.HALFSPACE))


def _gather_dot(mat, oh, prec=None):
    """[A,128] f32 values x [128,K] one-hot, split-bf16 per the solver's
    precision policy (split3 = bit-exact f32 at 3 bf16 passes)."""
    f32 = jnp.float32
    if prec is None:
        prec = _ps._GATHER_PREC
    if prec in ("split2", "split3"):
        m_hi = mat.astype(jnp.bfloat16)
        rem = mat - m_hi.astype(f32)
        parts = [m_hi, rem.astype(jnp.bfloat16)]
        if prec == "split3":
            parts.append((rem - parts[1].astype(f32)).astype(jnp.bfloat16))
        out = jax.lax.dot_general(jnp.concatenate(parts, axis=0),
                                  oh.astype(jnp.bfloat16),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        a0 = mat.shape[0]
        acc = out[:a0]
        for i in range(1, len(parts)):
            acc = acc + out[i * a0:(i + 1) * a0]
        return acc
    p = jax.lax.Precision.HIGHEST if prec == "highest" else None
    return jax.lax.dot_general(mat, oh.astype(f32), (((1,), (0,)), ((), ())),
                               preferred_element_type=f32, precision=p)


def _wide_gather(rows, idx_f, n_hi):
    """Two-level (hi,lo) one-hot gather of 1-D source rows at f32 lane
    positions. rows: list of [L] arrays (L = n_hi*128 lanes); idx_f
    [R, K] f32 positions in [0, L). Returns [NR, R, K] f32, exact
    (split-bf16 per the solver gather policy)."""
    f32 = jnp.float32
    i32 = jnp.int32
    nr = len(rows)
    r, kk = idx_f.shape
    k = r * kk
    hi = jnp.floor(idx_f * (1.0 / 128.0))
    lo = idx_f - 128.0 * hi
    lo_flat = lo.reshape(1, k)
    hi_flat = hi.reshape(1, k)
    iota_wide = jax.lax.broadcasted_iota(i32, (128, k), 0).astype(f32)
    oh = (iota_wide == lo_flat).astype(f32)
    mat = jnp.stack([p[s8 * 128:(s8 + 1) * 128]
                     for s8 in range(n_hi) for p in rows])
    tmp = _gather_dot(mat, oh)                       # [n_hi*nr, k]
    acc = tmp[0:nr] * (hi_flat == 0.0).astype(f32)
    for s8 in range(1, n_hi):
        acc = acc + tmp[s8 * nr:(s8 + 1) * nr] * (hi_flat == float(s8)
                                                  ).astype(f32)
    return acc.reshape(nr, r, kk)


def _bp_candidates(prm, body, inc_j, inc_gc_t, bp_sta_j, bp_sta_i,
                   coli_sta, jv_big, *, cg, bp, cp_, cg_real, s_walk,
                   class_layout, nbig, tight_delta, zbits, zfine_div):
    """In-kernel broadphase: collider world pose -> swept fat AABBs ->
    packed hash-grid keys -> counting rank (replaces the XLA argsort:
    the [Cg,Cg] compare-reduce that LOSES as an HBM-materialized XLA
    stage wins resident in VMEM) -> 9-neighbor range walk -> per-class
    two-tier compaction into the static slot windows. Mirrors
    broadphase.slab_candidates bit-exactly at period=1 (same stable
    sort order: key asc, index tiebreak; same walk order; same
    tight-first packing tier), so the fused full-step path produces the
    same candidate windows as the staged XLA path.

    Returns (colj_dyn [10, Cp] pose+sweep planes in collider order,
    coli_dyn [10, Cg] grid order, jall [NS, Cg] i32 candidate windows).

    Big-partner slots (nbig per class) are STATIC rows (jv_big): the
    fused scope requires every broadphase-big collider to be a
    HALFSPACE, whose AABB test is conservative — statically-valid pairs
    whose AABBs would not overlap produce inactive manifolds that
    compact away identically (npt act gate), so contacts match the
    staged path exactly.

    Scope/caveats: period=1 only; padded grid lanes sort to the key
    maximum with jr=-1 (a real collider AT the +clip boundary of the
    packed key range may walk over them — they compact away via
    jr=-1, costing only window slack; the extent_hint warning covers
    authoring beyond the addressable range)."""
    from fyrox_tpu.physics.world import PREDICTION_DISTANCE
    f32 = jnp.float32
    i32 = jnp.int32
    margin = prm[9]
    cell = prm[10]
    dt = prm[11]
    n_hi = cg // 128

    # ---- 1. collider world pose (all colliders, j order) ----
    # body pose rows ride ONE static-incidence MXU dot to collider order
    bsel = jnp.stack([body[_B_NAMES.index(n)] for n in
                      ("px", "py", "pz", "qx", "qy", "qz", "qw",
                       "lvx", "lvy", "lvz")])                  # [10, Bp]
    g = _gather_dot(bsel, inc_j)                               # [10, Cp]
    b_pos = (g[0], g[1], g[2])
    b_q = (g[3], g[4], g[5], g[6])
    lv_c = (g[7], g[8], g[9])
    off_p = tuple(bp_sta_j[i] for i in range(3))
    off_q = tuple(bp_sta_j[3 + i] for i in range(4))
    cq = qmul(b_q, off_q)
    cpos = tuple(a + b for a, b in zip(
        b_pos, qrotate(b_q, off_p)))
    vs = tuple(v * dt for v in lv_c)                           # sweep
    colj_dyn = jnp.stack(list(cpos) + list(cq) + list(vs))     # [10, Cp]

    # ---- grid-order projection (static one-hot dot) ----
    coli_dyn = _gather_dot(colj_dyn, inc_gc_t)                 # [10, Cg]
    gi_pos = (coli_dyn[0], coli_dyn[1], coli_dyn[2])
    gi_q = (coli_dyn[3], coli_dyn[4], coli_dyn[5], coli_dyn[6])
    gi_vs = (coli_dyn[7], coli_dyn[8], coli_dyn[9])

    # ---- 2. swept fat AABBs (grid colliders; slab2._aabb_planes
    # period=1 branch — fused scope has no halfspace/scenery/convex in
    # the grid set) ----
    shp = bp_sta_i[1]
    dyn_i = bp_sta_i[2]
    body_i = bp_sta_i[3]
    lane_valid = bp_sta_i[4]
    cap3 = bp_sta_i[12]
    p6 = tuple(coli_sta[i] for i in range(6))
    rot = q_to_rot9(gi_q)
    absm = [jnp.abs(r) for r in rot]

    def rot_box(hx, hy, hz):
        return (absm[0] * hx + absm[1] * hy + absm[2] * hz,
                absm[3] * hx + absm[4] * hy + absm[5] * hz,
                absm[6] * hx + absm[7] * hy + absm[8] * hz)

    box = rot_box(p6[0], p6[1], p6[2])
    cap = rot_box(p6[1], p6[0] + p6[1], p6[1])
    cyl = rot_box(p6[1], p6[0], p6[1])
    is_ball = (shp == _SH_BALL).astype(f32)
    is_box = (shp == _SH_CUBOID).astype(f32)
    is_cap = (shp == _SH_CAPSULE).astype(f32)
    amin, amax = [], []
    for i in range(3):
        he = (is_ball * p6[0] + is_box * box[i] + is_cap * cap[i]
              + (1.0 - is_ball - is_box - is_cap) * cyl[i]) + margin
        swc = jnp.clip(gi_vs[i], -cap3, cap3)
        amin.append(gi_pos[i] - he + jnp.minimum(swc, 0.0))
        amax.append(gi_pos[i] + he + jnp.maximum(swc, 0.0))

    # ---- 3. packed keys (broadphase._pack_xyz mirror; f32 cell coords
    # are exact < 2^24, the i32 pack is the only int arithmetic) ----
    qxy_max = float(2 ** _QBITS_XY - 1)
    qz_max = float(2 ** zbits - 1)
    half_xy = float(2 ** (_QBITS_XY - 1))
    half_z = float(2 ** (zbits - 1))
    zcell = cell * (1.0 / zfine_div)
    qx = jnp.clip(jnp.floor(amin[0] / cell) + half_xy, 0.0, qxy_max)
    qy = jnp.clip(jnp.floor(amin[1] / cell) + half_xy, 0.0, qxy_max)
    qz = jnp.clip(jnp.floor(amin[2] / zcell) + half_z, 0.0, qz_max)

    def packi(x, y, z):
        return (x.astype(i32) * (2 ** (_QBITS_XY + zbits))
                + y.astype(i32) * (2 ** zbits) + z.astype(i32))

    key_max = 2 ** (2 * _QBITS_XY + zbits) - 1
    key = jnp.where(lane_valid > 0.5, packi(qx, qy, qz), key_max)

    # column orientation via ONE exact f32 transpose dot (cell coords
    # < 2^24; padded lanes pinned to the clip maximum = key_max)
    eye = (jax.lax.broadcasted_iota(i32, (cg, cg), 0)
           == jax.lax.broadcasted_iota(i32, (cg, cg), 1)).astype(f32)
    q3 = jnp.stack([jnp.where(lane_valid > 0.5, qx, qxy_max),
                    jnp.where(lane_valid > 0.5, qy, qxy_max),
                    jnp.where(lane_valid > 0.5, qz, qz_max)])
    qcol = jax.lax.dot_general(eye, q3, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32,
                               precision=jax.lax.Precision.HIGHEST
                               )                              # [Cg, 3]
    key_col = packi(qcol[:, 0:1], qcol[:, 1:2], qcol[:, 2:3])  # [Cg, 1]

    # ---- 4. stable counting rank (== stable argsort(key) order, index
    # tiebreak) + inverse permutation scatter of the walk source rows
    # to sorted order. The same compare-reduce LOST as an XLA stage
    # (round-4 A/B: HBM-materialized [W,Cg,Cg]); resident in VMEM it is
    # ~3 VPU ops/element with no traffic ----
    key_row = key[None]                                        # [1, Cg]
    iota_r = jax.lax.broadcasted_iota(i32, (cg, cg), 0)
    iota_c = jax.lax.broadcasted_iota(i32, (cg, cg), 1)
    # rank of sublane element j = #(i: key_i < key_j, or == and i < j)
    gt_ji = ((key_col > key_row).astype(f32)
             + (key_col == key_row).astype(f32)
             * (iota_c < iota_r).astype(f32))
    rank_col = jnp.sum(gt_ji, axis=1, keepdims=True)           # [Cg,1]
    perm_t = (rank_col == iota_c.astype(f32)).astype(f32)      # [Cg(i),Cg(s)]

    src = jnp.stack([bp_sta_i[0],                              # jr (-1 pad)
                     coli_sta[8],                              # eff kind
                     body_i, dyn_i,
                     amin[0], amin[1], amin[2],
                     amax[0], amax[1], amax[2]])               # [10, Cg]
    sorted_a = jax.lax.dot_general(src, perm_t, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=jax.lax.Precision.HIGHEST)

    # ---- 5. 9-neighbor range bounds (count_lt on the resident keys)
    # and the range walk into [s_walk, Cg] windows ----
    qz_lo = jnp.clip(jnp.floor((amin[2] - cell) / zcell) + half_z,
                     0.0, qz_max)
    qz_hi = jnp.clip(jnp.floor(amax[2] / zcell) + half_z, 0.0, qz_max)
    m_f = jax.lax.broadcasted_iota(i32, (s_walk, cg), 0).astype(f32)
    pos = jnp.zeros((s_walk, cg), f32)
    pfx = jnp.zeros((1, cg), f32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            qxd = jnp.clip(qx + dx, 0.0, qxy_max)
            qyd = jnp.clip(qy + dy, 0.0, qxy_max)
            q_lo = packi(qxd, qyd, qz_lo)[None]                # [1, Cg]
            q_hi = packi(qxd, qyd, qz_hi)[None]
            lo_d = jnp.sum((key_col < q_lo).astype(f32), axis=0,
                           keepdims=True)
            hi_d = jnp.sum((key_col <= q_hi).astype(f32), axis=0,
                           keepdims=True)
            in_r = (jnp.where(m_f >= pfx, 1.0, 0.0)
                    * jnp.where(m_f < pfx + (hi_d - lo_d), 1.0, 0.0))
            pos = pos + in_r * (lo_d + (m_f - pfx))
            pfx = pfx + (hi_d - lo_d)
    total = pfx                                                # [1, Cg]
    in_window = jnp.where(m_f < jnp.minimum(total, float(s_walk)),
                          1.0, 0.0)
    pos = jnp.clip(pos, 0.0, float(cg_real - 1))

    wj = _wide_gather([sorted_a[i] for i in range(10)], pos, n_hi)
    jr_w, kind_w, body_w, dyn_w = wj[0], wj[1], wj[2], wj[3]
    jmin_w, jmax_w = wj[4:7], wj[7:10]

    # ---- validity (slab_candidates valid_w mirror) ----
    gidx = bp_sta_i[0][None]
    overlap = jnp.ones((s_walk, cg), f32)
    tight = jnp.ones((s_walk, cg), f32)
    d2 = 2.0 * tight_delta
    for i in range(3):
        overlap = (overlap
                   * jnp.where(amin[i][None] <= jmax_w[i], 1.0, 0.0)
                   * jnp.where(amax[i][None] >= jmin_w[i], 1.0, 0.0))
        tight = (tight
                 * jnp.where(amin[i][None] <= jmax_w[i] - d2, 1.0, 0.0)
                 * jnp.where(amax[i][None] >= jmin_w[i] + d2, 1.0, 0.0))
    valid_w = (in_window
               * jnp.where(jr_w >= 0.0, 1.0, 0.0)
               * jnp.where(jr_w != gidx, 1.0, 0.0)
               * jnp.where(body_w != body_i[None], 1.0, 0.0)
               * jnp.maximum(dyn_i[None], dyn_w)
               * overlap)
    tight_w = valid_w * tight

    # manifold class of each walked slot (static per-i cls_tab row)
    cls_w = jnp.zeros((s_walk, cg), f32)
    for kb in range(7):
        cls_w = cls_w + jnp.where(kind_w == float(kb), 1.0, 0.0) \
            * bp_sta_i[5 + kb][None]

    # ---- 6. per-class two-tier stage-2 compaction (tight tier first)
    # into the static windows + static big-partner rows ----
    tril = (jax.lax.broadcasted_iota(i32, (s_walk, s_walk), 1)
            < jax.lax.broadcasted_iota(i32, (s_walk, s_walk), 0)
            ).astype(f32)
    jall_rows = []
    big_row = 0
    for (cls, nslot, _row0) in class_layout:
        s_c = nslot - nbig
        in_c = jnp.where(cls_w == float(cls), 1.0, 0.0)
        tf = tight_w * in_c
        sf = valid_w * in_c - tf
        csum = jax.lax.dot_general(
            tril, jnp.concatenate([tf, sf], axis=1),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        n_t = jnp.sum(tf, axis=0, keepdims=True)
        lpos = jnp.where(tf > 0.5, csum[:, :cg], n_t + csum[:, cg:])
        keep = jnp.maximum(tf, sf)
        for si in range(s_c):
            ind = keep * jnp.where(lpos == float(si), 1.0, 0.0)
            jall_rows.append(jnp.sum((jr_w + 1.0) * ind, axis=0,
                                     keepdims=True) - 1.0)
        for _bi in range(nbig):
            jall_rows.append(jv_big[big_row][None])
            big_row += 1
    jall = jnp.concatenate(jall_rows, axis=0).astype(i32)      # [NS, Cg]
    return colj_dyn, coli_dyn, jall


def _narrow_compact(prm, colj_dyn, colj_sta, coli_dyn, coli_sta, jall,
                    warm_lam, warm_pid, *, s, cg, bp, cp_, num_colliders,
                    class_layout, combos):
    """The in-VMEM narrowphase + two-tier compaction + warm pid match on
    plane VALUES. Returns (con dict _C_NAMES -> [S,Cg], bj [S,Cg] i32,
    pid_c [S,Cg] i32). Shared by the monolithic fused kernel and the
    split narrow/compact kernel (FYROX_FUSED_STEP=2) — the split halves
    the per-kernel program size the Mosaic AOT compiler has to chew."""
    f32 = jnp.float32
    i32 = jnp.int32
    margin = prm[9]
    n_hi = cp_ // 128

    # j-side gather source: 10 dynamic + 10 static rows ride one wide dot
    j_src = [colj_dyn[i] for i in range(10)] + [colj_sta[i] for i in range(10)]
    na = len(j_src)                                # 20

    wnames_f = ("nx", "ny", "nz", "px", "py", "pz", "depth", "act",
                "fric", "rest", "sigma", "own")
    wnd_f = {k: [] for k in wnames_f}
    wnd_i = {k: [] for k in ("body_j", "pid")}

    for (cls, nslot, row0) in class_layout:
        npts = (1, 2, 4)[cls]
        jr_raw = jall[row0:row0 + nslot]           # [nslot, Cgp] i32
        # pad slot rows to a multiple of 8: Mosaic supports vector bools
        # only at 8-aligned sublane counts — [13x1024]xi1 (nslot=13)
        # lowers through an i8 pack and dies on an unsupported i8->i1
        # truncation; padded rows are invalid (-1) and compact away
        nslot_p = -(-nslot // 8) * 8
        if nslot_p > nslot:
            jr_raw = jnp.concatenate(
                [jr_raw, jnp.full((nslot_p - nslot, cg), -1, i32)], axis=0)
            nslot = nslot_p
        # all slot-index math rides f32 (exact for these magnitudes):
        # int vector SELECTS/MAX lower through an i8 mask pack Mosaic
        # can't truncate back to i1 — the solver kernel compiles because
        # its only int vector ops are compares
        jr_f = jr_raw.astype(f32)
        valid = jr_f >= 0.0
        jr = jnp.maximum(jr_f, 0.0)
        hi = jnp.floor(jr * (1.0 / 128.0))
        lo = jr - 128.0 * hi

        k = nslot * cg
        lo_flat = lo.reshape(1, k)
        hi_flat = hi.reshape(1, k)
        iota_wide = jax.lax.broadcasted_iota(
            i32, (128, k), 0).astype(f32)
        oh = (iota_wide == lo_flat).astype(f32)
        mat = jnp.stack([p[s8 * 128:(s8 + 1) * 128]
                         for s8 in range(n_hi) for p in j_src])  # [n_hi*na,128]
        tmp = _gather_dot(mat, oh)                 # [n_hi*na, k]
        acc = tmp[0:na] * (hi_flat == 0.0).astype(f32)
        for s8 in range(1, n_hi):
            acc = acc + tmp[s8 * na:(s8 + 1) * na] * (hi_flat == float(s8)
                                                      ).astype(f32)
        jg = acc.reshape(na, nslot, cg)

        j_pos = (jg[0], jg[1], jg[2])
        j_q = (jg[3], jg[4], jg[5], jg[6])
        j_vs = (jg[7], jg[8], jg[9])
        j_p6 = tuple(jg[10 + i] for i in range(6))
        j_fric, j_rest = jg[16], jg[17]
        kind_j = jg[18]                            # f32 (small ints)
        body_j = jg[19]

        def ib(row):
            return jnp.broadcast_to(row[None], (nslot, cg))

        i_pos = tuple(ib(coli_dyn[i]) for i in range(3))
        i_q = tuple(ib(coli_dyn[3 + i]) for i in range(4))
        i_vs = tuple(ib(coli_dyn[7 + i]) for i in range(3))
        i_p6 = tuple(ib(coli_sta[i]) for i in range(6))
        i_fric = ib(coli_sta[6])
        i_rest = ib(coli_sta[7])
        kind_i = ib(coli_sta[8])
        gidx = ib(coli_sta[9])

        dv = tuple(a - b for a, b in zip(i_vs, j_vs))
        pred = margin + norm3(dv)

        import os as _os2
        if _os2.environ.get("FYROX_NC_BISECT") == "gather":
            # debug: gathers only — fabricate a trivial manifold from
            # gathered planes, no swap/np_planes
            for p_i in range(npts):
                wnd_f["nx"].append(jg[0] * 0.0)
                wnd_f["ny"].append(jg[1] * 0.0 + 1.0)
                wnd_f["nz"].append(jg[2] * 0.0)
                wnd_f["px"].append(jg[0])
                wnd_f["py"].append(jg[1])
                wnd_f["pz"].append(jg[2])
                wnd_f["depth"].append(pred - margin - 1.0)
                wnd_f["act"].append(jnp.where(valid, 1.0, 0.0))
                wnd_f["fric"].append(j_fric)
                wnd_f["rest"].append(j_rest)
                wnd_f["sigma"].append(jg[0] * 0.0 + 1.0)
                wnd_f["own"].append(jg[0] * 0.0 + float(npts))
                wnd_i["body_j"].append(body_j)
                wnd_i["pid"].append(gidx * 4.0 + float(p_i))
            continue

        # canonical A/B ordering (same compare as broadphase swap);
        # composed in f32 — in-kernel bitwise ops on vector bools hit
        # Mosaic's unsupported i8->i1 truncation (np_planes._m note)
        swf = (jnp.where(kind_i > kind_j, 1.0, 0.0)
               + jnp.where(kind_i == kind_j, 1.0, 0.0)
               * jnp.where(gidx > jr, 1.0, 0.0))
        sw = swf > 0.5
        eff_a = jnp.where(sw, kind_j, kind_i)
        eff_b = jnp.where(sw, kind_i, kind_j)
        pos_a = where3(sw, j_pos, i_pos)
        pos_b = where3(sw, i_pos, j_pos)
        q_a = where_n(sw, j_q, i_q)
        q_b = where_n(sw, i_q, j_q)
        p6_a = where_n(sw, j_p6, i_p6)
        p6_b = where_n(sw, i_p6, j_p6)
        rot_a = q_to_rot9(q_a)
        rot_b = q_to_rot9(q_b)

        m = np_planes.generate_class_planes(
            cls, eff_a, eff_b, pos_a, rot_a, p6_a, pos_b, rot_b, p6_b,
            pred, combos_present=combos[cls])

        fric_p = jnp.sqrt(jnp.maximum(i_fric * j_fric, 0.0))
        rest_p = jnp.maximum(i_rest, j_rest)
        sigma = jnp.where(sw, -1.0, 1.0)
        pid_pair = jnp.where(valid, gidx * float(num_colliders) + jr,
                             -1.0)                 # f32, exact < 2^24

        for p_i in range(npts):
            wnd_f["nx"].append(m.normal[0])
            wnd_f["ny"].append(m.normal[1])
            wnd_f["nz"].append(m.normal[2])
            wnd_f["px"].append(m.pts[p_i][0])
            wnd_f["py"].append(m.pts[p_i][1])
            wnd_f["pz"].append(m.pts[p_i][2])
            wnd_f["depth"].append(m.depth[p_i])
            wnd_f["act"].append(m.active[p_i]
                                 * jnp.where(valid, 1.0, 0.0))
            wnd_f["fric"].append(fric_p)
            wnd_f["rest"].append(rest_p)
            wnd_f["sigma"].append(sigma)
            wnd_f["own"].append(splat(float(npts), m.depth[p_i]))
            wnd_i["body_j"].append(body_j)
            wnd_i["pid"].append(pid_pair * 4.0 + float(p_i))

    wnd = {k: jnp.concatenate(v, axis=0) for k, v in {**wnd_f, **wnd_i}.items()}
    wd = wnd["act"].shape[0]

    import os as _os
    _bisect = _os.environ.get("FYROX_NC_BISECT")
    if _bisect == "window":
        # debug: skip compaction — expose window row r as slot r%s
        con = dict(nx=wnd["nx"][:s], ny=wnd["ny"][:s], nz=wnd["nz"][:s],
                   ptx=wnd["px"][:s], pty=wnd["py"][:s], ptz=wnd["pz"][:s],
                   depth=wnd["depth"][:s], fric=wnd["fric"][:s],
                   rest=wnd["rest"][:s], actf=wnd["act"][:s],
                   own=jnp.maximum(wnd["own"][:s], 1.0),
                   sigma=wnd["sigma"][:s],
                   lam_n=warm_lam[0] * 0.0, lam_t1=warm_lam[1] * 0.0,
                   lam_t2=warm_lam[2] * 0.0)
        bjf = jnp.clip(wnd["body_j"][:s], 0.0, bp - 1.0)
        hif = jnp.floor(bjf * (1.0 / 128.0))
        return (con, (hif.astype(i32), (bjf - 128.0 * hif).astype(i32)),
                wnd["pid"][:s].astype(i32))

    # ---- two-tier compaction (slab2._compact semantics): the
    # rapier-equivalent tier (within prediction_distance) packs first ----
    from fyrox_tpu.physics.world import PREDICTION_DISTANCE
    actf = wnd["act"]
    pen = actf * jnp.where(wnd["depth"] > -PREDICTION_DISTANCE, 1.0, 0.0)
    spec = actf - pen
    # exclusive cumsum over window rows = strict-lower-triangular dot
    # (0/1 values, f32 accumulation: exact); built from iotas in-kernel
    # (pallas_call rejects captured host constants)
    tril = (jax.lax.broadcasted_iota(i32, (wd, wd), 1)
            < jax.lax.broadcasted_iota(i32, (wd, wd), 0)).astype(f32)
    csum = jax.lax.dot_general(tril, jnp.concatenate([pen, spec], axis=1),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
    lpos_pen = csum[:, :cg]
    n_pen = jnp.sum(pen, axis=0, keepdims=True)
    lpos_spec = n_pen + csum[:, cg:]
    lpos = jnp.where(pen > 0.5, lpos_pen, lpos_spec)   # f32 counts
    keep_f = (jnp.where(actf > 0.5, 1.0, 0.0)
              * jnp.where(lpos < float(s), 1.0, 0.0))

    comp = {}
    for k in ("nx", "ny", "nz", "px", "py", "pz", "depth", "fric",
              "rest", "sigma", "own", "body_j", "pid"):
        masked = wnd[k] * keep_f
        comp[k] = jnp.stack(
            [jnp.sum(jnp.where(lpos == float(si), masked, 0.0), axis=0)
             for si in range(s)])                              # [S, Cg]

    n_valid = jnp.sum(actf, axis=0)                            # [Cg]
    iota_s = jax.lax.broadcasted_iota(i32, (s, cg), 0).astype(f32)
    actc = (iota_s < jnp.minimum(n_valid, float(s))[None]).astype(f32)
    own_c = jnp.maximum(comp["own"], 1.0)
    pid_c = jnp.where(actc > 0.5, comp["pid"], -1.0)   # f32

    # ---- warmstart pid matching (slab2._solve_tgs_planes) ----
    same = (warm_pid.astype(f32) == pid_c).astype(f32) * actc
    lam0 = (warm_lam[0] * same, warm_lam[1] * same, warm_lam[2] * same)

    # hi/lo split in f32 (exact); the single fptosi at the end is the
    # only int conversion the compacted outputs need
    bj_f = jnp.clip(comp["body_j"], 0.0, float(bp - 1))
    hi_f = jnp.floor(bj_f * (1.0 / 128.0))
    lo_f = bj_f - 128.0 * hi_f
    con = dict(nx=comp["nx"], ny=comp["ny"], nz=comp["nz"],
               ptx=comp["px"], pty=comp["py"], ptz=comp["pz"],
               depth=comp["depth"], fric=comp["fric"], rest=comp["rest"],
               actf=actc, own=own_c, sigma=comp["sigma"],
               lam_n=lam0[0], lam_t1=lam0[1], lam_t2=lam0[2])
    return con, (hi_f.astype(i32), lo_f.astype(i32)), pid_c.astype(i32)


def _kernel(params_ref, body_ref, colj_dyn_ref, colj_sta_ref, coli_dyn_ref,
            coli_sta_ref, jv_ref, warm_lam_ref, warm_pid_ref, self_body_ref,
            out_body_ref, out_lam_ref, out_pid_ref, *,
            s, cg, bp, cp_, num_colliders, class_layout, combos,
            n_sub, n_pgs, n_stab, msp):
    prm = params_ref[0]
    con, (hi_c, lo_c), pid_c = _narrow_compact(
        prm, colj_dyn_ref[0], colj_sta_ref[...], coli_dyn_ref[0],
        coli_sta_ref[...], jv_ref[0], warm_lam_ref[0], warm_pid_ref[0],
        s=s, cg=cg, bp=bp, cp_=cp_, num_colliders=num_colliders,
        class_layout=class_layout, combos=combos)
    body = {name: body_ref[0, i] for i, name in enumerate(_B_NAMES)}
    out, lam = solve_planes(prm, con, body, hi_c, lo_c,
                            self_body_ref[...], s=s, cg=cg, bp=bp,
                            n_sub=n_sub, n_pgs=n_pgs, n_stab=n_stab, msp=msp)
    out_body_ref[0] = out
    out_lam_ref[0] = lam
    out_pid_ref[0] = pid_c


def _nc_kernel(params_ref, colj_dyn_ref, colj_sta_ref, coli_dyn_ref,
               coli_sta_ref, jv_ref, warm_lam_ref, warm_pid_ref,
               out_con_ref, out_bj_ref, out_pid_ref, *,
               s, cg, bp, cp_, num_colliders, class_layout, combos):
    """Split-mode kernel 1: narrowphase + compaction + warm matching;
    compacted contact planes go to HBM once ([_AC,S,Cg] per world, ~50x
    smaller than the window planes the staged path materializes)."""
    prm = params_ref[0]
    con, (hi_c, lo_c), pid_c = _narrow_compact(
        prm, colj_dyn_ref[0], colj_sta_ref[...], coli_dyn_ref[0],
        coli_sta_ref[...], jv_ref[0], warm_lam_ref[0], warm_pid_ref[0],
        s=s, cg=cg, bp=bp, cp_=cp_, num_colliders=num_colliders,
        class_layout=class_layout, combos=combos)
    out_con_ref[0] = jnp.stack([con[n] for n in _ps._C_NAMES])
    out_bj_ref[0] = hi_c * 128 + lo_c
    out_pid_ref[0] = pid_c


def fused_step_pallas(params, body_planes, colj_dyn, colj_sta, coli_dyn,
                      coli_sta, jv, warm_lam, warm_pid, self_body, *,
                      s, cg, bp, cp_, num_colliders, class_layout, combos,
                      n_sub, n_pgs, n_stab, msp=0.5, interpret=False,
                      split=False):
    """params [12] f32 (solver 9 + margin + cell + dt); body_planes [W,AB,Bp];
    colj_dyn [W,10,Cp]; colj_sta [10,Cp] static; coli_dyn [W,10,Cgp];
    coli_sta [10,Cgp] static; jv [W,NS,Cgp] i32 (−1 invalid);
    warm_lam [W,3,S,Cgp]; warm_pid [W,S,Cgp] i32; self_body [Cgp,Bp].

    class_layout: static tuple of (cls, nslot, row0) for classes with
    windows; combos: dict cls → present combo list (host kind census).

    Returns (body_out [W,13,Bp], lam_out [W,3,S,Cgp],
    pid_out [W,S,Cgp] i32 — the next step's warm_pair)."""
    w = body_planes.shape[0]
    ns = jv.shape[1]
    if split:
        # two resident kernels instead of one: narrow+compact emits the
        # compacted contact planes through HBM once (~[_AC,S,Cg]/world),
        # then the production solver kernel (pallas_solver) consumes
        # them. Halves the program size Mosaic AOT has to compile — the
        # monolithic kernel's 62 MB MLIR crashed the remote compiler.
        nck = functools.partial(
            _nc_kernel, s=s, cg=cg, bp=bp, cp_=cp_,
            num_colliders=num_colliders, class_layout=class_layout,
            combos=combos)
        con_planes, bj, pid_out = pl.pallas_call(
            nck,
            grid=(w,),
            in_specs=[
                pl.BlockSpec((1, 12), lambda i: (0, 0)),
                pl.BlockSpec((1, 10, cp_), lambda i: (i, 0, 0)),
                pl.BlockSpec((10, cp_), lambda i: (0, 0)),
                pl.BlockSpec((1, 10, cg), lambda i: (i, 0, 0)),
                pl.BlockSpec((10, cg), lambda i: (0, 0)),
                pl.BlockSpec((1, ns, cg), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, _ps._AC, s, cg), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((w, _ps._AC, s, cg), jnp.float32),
                jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
                jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(params[None], colj_dyn, colj_sta, coli_dyn, coli_sta,
          jv, warm_lam, warm_pid)
        body_out, lam_out = _ps.solve_tgs_pallas(
            con_planes, bj // 128, bj % 128, body_planes, self_body,
            params[:9], s=s, cg=cg, bp=bp, n_sub=n_sub, n_pgs=n_pgs,
            n_stab=n_stab, msp=msp, interpret=interpret)
        return body_out, lam_out, pid_out
    kern = functools.partial(
        _kernel, s=s, cg=cg, bp=bp, cp_=cp_, num_colliders=num_colliders,
        class_layout=class_layout, combos=combos,
        n_sub=n_sub, n_pgs=n_pgs, n_stab=n_stab, msp=msp)
    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i: (0, 0)),
            pl.BlockSpec((1, _AB, bp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 10, cp_), lambda i: (i, 0, 0)),
            pl.BlockSpec((10, cp_), lambda i: (0, 0)),
            pl.BlockSpec((1, 10, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((10, cg), lambda i: (0, 0)),
            pl.BlockSpec((1, ns, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((cg, bp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 13, bp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 13, bp), jnp.float32),
            jax.ShapeDtypeStruct((w, 3, s, cg), jnp.float32),
            jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(params[None], body_planes, colj_dyn, colj_sta, coli_dyn, coli_sta,
      jv, warm_lam, warm_pid, self_body)


def _kernel_full(params_ref, body_ref, colj_sta_ref, coli_sta_ref,
                 inc_j_ref, inc_gct_ref, bp_sta_j_ref, bp_sta_i_ref,
                 jv_big_ref, warm_lam_ref, warm_pid_ref, self_body_ref,
                 out_body_ref, out_lam_ref, out_pid_ref, *,
                 s, cg, bp, cp_, num_colliders, class_layout, combos,
                 nbig, cg_real, s_walk, tight_delta, zbits, zfine_div,
                 n_sub, n_pgs, n_stab, msp):
    """Full-step resident program: pose -> AABB -> broadphase ->
    narrowphase -> compaction -> TGS solve, ONE kernel per world."""
    prm = params_ref[0]
    colj_dyn, coli_dyn, jall = _bp_candidates(
        prm, body_ref[0], inc_j_ref[...], inc_gct_ref[...],
        bp_sta_j_ref[...], bp_sta_i_ref[...], coli_sta_ref[...],
        jv_big_ref[...], cg=cg, bp=bp, cp_=cp_, cg_real=cg_real,
        s_walk=s_walk, class_layout=class_layout, nbig=nbig,
        tight_delta=tight_delta, zbits=zbits, zfine_div=zfine_div)
    con, (hi_c, lo_c), pid_c = _narrow_compact(
        prm, colj_dyn, colj_sta_ref[...], coli_dyn, coli_sta_ref[...],
        jall, warm_lam_ref[0], warm_pid_ref[0],
        s=s, cg=cg, bp=bp, cp_=cp_, num_colliders=num_colliders,
        class_layout=class_layout, combos=combos)
    body = {name: body_ref[0, i] for i, name in enumerate(_B_NAMES)}
    out, lam = solve_planes(prm, con, body, hi_c, lo_c,
                            self_body_ref[...], s=s, cg=cg, bp=bp,
                            n_sub=n_sub, n_pgs=n_pgs, n_stab=n_stab,
                            msp=msp)
    out_body_ref[0] = out
    out_lam_ref[0] = lam
    out_pid_ref[0] = pid_c


def _nc_kernel_full(params_ref, body_ref, colj_sta_ref, coli_sta_ref,
                    inc_j_ref, inc_gct_ref, bp_sta_j_ref, bp_sta_i_ref,
                    jv_big_ref, warm_lam_ref, warm_pid_ref,
                    out_con_ref, out_bj_ref, out_pid_ref, *,
                    s, cg, bp, cp_, num_colliders, class_layout, combos,
                    nbig, cg_real, s_walk, tight_delta, zbits, zfine_div):
    """Split-mode kernel 1 with in-kernel broadphase: pose + bp +
    narrowphase + compaction; the solver kernel consumes the compacted
    planes (AOT program-size headroom, as in _nc_kernel)."""
    prm = params_ref[0]
    colj_dyn, coli_dyn, jall = _bp_candidates(
        prm, body_ref[0], inc_j_ref[...], inc_gct_ref[...],
        bp_sta_j_ref[...], bp_sta_i_ref[...], coli_sta_ref[...],
        jv_big_ref[...], cg=cg, bp=bp, cp_=cp_, cg_real=cg_real,
        s_walk=s_walk, class_layout=class_layout, nbig=nbig,
        tight_delta=tight_delta, zbits=zbits, zfine_div=zfine_div)
    con, (hi_c, lo_c), pid_c = _narrow_compact(
        prm, colj_dyn, colj_sta_ref[...], coli_dyn, coli_sta_ref[...],
        jall, warm_lam_ref[0], warm_pid_ref[0],
        s=s, cg=cg, bp=bp, cp_=cp_, num_colliders=num_colliders,
        class_layout=class_layout, combos=combos)
    out_con_ref[0] = jnp.stack([con[n] for n in _ps._C_NAMES])
    out_bj_ref[0] = hi_c * 128 + lo_c
    out_pid_ref[0] = pid_c


def fused_full_step_pallas(params, body_planes, colj_sta, coli_sta,
                           inc_j, inc_gct, bp_sta_j, bp_sta_i, jv_big,
                           warm_lam, warm_pid, self_body, *,
                           s, cg, bp, cp_, num_colliders, class_layout,
                           combos, nbig, cg_real, s_walk, tight_delta,
                           zbits, zfine_div, n_sub, n_pgs, n_stab,
                           msp=0.5, interpret=False, split=False):
    """Full-step resident launch (in-kernel broadphase; see
    _bp_candidates). params [12] f32 (solver 9 + margin + cell + dt);
    body_planes [W,AB,Bp]; colj_sta [10,Cp] / coli_sta [10,Cg] as in
    fused_step_pallas; inc_j [Bp,Cp] body->collider one-hot; inc_gct
    [Cp,Cg] collider->grid one-hot; bp_sta_j [8,Cp] collider offset
    (pos3, rot4, pad); bp_sta_i [16,Cg] grid rows (jr/-1, shape, dyn,
    body, lane_valid, cls_tab k0..k6, cap3, pad); jv_big [NSB,Cg] f32
    static big-partner window rows (-1 invalid)."""
    w = body_planes.shape[0]
    nsb = jv_big.shape[0]
    common = dict(s=s, cg=cg, bp=bp, cp_=cp_,
                  num_colliders=num_colliders, class_layout=class_layout,
                  combos=combos, nbig=nbig, cg_real=cg_real,
                  s_walk=s_walk, tight_delta=tight_delta, zbits=zbits,
                  zfine_div=zfine_div)
    in_specs_common = [
        pl.BlockSpec((1, 12), lambda i: (0, 0)),
        pl.BlockSpec((1, _AB, bp), lambda i: (i, 0, 0)),
        pl.BlockSpec((10, cp_), lambda i: (0, 0)),
        pl.BlockSpec((10, cg), lambda i: (0, 0)),
        pl.BlockSpec((bp, cp_), lambda i: (0, 0)),
        pl.BlockSpec((cp_, cg), lambda i: (0, 0)),
        pl.BlockSpec((8, cp_), lambda i: (0, 0)),
        pl.BlockSpec((16, cg), lambda i: (0, 0)),
        pl.BlockSpec((nsb, cg), lambda i: (0, 0)),
        pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
    ]
    if split:
        nck = functools.partial(_nc_kernel_full, **common)
        con_planes, bj, pid_out = pl.pallas_call(
            nck,
            grid=(w,),
            in_specs=list(in_specs_common),
            out_specs=[
                pl.BlockSpec((1, _ps._AC, s, cg), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((w, _ps._AC, s, cg), jnp.float32),
                jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
                jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(params[None], body_planes, colj_sta, coli_sta, inc_j, inc_gct,
          bp_sta_j, bp_sta_i, jv_big, warm_lam, warm_pid)
        body_out, lam_out = _ps.solve_tgs_pallas(
            con_planes, bj // 128, bj % 128, body_planes, self_body,
            params[:9], s=s, cg=cg, bp=bp, n_sub=n_sub, n_pgs=n_pgs,
            n_stab=n_stab, msp=msp, interpret=interpret)
        return body_out, lam_out, pid_out
    kern = functools.partial(_kernel_full, **common, n_sub=n_sub,
                             n_pgs=n_pgs, n_stab=n_stab, msp=msp)
    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=list(in_specs_common) + [
            pl.BlockSpec((cg, bp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 13, bp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 13, bp), jnp.float32),
            jax.ShapeDtypeStruct((w, 3, s, cg), jnp.float32),
            jax.ShapeDtypeStruct((w, s, cg), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(params[None], body_planes, colj_sta, coli_sta, inc_j, inc_gct,
      bp_sta_j, bp_sta_i, jv_big, warm_lam, warm_pid, self_body)
