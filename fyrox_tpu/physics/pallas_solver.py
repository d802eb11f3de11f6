"""Fused Pallas TGS solver: the whole substep loop in VMEM, per world.

The XLA plane solver (slab2._solve_tgs_planes) costs ~8.6 ms/step at
W=32 on v5e — ~20 elementwise passes per step round-trip every [W,Kc]
plane through HBM between the gather/scatter matmuls. All solver state
for one world fits VMEM (contact planes ~2 MB + body planes ~100 KB), so
this kernel runs the COMPLETE velocity solve — 4 TGS substeps (warmstart,
soft/hard PGS, friction), position integration, restitution, 4 NGS
stabilization passes — in one pallas_call with grid=(W,).

Layout inside the kernel:
  contact planes  [A, S, Cg]   S = s_active sublanes, Cg colliders lanes.
                               Self-side broadcast = sublane broadcast;
                               the impulse scatter's window-sum = one
                               sublane reduction. Both free.
  body planes     [A, Bp]      Bp = bodies padded to 128 lanes.
  partner gather: two-level one-hot (body = hi*32 + lo) per sublane row —
                  an [A*32, 32] @ [32, Cg] MXU dot + a 32-way masked
                  reduce, so the compare cost is K*64 instead of K*B.
  collider→body scatter: one static one-hot matmul (HIGHEST precision).

Semantics are identical to slab2._solve_tgs_planes (rapier parameter
mapping per fyrox-impl/src/scene/graph/physics/mod.rs:892-908); a
same-seed equivalence test runs this kernel in interpreter mode against
the XLA path (tests/test_pallas_solver.py). Scenes with COM offsets or
joints take the XLA path (kernel scope: the flagship fast case).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["solve_tgs_pallas", "supports_kernel"]

# Gather-dot precision policy (A/B knob for the TPU session):
#   default — whatever Mosaic lowers plain f32 dots to
#   highest — explicit 6-pass exact f32
#   split2  — 2 bf16 passes: one-hot side is EXACT in bf16, value side
#             split v = bf16(v) + bf16(v - hi). Error ≤ 2^-18 rel (vs
#             f32's 2^-24) — cheaper iff Mosaic's default is ≥3 passes.
#   split3  — 3 bf16 passes hi/mid/lo reconstructing all 24 mantissa
#             bits (pallas_ops._gather_kernel trick): BIT-EXACT vs the
#             6-pass f32 dot at half its MXU cost. The split passes ride
#             ONE concatenated dot (free dim 3x) so fixed per-dot
#             overheads don't triple.
# default split3: bit-near-exact (1e-6 vs the f32 dots) at the same
# 3-pass cost — measured fastest exact option (TPU_SESSION2_r4.json:
# 4.84 vs default 4.96 vs highest 7.88 ms solver at W=32)
_GATHER_PREC = os.environ.get("FYROX_SOLVER_GATHER_PREC", "split3")
# partner-gather formulation (A/B knob):
#   select  — one [A*n_hi,128]@[128,Cg] dot PER SUBLANE ROW, then an
#             n_hi-way masked select on the reshaped output.
#   premask — n_hi [A,128]@[128,Cg] dots per row with the slab mask
#             folded into the one-hot (no output reshape/select).
#   wide    — ONE [n_hi*A,128]@[128,S*Cg] dot per gather: the one-hot
#             (which depends only on the FIXED lo indices) is built once
#             per kernel over all S rows; slab-major mat rows keep the
#             output slices sublane-contiguous (no relayout). Cuts the
#             per-gather dot count from S to 1 — the winner if per-dot
#             fixed overhead dominates (precision sweep showed 2-vs-6
#             dot passes moves solver_ms <3%, so it does).
# default wide: one dot per gather — measured 4.04 vs select 4.84 vs
# premask 5.18 ms solver at W=32 (TPU_SESSION3_r4.json)
_GATHER_MODE = os.environ.get("FYROX_SOLVER_GATHER_MODE", "wide")

# contact plane indices (input stack). Constraint prep (tangents,
# anchors, effective masses, mass-splitting counts, restitution targets)
# happens IN-KERNEL from these raw planes — moving it off the XLA side
# halved the packing traffic and removed the separate prep gathers.
_C_NAMES = ("nx", "ny", "nz", "ptx", "pty", "ptz", "depth", "fric",
            "rest", "actf", "own", "sigma", "lam_n", "lam_t1", "lam_t2")
_CI = {n: i for i, n in enumerate(_C_NAMES)}
_AC = len(_C_NAMES)

# body plane indices
_B_NAMES = ("lvx", "lvy", "lvz", "avx", "avy", "avz",
            "px", "py", "pz", "qx", "qy", "qz", "qw",
            "accx", "accy", "accz", "im",
            "ii0", "ii1", "ii2", "ii3", "ii4", "ii5", "ii6", "ii7", "ii8")
_BI = {n: i for i, n in enumerate(_B_NAMES)}
_AB = len(_B_NAMES)


def supports_kernel(t, has_com) -> bool:
    joints = t.joints
    return (not has_com) and (joints is None or joints.num_joints == 0)


def _kernel(params_ref, con_ref, hi_ref, lo_ref, body_ref,
            self_body_ref, out_body_ref, out_lam_ref, *, s, cg, bp,
            n_sub, n_pgs, n_stab, msp):
    con = {name: con_ref[0, i] for name, i in _CI.items()}
    body = {name: body_ref[0, i] for name, i in _BI.items()}
    out, lam = solve_planes(params_ref[0], con, body, hi_ref[0], lo_ref[0],
                            self_body_ref[...], s=s, cg=cg, bp=bp,
                            n_sub=n_sub, n_pgs=n_pgs, n_stab=n_stab, msp=msp)
    out_body_ref[0] = out
    out_lam_ref[0] = lam


def solve_planes(prm, con, body, hi, lo, self_b, *, s, cg, bp,
                 n_sub, n_pgs, n_stab, msp):
    """The complete in-VMEM TGS solve on plane VALUES (not refs), so the
    fused narrow+compact+solve kernel (pallas_step.py) can feed it
    contacts it just built without an HBM round trip.

    prm [9] f32; con: dict _C_NAMES → [S,Cg]; body: dict _B_NAMES → [Bp];
    hi/lo [S,Cg] i32 partner-body two-level indices; self_b [Cg,Bp]
    one-hot. Returns (out [13,Bp] stacked lv/av/pos/q, lam [3,S,Cg])."""
    f32 = jnp.float32
    h = prm[0]
    allowed = prm[1]
    max_corr = prm[2]
    rest_thr = prm[3]
    wc = prm[4]
    erp = prm[5]
    bias_rate = prm[6]
    mscale_soft = prm[7]
    iscale_soft = prm[8]

    def cp(name):
        return con[name]                          # [S, Cg]

    def bpl(name):
        return body[name]                         # [Bp]

    n = (cp("nx"), cp("ny"), cp("nz"))
    pt = (cp("ptx"), cp("pty"), cp("ptz"))
    fric = cp("fric")
    rest_c = cp("rest")
    actf = cp("actf")
    own = cp("own")
    sigma = cp("sigma")
    swapped = sigma < 0.0

    # tangent frame (branch-free Pixar ONB, solver._orthonormal_tangents)
    sgn_t = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a_t = -1.0 / (sgn_t + n[2])
    b_t = n[0] * n[1] * a_t
    t1 = (1.0 + sgn_t * n[0] * n[0] * a_t, sgn_t * b_t, -sgn_t * n[0])
    t2 = (b_t, sgn_t + n[1] * n[1] * a_t, -n[1])

    # hi/lo: [S, Cg] int32; self_b: [Cg, Bp] one-hot (row g → its body)

    # two-level one-hot gather with the NATIVE (n_hi, 128) decomposition:
    # body = hi*128 + lo. Minor-dim splits must keep 128 lanes — Mosaic
    # rejects non-tile-aligned shape casts (e.g. 1024 -> 32x32).
    # (An EARLIER a-major batched single-dot variant measured slower
    # from 4D reshape relayouts; the "wide" mode below fixes that with
    # slab-major rows + a shared precomputed one-hot and measures
    # fastest — see _GATHER_MODE.)
    n_hi = bp // 128
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, cg), 0)
    if _GATHER_MODE == "wide":
        # lo/hi are fixed for the whole solve: build the [128, S*Cg]
        # one-hot and the n_hi slab masks ONCE
        lo_flat = lo.reshape(1, s * cg)
        hi_flat = hi.reshape(1, s * cg)
        iota_wide = jax.lax.broadcasted_iota(jnp.int32, (128, s * cg), 0)
        oh_wide = (iota_wide == lo_flat).astype(f32)
        himask = [(hi_flat == s8).astype(f32) for s8 in range(n_hi)]
        # the SELF gather rides the same wide dot: recover each
        # collider's body index from the static one-hot (iota reduce),
        # build its lo one-hot + hi masks, and concatenate along N —
        # one [n_hi*A,128] @ [128, S*Cg + Cg] dot serves partner AND
        # self sides of every paired gather
        colb = jnp.sum(self_b * jax.lax.broadcasted_iota(
            jnp.int32, (cg, bp), 1).astype(f32),              # Mosaic iota
            axis=1).astype(jnp.int32)                         # must be int

        hi_self = colb // 128
        lo_self = colb % 128
        oh_cat = jnp.concatenate(
            [oh_wide, (iota_lo == lo_self[None, :]).astype(f32)], axis=1)
        mask_cat = [jnp.concatenate(
            [himask[s8], (hi_self[None, :] == s8).astype(f32)], axis=1)
            for s8 in range(n_hi)]

    def _gather_dot(mat, oh_lo, dn=(((1,), (0,)), ((), ()))):
        """f32 values × one-hot → f32 under the module's precision
        policy. The one-hot side is exactly representable in bf16;
        split2/split3 split the value side into bf16 components whose
        one-hot dots accumulate in f32 (split3 reconstructs all 24
        mantissa bits — bit-exact, pallas_ops._gather_kernel trick).
        The split components stack along the FREE dim of `mat` (axis 0
        for both gather6's dn and selfcast's), so the splits ride one
        dot and are summed from its output slices."""
        if _GATHER_PREC in ("split2", "split3"):
            m_hi = mat.astype(jnp.bfloat16)
            rem = mat - m_hi.astype(f32)
            parts = [m_hi, rem.astype(jnp.bfloat16)]
            if _GATHER_PREC == "split3":
                parts.append((rem - parts[1].astype(f32))
                             .astype(jnp.bfloat16))
            oh_b = oh_lo.astype(jnp.bfloat16)
            out = jax.lax.dot_general(jnp.concatenate(parts, axis=0),
                                      oh_b, dn,
                                      preferred_element_type=f32)
            a0 = mat.shape[0]
            acc = out[:a0]
            for p_i in range(1, len(parts)):
                acc = acc + out[p_i * a0:(p_i + 1) * a0]
            return acc
        prec = (jax.lax.Precision.HIGHEST if _GATHER_PREC == "highest"
                else None)
        return jax.lax.dot_general(mat, oh_lo, dn,
                                   preferred_element_type=f32,
                                   precision=prec)

    def gather6(planes):
        """planes: list of [Bp] body planes -> list of [S,Cg] partner
        values. Two formulations (FYROX_SOLVER_GATHER_MODE A/B):

        select (default): one [A*n_hi, 128] @ [128, Cg] MXU dot per
        sublane row + an n_hi-way masked select on the [A, n_hi, Cg]
        output (costs a sublane-dim reshape + 2*n_hi VPU ops on the
        output).

        premask: fold the hi-slab select into the ONE-HOT side — per
        slab, oh = onehot(lo) * (hi == s8), then accumulate n_hi
        [A,128] @ [128,Cg] dots. Same MXU FLOPs, no output reshape or
        select chain; the mask costs n_hi broadcast muls on [128, Cg]."""
        a = len(planes)
        rows = []
        if _GATHER_MODE == "wide":
            mat = jnp.stack([p[s8 * 128:(s8 + 1) * 128]
                             for s8 in range(n_hi)
                             for p in planes])               # [n_hi*A,128]
            tmp = _gather_dot(mat, oh_wide)                  # [n_hi*A,S*Cg]
            acc = tmp[0:a] * himask[0]
            for s8 in range(1, n_hi):
                acc = acc + tmp[s8 * a:(s8 + 1) * a] * himask[s8]
            out = acc.reshape(a, s, cg)
            return [out[i] for i in range(a)]
        if _GATHER_MODE == "premask":
            mats = [jnp.stack([p[s8 * 128:(s8 + 1) * 128] for p in planes])
                    for s8 in range(n_hi)]                      # n_hi×[A,128]
            for s_i in range(s):
                oh_lo = (iota_lo == lo[s_i][None, :]).astype(f32)
                hrow = hi[s_i][None, :]
                acc = _gather_dot(mats[0],
                                  oh_lo * (hrow == 0).astype(f32))
                for s8 in range(1, n_hi):
                    acc = acc + _gather_dot(
                        mats[s8], oh_lo * (hrow == s8).astype(f32))
                rows.append(acc)
            out = jnp.stack(rows, axis=1)                       # [A,S,Cg]
            return [out[i] for i in range(a)]
        mat = jnp.stack(planes).reshape(a * n_hi, 128)
        for s_i in range(s):
            oh_lo = (iota_lo == lo[s_i][None, :]).astype(f32)   # [128,Cg]
            tmp = _gather_dot(mat, oh_lo)                       # [A*hi,Cg]
            tmp3 = tmp.reshape(a, n_hi, cg)
            hrow = hi[s_i][None, :]
            acc = tmp3[:, 0, :] * (hrow == 0).astype(f32)
            for s8 in range(1, n_hi):
                acc = acc + tmp3[:, s8, :] * (hrow == s8).astype(f32)
            rows.append(acc)
        out = jnp.stack(rows, axis=1)                           # [A,S,Cg]
        return [out[i] for i in range(a)]

    def selfcast(planes):
        """list of [Bp] → per-collider [Cg] (static one-hot) broadcast to
        [S, Cg]."""
        a = len(planes)
        mat = jnp.stack(planes)                                # [A, Bp]
        percol = _gather_dot(mat, self_b,
                             dn=(((1,), (1,)), ((), ())))      # [A, Cg]
        return [jnp.broadcast_to(percol[i][None], (s, cg)) for i in range(a)]

    def gather_self(planes):
        """Paired partner + self gather. In wide mode both ride ONE
        [n_hi*A,128] @ [128, S*Cg+Cg] dot (the self one-hot/masks are
        concatenated along N at setup); otherwise falls back to
        gather6 + selfcast."""
        if _GATHER_MODE != "wide":
            return gather6(planes), selfcast(planes)
        a = len(planes)
        mat = jnp.stack([p[s8 * 128:(s8 + 1) * 128]
                         for s8 in range(n_hi)
                         for p in planes])                   # [n_hi*A,128]
        tmp = _gather_dot(mat, oh_cat)                       # [n_hi*A, N']
        acc = tmp[0:a] * mask_cat[0]
        for s8 in range(1, n_hi):
            acc = acc + tmp[s8 * a:(s8 + 1) * a] * mask_cat[s8]
        part = acc[:, :s * cg].reshape(a, s, cg)
        selfp = acc[:, s * cg:]                              # [A, Cg]
        return ([part[i] for i in range(a)],
                [jnp.broadcast_to(selfp[i][None], (s, cg))
                 for i in range(a)])

    def scatter6(vals):
        """6 × [S,Cg] self-half contributions → 6 × [Bp] body sums.
        split3 replaces the 6-pass HIGHEST dot with the bit-exact
        3-component bf16 split (the one-hot side is exact either way)."""
        sums = jnp.stack([jnp.sum(v, axis=0) for v in vals])   # [6, Cg]
        if _GATHER_PREC == "split3":
            out = _gather_dot(sums, self_b)                    # [6, Bp]
        else:
            out = jax.lax.dot_general(
                sums, self_b, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)           # [6, Bp]
        return [out[i] for i in range(6)]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def sel3(c, a, b):
        return tuple(jnp.where(c, x, y) for x, y in zip(a, b))

    def rel_vel(lv, av):
        jv, iv = gather_self(list(lv) + list(av))
        lv_a = sel3(swapped, tuple(jv[0:3]), tuple(iv[0:3]))
        av_a = sel3(swapped, tuple(jv[3:6]), tuple(iv[3:6]))
        lv_b = sel3(swapped, tuple(iv[0:3]), tuple(jv[0:3]))
        av_b = sel3(swapped, tuple(iv[3:6]), tuple(jv[3:6]))
        va = tuple(l + c for l, c in zip(lv_a, cross(av_a, r_a)))
        vb = tuple(l + c for l, c in zip(lv_b, cross(av_b, r_b)))
        return tuple(b_ - a_ for a_, b_ in zip(va, vb))

    ii0 = [bpl(f"ii{k}") for k in range(9)]

    # ---- in-kernel constraint prep ----
    # mass-splitting counts: per-body active-pair count (own-point
    # normalized), count^msp (solver.SolverParams.mass_split_pow)
    own_safe = jnp.maximum(own, 1.0)
    actp = actf / own_safe
    per_col = jnp.sum(actp, axis=0)[None]                  # [1, Cg]
    count_b = jax.lax.dot_general(
        per_col, self_b, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)[0]            # [Bp]
    count_b = jnp.maximum(count_b, 1.0)
    if msp == 0.5:
        count_b = jnp.sqrt(count_b)
    elif msp != 1.0:
        count_b = count_b ** msp

    im_plane = bpl("im")
    body14 = [im_plane, count_b, bpl("px"), bpl("py"), bpl("pz")] + ii0
    jg14, ig14 = gather_self(body14)
    im_j, cnt_j = jg14[0], jg14[1]
    im_i, cnt_i = ig14[0], ig14[1]
    com_j = tuple(jg14[2:5])
    com_i = tuple(ig14[2:5])
    ii_j = tuple(jg14[5:14])
    ii_i = tuple(ig14[5:14])
    sw_f = swapped
    im_a = jnp.where(sw_f, im_j, im_i)
    im_b = jnp.where(sw_f, im_i, im_j)
    cnt_a = jnp.where(sw_f, cnt_j, cnt_i) * own_safe
    cnt_b2 = jnp.where(sw_f, cnt_i, cnt_j) * own_safe
    com_a = sel3(sw_f, com_j, com_i)
    com_b = sel3(sw_f, com_i, com_j)
    ii_a = tuple(jnp.where(sw_f, x, y) for x, y in zip(ii_j, ii_i))
    ii_b = tuple(jnp.where(sw_f, y, x) for x, y in zip(ii_j, ii_i))
    im_s = im_i
    r_a = tuple(p - c for p, c in zip(pt, com_a))
    r_b = tuple(p - c for p, c in zip(pt, com_b))
    r_s = tuple(p - c for p, c in zip(pt, com_i))

    def _mvc(m9, v):
        return (m9[0] * v[0] + m9[1] * v[1] + m9[2] * v[2],
                m9[3] * v[0] + m9[4] * v[1] + m9[5] * v[2],
                m9[6] * v[0] + m9[7] * v[1] + m9[8] * v[2])

    def _cross_pre(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def _dot_pre(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def eff_mass(d):
        rxd_a = _cross_pre(r_a, d)
        rxd_b = _cross_pre(r_b, d)
        k = (im_a * cnt_a + im_b * cnt_b2
             + cnt_a * _dot_pre(rxd_a, _mvc(ii_a, rxd_a))
             + cnt_b2 * _dot_pre(rxd_b, _mvc(ii_b, rxd_b)))
        return 1.0 / jnp.maximum(k, 1e-12)

    m_n = eff_mass(n)
    m_t1 = eff_mass(t1)
    m_t2 = eff_mass(t2)

    def mv9(v):
        return (ii0[0] * v[0] + ii0[1] * v[1] + ii0[2] * v[2],
                ii0[3] * v[0] + ii0[4] * v[1] + ii0[5] * v[2],
                ii0[6] * v[0] + ii0[7] * v[1] + ii0[8] * v[2])

    def apply_imp(lv, av, imp):
        imp_s = tuple(-sigma * i for i in imp)
        lin = tuple(i * im_s for i in imp_s)
        torq = cross(r_s, imp_s)
        sums = scatter6(list(lin) + list(torq))
        lv = tuple(l + d for l, d in zip(lv, sums[0:3]))
        dth = mv9(tuple(sums[3:6]))
        av = tuple(a_ + d for a_, d in zip(av, dth))
        return lv, av

    lv = (bpl("lvx"), bpl("lvy"), bpl("lvz"))
    av = (bpl("avx"), bpl("avy"), bpl("avz"))
    pos = (bpl("px"), bpl("py"), bpl("pz"))
    q = (bpl("qx"), bpl("qy"), bpl("qz"), bpl("qw"))
    acc = (bpl("accx"), bpl("accy"), bpl("accz"))
    # restitution target from pre-substep approach velocity
    rv0 = rel_vel(lv, av)
    v0n = dot3(rv0, n)
    rest_t = jnp.where(v0n < -rest_thr, -rest_c * v0n, 0.0)

    depth = cp("depth")
    lam_n = cp("lam_n")
    lam_t1 = cp("lam_t1")
    lam_t2 = cp("lam_t2")
    lam_mx = jnp.zeros_like(lam_n)

    for _sub in range(n_sub):
        lv = tuple(l + h * a_ for l, a_ in zip(lv, acc))

        # warmstart
        lam_n = lam_n * wc
        lam_t1 = lam_t1 * wc
        lam_t2 = lam_t2 * wc
        warm_imp = tuple(lam_n * nn + lam_t1 * tt1 + lam_t2 * tt2
                         for nn, tt1, tt2 in zip(n, t1, t2))
        lv, av = apply_imp(lv, av, warm_imp)

        sep = -(depth - allowed)
        bias = jnp.where(sep > 0.0, sep / h,
                         jnp.maximum(bias_rate * sep, -max_corr))
        mscale = jnp.where(sep > 0.0, 1.0, mscale_soft)
        iscale = jnp.where(sep > 0.0, 0.0, iscale_soft)

        for _p in range(n_pgs):
            rv = rel_vel(lv, av)
            vn = dot3(rv, n)
            dl = (-m_n * mscale * (vn + bias) - iscale * lam_n) * actf
            new_n = jnp.maximum(lam_n + dl, 0.0)
            d1 = new_n - lam_n
            # lane-padding columns carry m_n = 0 (zero-padded planes);
            # guard the 0/0 — their impulses are actf-masked anyway
            vn2 = vn + d1 / jnp.maximum(m_n, 1e-12)
            spec = jnp.where(sep > 0.0, bias, 0.0)
            dl2 = -m_n * (vn2 + spec) * actf
            new_n2 = jnp.maximum(new_n + dl2, 0.0)
            dn = new_n2 - lam_n
            lam_n = new_n2
            max_f = fric * lam_n
            vt1 = dot3(rv, t1)
            new1 = jnp.clip(lam_t1 - m_t1 * vt1 * actf, -max_f, max_f)
            dt1 = new1 - lam_t1
            lam_t1 = new1
            vt2 = dot3(rv, t2)
            new2 = jnp.clip(lam_t2 - m_t2 * vt2 * actf, -max_f, max_f)
            dt2 = new2 - lam_t2
            lam_t2 = new2
            imp = tuple(dn * nn + dt1 * tt1 + dt2 * tt2
                        for nn, tt1, tt2 in zip(n, t1, t2))
            lv, av = apply_imp(lv, av, imp)

        lam_mx = jnp.maximum(lam_mx, lam_n)
        vn_end = dot3(rel_vel(lv, av), n)
        depth = depth - h * vn_end

        # integrate (no COM offsets in the kernel's scope)
        dq = (q[3] * av[0] + av[1] * q[2] - av[2] * q[1],
              q[3] * av[1] - av[0] * q[2] + av[2] * q[0],
              q[3] * av[2] + av[0] * q[1] - av[1] * q[0],
              -av[0] * q[0] - av[1] * q[1] - av[2] * q[2])
        qn = tuple(qc + 0.5 * h * dc for qc, dc in zip(q, dq))
        inv = jax.lax.rsqrt(qn[0] ** 2 + qn[1] ** 2 + qn[2] ** 2
                            + qn[3] ** 2 + 1e-30)
        q = tuple(qc * inv for qc in qn)
        pos = tuple(p + h * l for p, l in zip(pos, lv))

    # restitution
    vn = dot3(rel_vel(lv, av), n)
    dl = jnp.maximum(-m_n * (vn - rest_t), 0.0) * actf \
        * (lam_mx > 0.0).astype(f32)
    lv, av = apply_imp(lv, av, tuple(dl * nn for nn in n))
    lam_n = lam_n + dl

    # NGS stabilization
    for _it in range(n_stab):
        corr = erp * jnp.maximum(depth - allowed, 0.0)
        p_imp = m_n * corr * actf
        imp_s = tuple(-sigma * p_imp * nn for nn in n)
        lin = tuple(i * im_s for i in imp_s)
        torq = cross(r_s, imp_s)
        sums = scatter6(list(lin) + list(torq))
        dpos = tuple(sums[0:3])
        dth = mv9(tuple(sums[3:6]))
        pos = tuple(p + d for p, d in zip(pos, dpos))
        dq = (q[3] * dth[0] + dth[1] * q[2] - dth[2] * q[1],
              q[3] * dth[1] - dth[0] * q[2] + dth[2] * q[0],
              q[3] * dth[2] + dth[0] * q[1] - dth[1] * q[0],
              -dth[0] * q[0] - dth[1] * q[1] - dth[2] * q[2])
        qn = tuple(qc + 0.5 * dc for qc, dc in zip(q, dq))
        inv = jax.lax.rsqrt(qn[0] ** 2 + qn[1] ** 2 + qn[2] ** 2
                            + qn[3] ** 2 + 1e-30)
        q = tuple(qc * inv for qc in qn)
        d6 = list(dpos) + list(dth)
        jg, ig = gather_self(d6)
        dp_a = sel3(swapped, tuple(jg[0:3]), tuple(ig[0:3]))
        dt_a = sel3(swapped, tuple(jg[3:6]), tuple(ig[3:6]))
        dp_b = sel3(swapped, tuple(ig[0:3]), tuple(jg[0:3]))
        dt_b = sel3(swapped, tuple(ig[3:6]), tuple(jg[3:6]))
        rel_corr = tuple(
            (pb_ + cb_) - (pa_ + ca_)
            for pa_, ca_, pb_, cb_ in zip(dp_a, cross(dt_a, r_a),
                                          dp_b, cross(dt_b, r_b)))
        depth = depth - dot3(rel_corr, n)

    out = [lv[0], lv[1], lv[2], av[0], av[1], av[2],
           pos[0], pos[1], pos[2], q[0], q[1], q[2], q[3]]
    return jnp.stack(out), jnp.stack([lam_n, lam_t1, lam_t2])


def solve_tgs_pallas(con_planes, hi, lo, body_planes,
                     self_body, params, s, cg, bp, n_sub, n_pgs, n_stab,
                     msp=0.5, interpret=False):
    """con_planes [W,AC,S,Cg] f32; hi/lo [W,S,Cg] i32; body_planes
    [W,AB,Bp]; self_body [Cg,Bp] one-hot f32; params [9] f32.

    Returns (body_out [W,13,Bp], lam_out [W,3,S,Cg])."""
    w = con_planes.shape[0]
    kern = functools.partial(_kernel, s=s, cg=cg, bp=bp, n_sub=n_sub,
                             n_pgs=n_pgs, n_stab=n_stab, msp=msp)
    return pl.pallas_call(
        kern,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, 9), lambda i: (0, 0)),
            pl.BlockSpec((1, _AC, s, cg), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, _AB, bp), lambda i: (i, 0, 0)),
            pl.BlockSpec((cg, bp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 13, bp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 3, s, cg), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, 13, bp), jnp.float32),
            jax.ShapeDtypeStruct((w, 3, s, cg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params[None], con_planes, hi, lo, body_planes, self_body)
