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
            "ii0", "ii1", "ii2", "ii3", "ii4", "ii5", "ii6", "ii7", "ii8",
            # body-local COM offset (zeros for origin-centered bodies):
            # lever arms and integration then track the COM, not the
            # origin (rapier RigidBody::center_of_mass semantics)
            "cmx", "cmy", "cmz")
_BI = {n: i for i, n in enumerate(_B_NAMES)}
_AB = len(_B_NAMES)


def supports_kernel(t, has_com) -> bool:
    """COM offsets and joint sets up to 128 joints run in-kernel (the
    joint tables live on one padded 128-lane axis); larger joint sets
    fall back to the XLA plane path."""
    joints = t.joints
    return joints is None or joints.num_joints <= 128


# -- in-kernel joint constraint math (plane-form, [Jp]-lane) -------------
# jtab static rows: kind, anchor_a3, anchor_b3, axis_a3, ref_rot4,
# com_a3, com_b3 (20). oh_ja/oh_jb [Jp,Bp] one-hot body selectors; pad
# lanes are all-zero rows, so their gathers read 0 and their scatters
# write nothing.
_J_ROWS = 20
_J_ERP = 0.2
_J_POS_ERP = 0.5


def _jrot(q, v):
    """Rotate plane-tuple v by plane-quat q (x,y,z,w)."""
    tx = 2.0 * (q[1] * v[2] - q[2] * v[1])
    ty = 2.0 * (q[2] * v[0] - q[0] * v[2])
    tz = 2.0 * (q[0] * v[1] - q[1] * v[0])
    return (v[0] + q[3] * tx + (q[1] * tz - q[2] * ty),
            v[1] + q[3] * ty + (q[2] * tx - q[0] * tz),
            v[2] + q[3] * tz + (q[0] * ty - q[1] * tx))


def _jqmul(a, b):
    return (a[3] * b[0] + a[0] * b[3] + a[1] * b[2] - a[2] * b[1],
            a[3] * b[1] - a[0] * b[2] + a[1] * b[3] + a[2] * b[0],
            a[3] * b[2] + a[0] * b[1] - a[1] * b[0] + a[2] * b[3],
            a[3] * b[3] - a[0] * b[0] - a[1] * b[1] - a[2] * b[2])


def _jconj(q):
    return (-q[0], -q[1], -q[2], q[3])


def _jcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _jdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _jmv9(m, v):
    return (m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
            m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
            m[6] * v[0] + m[7] * v[1] + m[8] * v[2])


def _jgather(planes, oh):
    """list of [Bp] body planes -> list of [Jp] joint-lane values
    (HIGHEST: one small [A,Bp]x[Bp,Jp] dot, exactness over speed)."""
    mat = jnp.stack(planes)
    out = jax.lax.dot_general(mat, oh, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return [out[i] for i in range(len(planes))]


def _jscatter(vals, oh):
    """list of [Jp] joint deltas -> list of [Bp] body sums (Jacobi
    accumulation across joints sharing a body)."""
    mat = jnp.stack(vals)
    out = jax.lax.dot_general(mat, oh, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return [out[i] for i in range(len(vals))]


def _skew_sandwich(r, m):
    """skew(r) @ M @ skew(r)^T as 9 planes (M row-major 9 planes)."""
    rx, ry, rz = r
    t0 = (-rz * m[3] + ry * m[6], -rz * m[4] + ry * m[7],
          -rz * m[5] + ry * m[8])
    t1 = (rz * m[0] - rx * m[6], rz * m[1] - rx * m[7],
          rz * m[2] - rx * m[8])
    t2 = (-ry * m[0] + rx * m[3], -ry * m[1] + rx * m[4],
          -ry * m[2] + rx * m[5])

    def col(t):
        return (-rz * t[1] + ry * t[2],
                rz * t[0] - rx * t[2],
                -ry * t[0] + rx * t[1])

    c0, c1, c2 = col(t0), col(t1), col(t2)
    return (c0[0], c0[1], c0[2], c1[0], c1[1], c1[2], c2[0], c2[1], c2[2])


def _solve3(m, b):
    """3x3 solve via the adjugate (per-lane scalars; no linalg in
    Mosaic). m: 9 planes row-major (+eps on the diagonal upstream)."""
    c00 = m[4] * m[8] - m[5] * m[7]
    c01 = m[5] * m[6] - m[3] * m[8]
    c02 = m[3] * m[7] - m[4] * m[6]
    det = m[0] * c00 + m[1] * c01 + m[2] * c02
    inv_det = 1.0 / (det + 1e-18)
    c10 = m[2] * m[7] - m[1] * m[8]
    c11 = m[0] * m[8] - m[2] * m[6]
    c12 = m[1] * m[6] - m[0] * m[7]
    c20 = m[1] * m[5] - m[2] * m[4]
    c21 = m[2] * m[3] - m[0] * m[5]
    c22 = m[0] * m[4] - m[1] * m[3]
    return ((c00 * b[0] + c10 * b[1] + c20 * b[2]) * inv_det,
            (c01 * b[0] + c11 * b[1] + c21 * b[2]) * inv_det,
            (c02 * b[0] + c12 * b[1] + c22 * b[2]) * inv_det)


def _joint_frames(jtab, oh_ja, oh_jb, pos, q):
    """Shared gather block: per-joint body poses + world anchors."""
    g = _jgather(list(pos) + list(q), oh_ja)
    pos_a, qa = tuple(g[0:3]), tuple(g[3:7])
    g = _jgather(list(pos) + list(q), oh_jb)
    pos_b, qb = tuple(g[0:3]), tuple(g[3:7])
    anch_a = (jtab[1], jtab[2], jtab[3])
    anch_b = (jtab[4], jtab[5], jtab[6])
    return pos_a, qa, pos_b, qb, anch_a, anch_b


def _joint_velocity_planes(lv, av, pos, q, ii0, im, jtab, oh_ja, oh_jb, h):
    """One Jacobi velocity pass over all joints (joints.py
    solve_joints_velocity semantics, plane-form in-kernel)."""
    kind = jtab[0]
    axis_l = (jtab[7], jtab[8], jtab[9])
    ref_rot = (jtab[10], jtab[11], jtab[12], jtab[13])
    com_a = (jtab[14], jtab[15], jtab[16])
    com_b = (jtab[17], jtab[18], jtab[19])
    pos_a, qa, pos_b, qb, anch_a, anch_b = _joint_frames(
        jtab, oh_ja, oh_jb, pos, q)
    dyn = list(lv) + list(av) + [im] + list(ii0)
    ga = _jgather(dyn, oh_ja)
    gb = _jgather(dyn, oh_jb)
    lv_a, av_a, im_a, ii_a = (tuple(ga[0:3]), tuple(ga[3:6]), ga[6],
                              tuple(ga[7:16]))
    lv_b, av_b, im_b, ii_b = (tuple(gb[0:3]), tuple(gb[3:6]), gb[6],
                              tuple(gb[7:16]))

    ra = _jrot(qa, tuple(a - c for a, c in zip(anch_a, com_a)))
    rb = _jrot(qb, tuple(a - c for a, c in zip(anch_b, com_b)))
    pa = tuple(p + r for p, r in zip(pos_a, _jrot(qa, anch_a)))
    pb = tuple(p + r for p, r in zip(pos_b, _jrot(qb, anch_b)))
    va = tuple(l + c for l, c in zip(lv_a, _jcross(av_a, ra)))
    vb = tuple(l + c for l, c in zip(lv_b, _jcross(av_b, rb)))

    c3 = tuple(b_ - a_ for a_, b_ in zip(pa, pb))
    axis_w0 = _jrot(qa, axis_l)
    is_prism = kind == 3.0
    cdot = _jdot(c3, axis_w0)
    c3 = tuple(jnp.where(is_prism, cc - cdot * ax, cc)
               for cc, ax in zip(c3, axis_w0))
    verr = tuple(vb_ - va_ + (_J_ERP / h) * cc
                 for va_, vb_, cc in zip(va, vb, c3))
    vdot = _jdot(verr, axis_w0)
    verr = tuple(jnp.where(is_prism, ve - vdot * ax, ve)
                 for ve, ax in zip(verr, axis_w0))

    sa = _skew_sandwich(ra, ii_a)
    sb = _skew_sandwich(rb, ii_b)
    imab = im_a + im_b
    k = [x + y for x, y in zip(sa, sb)]
    for d in (0, 4, 8):
        k[d] = k[d] + imab + 1e-9
    imp = _solve3(k, verr)
    imp = tuple(-i for i in imp)

    dlv_a = tuple(-i * im_a for i in imp)
    dlv_b = tuple(i * im_b for i in imp)
    dav_a = _jmv9(ii_a, _jcross(ra, tuple(-i for i in imp)))
    dav_b = _jmv9(ii_b, _jcross(rb, imp))

    # apply the point impulses BEFORE the angular locks: the reference
    # pass (joints.solve_joints_velocity) scatter-adds then re-gathers
    # av, so the locks see the post-point angular velocities — including
    # contributions from OTHER joints sharing a body
    sums_a = _jscatter(list(dlv_a) + list(dav_a), oh_ja)
    sums_b = _jscatter(list(dlv_b) + list(dav_b), oh_jb)
    lv = tuple(l + a_ + b_ for l, a_, b_ in zip(lv, sums_a[0:3],
                                                sums_b[0:3]))
    av = tuple(a0 + a_ + b_ for a0, a_, b_ in zip(av, sums_a[3:6],
                                                  sums_b[3:6]))
    av_a = tuple(_jgather(list(av), oh_ja))
    av_b = tuple(_jgather(list(av), oh_jb))

    # angular locks (FIXED/PRISMATIC full, REVOLUTE minus hinge axis)
    rel_w = tuple(b_ - a_ for a_, b_ in zip(av_a, av_b))
    q_rel = _jqmul(_jconj(qa), qb)
    q_err = _jqmul(_jconj(ref_rot), q_rel)
    sgn = jnp.where(q_err[3] >= 0.0, 1.0, -1.0)
    ang_err = _jrot(qa, (2.0 * q_err[0] * sgn, 2.0 * q_err[1] * sgn,
                         2.0 * q_err[2] * sgn))
    target = tuple(rw + (_J_ERP / h) * ae for rw, ae in zip(rel_w, ang_err))
    tdot = _jdot(target, axis_w0)
    t_rev = tuple(tt - tdot * ax for tt, ax in zip(target, axis_w0))
    full = (kind == 1.0) | (kind == 3.0)
    is_rev = kind == 2.0
    ang_t = tuple(jnp.where(full, tt,
                            jnp.where(is_rev, tr, jnp.zeros_like(tt)))
                  for tt, tr in zip(target, t_rev))
    k_ang = [x + y for x, y in zip(ii_a, ii_b)]
    for d in (0, 4, 8):
        k_ang[d] = k_ang[d] + 1e-9
    ang_imp = _solve3(k_ang, ang_t)
    ang_imp = tuple(-i for i in ang_imp)
    dav_a2 = _jmv9(ii_a, tuple(-i for i in ang_imp))
    dav_b2 = _jmv9(ii_b, ang_imp)

    sums_a = _jscatter(list(dav_a2), oh_ja)
    sums_b = _jscatter(list(dav_b2), oh_jb)
    av = tuple(a0 + a_ + b_ for a0, a_, b_ in zip(av, sums_a, sums_b))
    return lv, av


def _joint_position_planes(pos, q, im, jtab, oh_ja, oh_jb):
    """NGS anchor-separation correction (joints.joint_position_pass)."""
    kind = jtab[0]
    axis_l = (jtab[7], jtab[8], jtab[9])
    pos_a, qa, pos_b, qb, anch_a, anch_b = _joint_frames(
        jtab, oh_ja, oh_jb, pos, q)
    ga = _jgather([im], oh_ja)
    gb = _jgather([im], oh_jb)
    im_a, im_b = ga[0], gb[0]
    ra = _jrot(qa, anch_a)
    rb = _jrot(qb, anch_b)
    c3 = tuple((p_b + r_b) - (p_a + r_a)
               for p_a, r_a, p_b, r_b in zip(pos_a, ra, pos_b, rb))
    axis_w = _jrot(qa, axis_l)
    is_prism = kind == 3.0
    cdot = _jdot(c3, axis_w)
    c3 = tuple(jnp.where(is_prism, cc - cdot * ax, cc)
               for cc, ax in zip(c3, axis_w))
    denom = jnp.maximum(im_a + im_b, 1e-9)
    corr = tuple(_J_POS_ERP * cc for cc in c3)
    d_a = tuple(cc * im_a / denom for cc in corr)
    d_b = tuple(-cc * im_b / denom for cc in corr)
    sums_a = _jscatter(list(d_a), oh_ja)
    sums_b = _jscatter(list(d_b), oh_jb)
    return tuple(p + a_ + b_ for p, a_, b_ in zip(pos, sums_a, sums_b))


def _kernel(params_ref, con_ref, hi_ref, lo_ref, body_ref,
            self_body_ref, *rest, s, cg, bp,
            n_sub, n_pgs, n_stab, msp, has_com=False, has_joints=False):
    i = 0
    joints = None
    if has_joints:
        joints = (rest[0][...], rest[1][...], rest[2][...])
        i = 3
    out_body_ref, out_lam_ref = rest[i], rest[i + 1]
    con = {name: con_ref[0, i2] for name, i2 in _CI.items()}
    body = {name: body_ref[0, i2] for name, i2 in _BI.items()}
    out, lam = solve_planes(params_ref[0], con, body, hi_ref[0], lo_ref[0],
                            self_body_ref[...], s=s, cg=cg, bp=bp,
                            n_sub=n_sub, n_pgs=n_pgs, n_stab=n_stab,
                            msp=msp, has_com=has_com, joints=joints)
    out_body_ref[0] = out
    out_lam_ref[0] = lam


def solve_planes(prm, con, body, hi, lo, self_b, *, s, cg, bp,
                 n_sub, n_pgs, n_stab, msp, has_com=False, joints=None):
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
    cm_l = (bpl("cmx"), bpl("cmy"), bpl("cmz"))
    q0_ = (bpl("qx"), bpl("qy"), bpl("qz"), bpl("qw"))
    if has_com:
        # anchors are frozen per step: lever arms measure from the
        # step-start world COM (XLA path com_w0)
        com_w0 = tuple(p + r for p, r in zip(
            (bpl("px"), bpl("py"), bpl("pz")), _jrot(q0_, cm_l)))
    else:
        com_w0 = (bpl("px"), bpl("py"), bpl("pz"))
    body14 = [im_plane, count_b, com_w0[0], com_w0[1], com_w0[2]] + ii0
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

        if joints is not None:
            jtab, oh_ja, oh_jb = joints
            lv, av = _joint_velocity_planes(
                lv, av, pos, q, ii0, im_plane, jtab, oh_ja, oh_jb, h)

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

        # integrate (COM scenes track the COM linearly and re-derive
        # the origin from the new orientation — XLA substep semantics)
        dq = (q[3] * av[0] + av[1] * q[2] - av[2] * q[1],
              q[3] * av[1] - av[0] * q[2] + av[2] * q[0],
              q[3] * av[2] + av[0] * q[1] - av[1] * q[0],
              -av[0] * q[0] - av[1] * q[1] - av[2] * q[2])
        qn = tuple(qc + 0.5 * h * dc for qc, dc in zip(q, dq))
        inv = jax.lax.rsqrt(qn[0] ** 2 + qn[1] ** 2 + qn[2] ** 2
                            + qn[3] ** 2 + 1e-30)
        q_new = tuple(qc * inv for qc in qn)
        if has_com:
            com = tuple(p + r + h * l for p, r, l in zip(
                pos, _jrot(q, cm_l), lv))
            pos = tuple(c_ - r for c_, r in zip(com, _jrot(q_new, cm_l)))
        else:
            pos = tuple(p + h * l for p, l in zip(pos, lv))
        q = q_new

    if joints is not None:
        jtab, oh_ja, oh_jb = joints
        for _it in range(n_stab):
            pos = _joint_position_planes(pos, q, im_plane, jtab,
                                         oh_ja, oh_jb)

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
        if has_com:
            # rotating about the COM shifts the origin: dtheta x (-R q cm)
            arm = tuple(-r for r in _jrot(q, cm_l))
            shift = (dth[1] * arm[2] - dth[2] * arm[1],
                     dth[2] * arm[0] - dth[0] * arm[2],
                     dth[0] * arm[1] - dth[1] * arm[0])
            pos = tuple(p + sh for p, sh in zip(pos, shift))
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
                     msp=0.5, interpret=False, has_com=False,
                     joint_tables=None):
    """con_planes [W,AC,S,Cg] f32; hi/lo [W,S,Cg] i32; body_planes
    [W,AB,Bp]; self_body [Cg,Bp] one-hot f32; params [9] f32.

    joint_tables: optional (jtab [_J_ROWS,Jp] f32, oh_ja [Jp,Bp],
    oh_jb [Jp,Bp]) static tables — the joint passes then run in-kernel
    (ragdolls keep the fast path). has_com: bodies carry cm* planes.

    Returns (body_out [W,13,Bp], lam_out [W,3,S,Cg])."""
    w = con_planes.shape[0]
    kern = functools.partial(_kernel, s=s, cg=cg, bp=bp, n_sub=n_sub,
                             n_pgs=n_pgs, n_stab=n_stab, msp=msp,
                             has_com=has_com,
                             has_joints=joint_tables is not None)
    extra_in = []
    extra_specs = []
    if joint_tables is not None:
        jtab, oh_ja, oh_jb = joint_tables
        jp = jtab.shape[1]
        extra_in = [jtab, oh_ja, oh_jb]
        extra_specs = [
            pl.BlockSpec((_J_ROWS, jp), lambda i: (0, 0)),
            pl.BlockSpec((jp, bp), lambda i: (0, 0)),
            pl.BlockSpec((jp, bp), lambda i: (0, 0)),
        ]
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
        ] + extra_specs,
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
    )(params[None], con_planes, hi, lo, body_planes, self_body,
      *extra_in)
