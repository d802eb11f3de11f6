"""Batched TGS-soft contact solver.

Replaces rapier's island-based TGS-soft solver (external crate; parameter
semantics documented at fyrox-impl/src/scene/graph/physics/mod.rs:830-908).
rapier's `num_solver_iterations = 4` are *small steps* (substeps) with
`num_internal_pgs_iterations = 1` velocity pass each, plus
`num_internal_stabilization_iterations = 4` position-correction passes —
the same structure implemented here, with two mapping changes for TPU:

  * islands + sequential Gauss-Seidel → dense Jacobi with mass splitting
    (each body's inverse mass/inertia scaled by its constraint count),
    the standard data-parallel equivalent. Cross-step warmstart
    (physics/mod.rs:877, per-substep impulses in the Box2D-v3 bookkeeping)
    provides the integral action that lets resting stacks converge.
  * contact→body gather/scatter has two code paths:
      - static pair lists (no broadphase compaction): one-hot incidence
        matrices [K,B] built at template build time — gathers and scatters
        become MXU matmuls, the fast path;
      - compacted (dynamic) pair slots: take_along_axis / scatter-add.

Per substep h = dt / n_substeps:
  1. integrate external acceleration
  2. warmstart: apply the stored per-substep impulses
  3. one combined PGS pass per contact point: soft normal (contact spring,
     hertz/damping — rapier TGS-soft / Box2D-v3 semantics, prevents
     energy pumping), hard relax (drives vn → 0), friction pyramid
     (|λt| <= μ λn); a single impulse application per pass
  4. integrate positions, advance tracked penetration
Then: restitution pass (target -e·v0n, add-only) and NGS position
stabilization.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core import quat

__all__ = ["ContactBatch", "SolverParams", "solve_tgs", "DirectedSeg",
           "solve_tgs_directed", "segment_bounds"]


class SolverParams(NamedTuple):
    dt: jnp.ndarray
    erp: float = 0.2                       # NGS stabilization factor
    allowed_linear_error: float = 0.002    # physics/mod.rs:849
    max_corrective_velocity: float = 10.0  # :853
    restitution_threshold: float = 1.0
    n_substeps: int = 4                    # num_solver_iterations (:892)
    n_pgs: int = 1                         # num_internal_pgs_iterations
    n_stabilization: int = 4               # num_internal_stabilization_iterations
    stabilization_erp: float = 0.2
    warmstart_coefficient: float = 1.0     # physics/mod.rs:877
    # soft contact spring (rapier contact_natural_frequency equivalents)
    contact_hertz: float = 30.0
    contact_damping_ratio: float = 10.0
    # Jacobi mass-splitting exponent: effective inverse mass per contact is
    # scaled by count^pow. 1.0 = classic mass splitting (guaranteed
    # non-overshoot, but convergence under deep piles is hopeless — a
    # loaded box sees counts of 30+, i.e. 30x under-relaxation). The 0.5
    # default (sqrt splitting) converges ~6x faster and is stabilized by
    # the soft contact spring + per-substep warmstart; measured on the
    # 1k-body pile it removes the bottom-layer collapse entirely
    # (min-y -0.38 -> +0.13 after 5s) with no instability.
    mass_split_pow: float = 0.5


class ContactBatch(NamedTuple):
    """Flattened contact points [.., K].

    body_a/b: [W,K] dynamic slot indices, or [K] static when inc_* given.
    inc_a/inc_b: optional STATIC one-hot incidence [K,B] (numpy/jnp) —
    enables the matmul gather/scatter fast path.
    """
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    normal: jnp.ndarray      # A→B
    point: jnp.ndarray
    depth: jnp.ndarray
    friction: jnp.ndarray
    restitution: jnp.ndarray
    active: jnp.ndarray
    inc_a: Optional[jnp.ndarray] = None
    inc_b: Optional[jnp.ndarray] = None
    # manifold size of each slot's own pair ([K] static) — its own points
    # share a normal and are fully-coherent simultaneous writers, so the
    # mass splitting is exact over them and mass_split_pow applies only
    # across distinct pairs
    own_pts: Optional[jnp.ndarray] = None


def _orthonormal_tangents(n):
    """Two unit tangents orthogonal to n (branch-free Pixar ONB)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], -1)
    t2 = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1, t2


def _make_ops(contacts: ContactBatch):
    """Returns (gath_a, gath_b, scat) closures.

    gath_*(x): [W,B,...] → [W,K,...]
    scat(arr, val_a, val_b): arr + Σ_k val_a into body_a, val_b into body_b
    """
    if contacts.inc_a is not None:
        inc_a = jnp.asarray(contacts.inc_a)
        inc_b = jnp.asarray(contacts.inc_b)
        # NOTE: measured on v5e — one-hot matmul gathers are ~3x faster than
        # XLA gathers with static indices here; both directions use the MXU.
        def gath(inc, x):
            if x.ndim == 2:   # [W,B]
                return jnp.einsum("kb,wb->wk", inc, x, precision="highest")
            if x.ndim == 3:   # [W,B,3]
                return jnp.einsum("kb,wbc->wkc", inc, x, precision="highest")
            return jnp.einsum("kb,wbcd->wkcd", inc, x, precision="highest")

        def scat(arr, val_a, val_b):
            out = arr
            if val_a is not None:
                if val_a.ndim == 2:
                    out = out + jnp.einsum("kb,wk->wb", inc_a, val_a,
                                           precision="highest")
                else:
                    out = out + jnp.einsum("kb,wkc->wbc", inc_a, val_a,
                                           precision="highest")
            if val_b is not None:
                if val_b.ndim == 2:
                    out = out + jnp.einsum("kb,wk->wb", inc_b, val_b,
                                           precision="highest")
                else:
                    out = out + jnp.einsum("kb,wkc->wbc", inc_b, val_b,
                                           precision="highest")
            return out

        return (lambda x: gath(inc_a, x)), (lambda x: gath(inc_b, x)), scat

    ia, ib = contacts.body_a, contacts.body_b

    # Dynamic-incidence fast path for compacted contacts: the contact→body
    # mapping is FIXED within a step, so build one-hot [W,K,B] tensors once
    # and run every gather/scatter as an f32 matmul (the dynamic-scatter
    # path costs ~7ms per scatter at [8,32k]→[8,1k] on v5e; the one-hot
    # matmuls amortize to ~10x less). Gated by memory: the one-hot pair
    # costs 2·W·K·B·4 bytes.
    w = ia.shape[0]

    def take2(arr, idx):
        return jnp.take_along_axis(
            arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1)

    def scat(arr, val_a, val_b):
        rows = jnp.arange(w)[:, None]
        out = arr
        if val_a is not None:
            out = out.at[rows, ia].add(val_a, mode="drop")
        if val_b is not None:
            out = out.at[rows, ib].add(val_b, mode="drop")
        return out

    return (lambda x: take2(x, ia)), (lambda x: take2(x, ib)), scat


def _make_dynamic_incidence_ops(contacts: ContactBatch, num_bodies: int):
    """One-hot [W,K,B] incidence built once per step for compacted
    (dynamic-slot) contacts; all gathers/scatters become f32 matmuls."""
    ia, ib = contacts.body_a, contacts.body_b
    body_ids = jnp.arange(num_bodies, dtype=ia.dtype)
    inc_a = (ia[..., None] == body_ids).astype(jnp.float32)   # [W,K,B]
    inc_b = (ib[..., None] == body_ids).astype(jnp.float32)

    def gath(inc, x):
        if x.ndim == 2:
            return jnp.einsum("wkb,wb->wk", inc, x, precision="highest")
        if x.ndim == 3:
            return jnp.einsum("wkb,wbc->wkc", inc, x, precision="highest")
        return jnp.einsum("wkb,wbcd->wkcd", inc, x, precision="highest")

    def scat(arr, val_a, val_b):
        out = arr
        if val_a is not None:
            if val_a.ndim == 2:
                out = out + jnp.einsum("wkb,wk->wb", inc_a, val_a,
                                       precision="highest")
            else:
                out = out + jnp.einsum("wkb,wkc->wbc", inc_a, val_a,
                                       precision="highest")
        if val_b is not None:
            if val_b.ndim == 2:
                out = out + jnp.einsum("wkb,wk->wb", inc_b, val_b,
                                       precision="highest")
            else:
                out = out + jnp.einsum("wkb,wkc->wbc", inc_b, val_b,
                                       precision="highest")
        return out

    return (lambda x: gath(inc_a, x)), (lambda x: gath(inc_b, x)), scat


class DirectedSeg(NamedTuple):
    """A compacted DIRECTED contact segment from the grid broadphase.

    Each physical contact pair appears twice (once per body's scan); the
    twin slots hold the IDENTICAL canonical manifold, so applying only the
    *self* half of each impulse preserves Newton's third law exactly while
    making every scatter a windowed segment-sum over `body_self`, which is
    sorted by construction (see physics/broadphase.py).

    Shapes: P pairs, n manifold points per pair (1, 2 or 4).
    """
    body_a: jnp.ndarray      # [W,P] canonical A body (normal points A→B)
    body_b: jnp.ndarray      # [W,P]
    sigma: jnp.ndarray       # [W,P] +1 when self == A, else -1
    body_self: jnp.ndarray   # [W,P] scanning body — ascending within a row
    bounds: jnp.ndarray      # [W,B+1] searchsorted(body_self, arange(B+1))
    normal: jnp.ndarray      # [W,P,3] canonical A→B
    point: jnp.ndarray       # [W,P,n,3]
    depth: jnp.ndarray       # [W,P,n]
    active: jnp.ndarray      # [W,P,n] bool
    friction: jnp.ndarray    # [W,P]
    restitution: jnp.ndarray # [W,P]
    window: int              # Mw: max pairs per body in this segment
    # ---- slab-mode statics (None/0 in directed-compaction mode) ----
    # With the slab broadphase the scanning side of every slot is STATIC
    # (slot k belongs to grid collider k // slab_s): self-side gathers are
    # a broadcast of per-collider values, partner-side gathers run through
    # the pallas one-hot MXU kernel, and the scatter is a reshape-sum over
    # each collider's slot window + a static one-hot collider→body matmul.
    slab_swap: jnp.ndarray = None    # [W,P] canonical flip (a=j side)
    slab_body_j: jnp.ndarray = None  # [W,P] partner body
    slab_inc_gb: np.ndarray = None   # [Cg,B] static one-hot f32
    slab_s: int = 0                  # slots per grid collider
    own_pts: jnp.ndarray = None      # [W,P] true manifold size of the pair's
                                     # kind (slab slots are padded to 4 pts;
                                     # mass splitting must not count padding)


def _slab_bcast(seg: DirectedSeg, x):
    """Per-body x [W,B,D] → self-side per-slot values [W,P,D] (broadcast)."""
    w, _, d = x.shape
    xg = jnp.einsum("gb,wbd->wgd", jnp.asarray(seg.slab_inc_gb), x)
    cg = seg.slab_inc_gb.shape[0]
    return jnp.broadcast_to(xg[:, :, None, :], (w, cg, seg.slab_s, d)
                            ).reshape(w, cg * seg.slab_s, d)


def _gather_ab(seg: DirectedSeg, x):
    """x [W,B,D] at (body_a, body_b) → ([W,P,D], [W,P,D])."""
    if seg.slab_s:
        from fyrox_tpu.physics.pallas_ops import gather_rows
        gj = gather_rows(x, seg.slab_body_j)
        gi = _slab_bcast(seg, x)
        sw = seg.slab_swap[..., None]
        return jnp.where(sw, gj, gi), jnp.where(sw, gi, gj)
    a = _seg_gather_pairs(seg, x, seg.body_a)
    b = _seg_gather_pairs(seg, x, seg.body_b)
    return a, b


def segment_bounds(body_self, num_bodies):
    """[W,B+1] start offsets of each body's run in the sorted body_self."""
    w = body_self.shape[0]
    q = jnp.broadcast_to(jnp.arange(num_bodies + 1, dtype=body_self.dtype)[None],
                         (w, num_bodies + 1))
    return jax.vmap(jnp.searchsorted)(body_self, q)


def _seg_gather_pairs(seg: DirectedSeg, x, idx):
    """x [W,B,D] gathered at pair body indices idx [W,P] → [W,P,D]."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def _seg_scatter(seg: DirectedSeg, pair_vals, num_bodies):
    """Windowed segment-sum: pair_vals [W,P,D] → per-body sums [W,B,D].

    body_self is sorted, so body b's pairs occupy bounds[b]..bounds[b+1);
    a static window of `seg.window` slots covers them (values are already
    masked to zero on inactive slots, so over-window zeros are harmless,
    and a genuine overflow drops impulses — size `windows_body` generously).
    """
    w, p = pair_vals.shape[:2]
    d = pair_vals.shape[2]
    if seg.slab_s:
        cg = seg.slab_inc_gb.shape[0]
        per_col = jnp.sum(pair_vals.reshape(w, cg, seg.slab_s, d), axis=2)
        return jnp.einsum("gb,wgd->wbd", jnp.asarray(seg.slab_inc_gb),
                          per_col, precision="highest")
    mw = seg.window
    idx = seg.bounds[:, :-1, None] + jnp.arange(mw, dtype=jnp.int32)  # [W,B,Mw]
    ok = idx < seg.bounds[:, 1:, None]
    idxc = jnp.clip(idx, 0, max(p - 1, 0)).reshape(w, -1)
    g = jnp.take_along_axis(pair_vals, idxc[..., None], axis=1)
    g = g.reshape(w, num_bodies, mw, d)
    return jnp.sum(jnp.where(ok[..., None], g, 0.0), axis=2)


def solve_tgs_directed(position, rotation, linvel, angvel, com_local,
                       inv_mass, inv_inertia_local, gravity_accel,
                       segs, params: SolverParams, warm=None, joints=None):
    """TGS substepped solve over directed contact segments (grid
    broadphase path). Same semantics as solve_tgs; every gather runs at
    pair granularity and every scatter is a windowed segment-sum.

    warm: optional list per segment of (λn, λt1, λt2) [W,P,n] (already
    masked to slots still holding the same pair).
    Returns (pos, rot, linvel, angvel, lam_out) with lam_out a list per
    segment of (λn, λt1, λt2).
    """
    eps = 1e-12
    dtype = position.dtype
    h = params.dt / params.n_substeps
    w, b = position.shape[:2]
    segs = [s for s in segs if s.body_a.shape[1] > 0]
    has_contacts = len(segs) > 0

    com_np = np.asarray(com_local) if not isinstance(com_local, jax.core.Tracer) else None
    has_com_offset = com_np is None or bool(np.any(com_np))

    rmat0 = quat.to_mat3(rotation)
    ii_world0 = quat.sandwich_inv_inertia(rmat0, jnp.asarray(inv_inertia_local))
    com_off0 = quat.rotate(rotation, jnp.broadcast_to(com_local[None],
                                                      rotation.shape[:2] + (3,)))
    com_w0 = position + com_off0
    imass = jnp.asarray(inv_mass)

    # ---- per-segment constraint prep (once per step) ----
    if has_contacts:
        # mass splitting: per-body count of active PAIRS (a manifold's own
        # points are coherent writers — full split over them via the npts
        # factor below; count^pow across distinct pairs)
        count = jnp.zeros((w, b), dtype)
        for seg in segs:
            own = (seg.own_pts if seg.own_pts is not None
                   else jnp.asarray(float(seg.active.shape[2]), dtype))
            actp = (jnp.sum(seg.active.astype(dtype), axis=2)
                    / own)[..., None]
            count = count + _seg_scatter(seg, actp, b)[..., 0]
        count = jnp.maximum(count, 1.0)
        if params.mass_split_pow != 1.0:
            count = count ** params.mass_split_pow

    imass_wb = jnp.broadcast_to(imass[None, :], (w, b)) if imass.ndim == 1 else imass

    preps = []
    for seg in segs:
        n = seg.normal
        t1, t2 = _orthonormal_tangents(n)
        actf = seg.active.astype(dtype)
        # one fused 14-attribute gather per side (imass | count | com | ii):
        # the MXU one-hot gather costs the same for 1 or 128 attributes
        body14 = jnp.concatenate([imass_wb[..., None], count[..., None],
                                  com_w0, ii_world0.reshape(w, b, 9)], -1)
        pa14, pb14 = _gather_ab(seg, body14)
        im_a, im_b = pa14[..., 0], pb14[..., 0]                       # [W,P]
        im_s = jnp.where(seg.sigma > 0, im_a, im_b)
        own = (seg.own_pts if seg.own_pts is not None
               else jnp.asarray(float(seg.active.shape[2]), dtype))
        cnt_a = pa14[..., 1] * own
        cnt_b = pb14[..., 1] * own
        com_a = pa14[..., 2:5]                                        # [W,P,3]
        com_b = pb14[..., 2:5]
        r_a = seg.point - com_a[:, :, None, :]                        # [W,P,n,3]
        r_b = seg.point - com_b[:, :, None, :]
        r_s = jnp.where((seg.sigma > 0)[..., None, None], r_a, r_b)
        ii_a = pa14[..., 5:14].reshape(w, -1, 3, 3)
        ii_b = pb14[..., 5:14].reshape(w, -1, 3, 3)

        def eff_mass(d, ii_a=ii_a, ii_b=ii_b, r_a=r_a, r_b=r_b,
                     im_a=im_a, im_b=im_b, cnt_a=cnt_a, cnt_b=cnt_b):
            rxd_a = jnp.cross(r_a, d)                                 # [W,P,n,3]
            rxd_b = jnp.cross(r_b, d)
            ang_a = quat.mvb(ii_a, rxd_a)
            ang_b = quat.mvb(ii_b, rxd_b)
            k_ = ((im_a * cnt_a + im_b * cnt_b)[..., None]
                  + cnt_a[..., None] * jnp.sum(rxd_a * ang_a, -1)
                  + cnt_b[..., None] * jnp.sum(rxd_b * ang_b, -1))
            return 1.0 / jnp.maximum(k_, eps)

        nn = n[:, :, None, :]
        m_n = eff_mass(nn)
        m_t1 = eff_mass(t1[:, :, None, :])
        m_t2 = eff_mass(t2[:, :, None, :])
        preps.append(dict(n=n, t1=t1, t2=t2, actf=actf, im_s=im_s,
                          r_a=r_a, r_b=r_b, r_s=r_s,
                          m_n=m_n, m_t1=m_t1, m_t2=m_t2))

    def rel_vel(seg, prep, lv, av):
        """[W,P,n,3] relative velocity at each manifold point."""
        va6, vb6 = _gather_ab(seg, jnp.concatenate([lv, av], -1))
        va = va6[..., None, :3] + jnp.cross(va6[..., None, 3:], prep["r_a"])
        vb = vb6[..., None, :3] + jnp.cross(vb6[..., None, 3:], prep["r_b"])
        return vb - va

    def apply_all(lv, av, imps):
        """imps: list per segment of [W,P,n,3] impulse (A-convention:
        applied -imp to A, +imp to B). Apply the SELF halves."""
        dlin = jnp.zeros((w, b, 3), dtype)
        dtorq = jnp.zeros((w, b, 3), dtype)
        for seg, prep, imp in zip(segs, preps, imps):
            sgn = -seg.sigma[..., None, None]        # self impulse sign
            imp_s = sgn * imp                         # [W,P,n,3]
            lin_pair = jnp.sum(imp_s, axis=2) * prep["im_s"][..., None]
            torq_pair = jnp.sum(jnp.cross(prep["r_s"], imp_s), axis=2)
            both = jnp.concatenate([lin_pair, torq_pair], -1)     # [W,P,6]
            sc = _seg_scatter(seg, both, b)
            dlin = dlin + sc[..., :3]
            dtorq = dtorq + sc[..., 3:]
        lv = lv + dlin
        av = av + quat.mv(ii_world0, dtorq)
        return lv, av

    # restitution targets from pre-step approach velocity
    rest_targets = []
    if has_contacts:
        for seg, prep in zip(segs, preps):
            rv0 = rel_vel(seg, prep, linvel, angvel)
            v0n = jnp.sum(rv0 * prep["n"][:, :, None, :], -1)
            rest_targets.append(jnp.where(
                v0n < -params.restitution_threshold,
                -seg.restitution[..., None] * v0n, 0.0))

    if warm is None:
        warm = [tuple(jnp.zeros_like(s.depth) for _ in range(3)) for s in segs]
    else:
        warm = [tuple(v * p["actf"] for v in wm)
                for wm, p in zip(warm, preps)]

    # soft-spring coefficients at substep scale
    omega = 2.0 * np.pi * params.contact_hertz
    zeta = params.contact_damping_ratio
    csoft = h * omega * (2.0 * zeta + h * omega)
    bias_rate = omega / (2.0 * zeta + h * omega)
    mass_scale_soft = csoft / (1.0 + csoft)
    imp_scale_soft = 1.0 / (1.0 + csoft)

    def substep(carry, _):
        pos, rot, lv, av, depths, lams, lam_mxs = carry
        lv = lv + h * gravity_accel

        if joints is not None and joints.num_joints > 0:
            from fyrox_tpu.physics import joints as joints_mod
            lv, av = joints_mod.solve_joints_velocity(
                pos, rot, lv, av, inv_mass, ii_world0, joints, h)

        if has_contacts:
            wc = params.warmstart_coefficient
            lams = [tuple(l * wc for l in lam) for lam in lams]
            imps = [lam[0][..., None] * p["n"][:, :, None, :]
                    + lam[1][..., None] * p["t1"][:, :, None, :]
                    + lam[2][..., None] * p["t2"][:, :, None, :]
                    for lam, p in zip(lams, preps)]
            lv, av = apply_all(lv, av, imps)

            for _pgs in range(params.n_pgs):
                new_lams, imps = [], []
                for seg, prep, lam, depth_cur in zip(segs, preps, lams, depths):
                    lam_n, lam_t1, lam_t2 = lam
                    n3 = prep["n"][:, :, None, :]
                    rv = rel_vel(seg, prep, lv, av)
                    vn = jnp.sum(rv * n3, -1)
                    sep = -(depth_cur - params.allowed_linear_error)
                    bias = jnp.where(sep > 0.0, sep / h,
                                     jnp.maximum(bias_rate * sep,
                                                 -params.max_corrective_velocity))
                    mscale = jnp.where(sep > 0.0, 1.0, mass_scale_soft)
                    iscale = jnp.where(sep > 0.0, 0.0, imp_scale_soft)
                    dl = (-prep["m_n"] * mscale * (vn + bias)
                          - iscale * lam_n) * prep["actf"]
                    new_n = jnp.maximum(lam_n + dl, 0.0)
                    d1 = new_n - lam_n
                    vn2 = vn + d1 / prep["m_n"]
                    # hard relax → vn = 0 for touching contacts; separated
                    # (speculative) ones keep the sep/h approach limit, or
                    # resting stacks would levitate at the activation
                    # distance (Box2D v3 keeps bias=s/h in no-bias passes)
                    spec = jnp.where(sep > 0.0, bias, 0.0)
                    dl2 = -prep["m_n"] * (vn2 + spec) * prep["actf"]
                    new_n2 = jnp.maximum(new_n + dl2, 0.0)
                    dn = new_n2 - lam_n
                    lam_n = new_n2
                    max_f = seg.friction[..., None] * lam_n
                    vt1 = jnp.sum(rv * prep["t1"][:, :, None, :], -1)
                    new1 = jnp.clip(lam_t1 - prep["m_t1"] * vt1 * prep["actf"],
                                    -max_f, max_f)
                    dt1 = new1 - lam_t1
                    lam_t1 = new1
                    vt2 = jnp.sum(rv * prep["t2"][:, :, None, :], -1)
                    new2 = jnp.clip(lam_t2 - prep["m_t2"] * vt2 * prep["actf"],
                                    -max_f, max_f)
                    dt2 = new2 - lam_t2
                    lam_t2 = new2
                    imps.append(dn[..., None] * n3
                                + dt1[..., None] * prep["t1"][:, :, None, :]
                                + dt2[..., None] * prep["t2"][:, :, None, :])
                    new_lams.append((lam_n, lam_t1, lam_t2))
                lams = new_lams
                lv, av = apply_all(lv, av, imps)

            lam_mxs = [jnp.maximum(mx, lam[0])
                       for mx, lam in zip(lam_mxs, lams)]
            new_depths = []
            for seg, prep, depth_cur in zip(segs, preps, depths):
                vn_end = jnp.sum(rel_vel(seg, prep, lv, av)
                                 * prep["n"][:, :, None, :], -1)
                new_depths.append(depth_cur - h * vn_end)
            depths = new_depths

        dq = 0.5 * h * quat.mul(
            jnp.concatenate([av, jnp.zeros_like(av[..., :1])], -1), rot)
        new_rot = quat.normalize(rot + dq)
        if has_com_offset:
            com_b3 = jnp.broadcast_to(jnp.asarray(com_local)[None], pos.shape)
            com = pos + quat.rotate(rot, com_b3) + h * lv
            pos = com - quat.rotate(new_rot, com_b3)
        else:
            pos = pos + h * lv
        rot = new_rot
        return (pos, rot, lv, av, depths, lams, lam_mxs), None

    depths0 = [s.depth for s in segs]
    lam_mxs0 = [jnp.zeros_like(s.depth) for s in segs]
    carry = (position, rotation, linvel, angvel, depths0, list(warm), lam_mxs0)
    carry, _ = jax.lax.scan(substep, carry, None, length=params.n_substeps)
    pos, rot, lv, av, depths, lams, lam_mxs = carry

    if joints is not None and joints.num_joints > 0:
        from fyrox_tpu.physics import joints as joints_mod
        for _ in range(params.n_stabilization):
            pos = joints_mod.joint_position_pass(pos, rot, inv_mass, joints)

    if not has_contacts:
        return pos, rot, lv, av, []

    # ---- restitution pass (gated on max λ over substeps, see solve_tgs) ----
    imps, new_lams = [], []
    for seg, prep, lam, rt, mx in zip(segs, preps, lams, rest_targets, lam_mxs):
        n3 = prep["n"][:, :, None, :]
        vn = jnp.sum(rel_vel(seg, prep, lv, av) * n3, -1)
        dl = jnp.maximum(-prep["m_n"] * (vn - rt), 0.0) * prep["actf"] \
            * (mx > 0.0)
        imps.append(dl[..., None] * n3)
        new_lams.append((lam[0] + dl, lam[1], lam[2]))
    lams = new_lams
    lv, av = apply_all(lv, av, imps)

    # ---- NGS position stabilization ----
    if params.n_stabilization > 0:
        def stab(carry, _):
            pos_, rot_, depths_ = carry
            dpos = jnp.zeros((w, b, 3), dtype)
            dtorq = jnp.zeros((w, b, 3), dtype)
            p_imps = []
            for seg, prep, depth_ in zip(segs, preps, depths_):
                corr = params.stabilization_erp * jnp.maximum(
                    depth_ - params.allowed_linear_error, 0.0)
                p_imp = prep["m_n"] * corr * prep["actf"]
                imp_d = p_imp[..., None] * prep["n"][:, :, None, :]
                p_imps.append(imp_d)
                sgn = -seg.sigma[..., None, None]
                imp_s = sgn * imp_d
                lin_pair = jnp.sum(imp_s, axis=2) * prep["im_s"][..., None]
                torq_pair = jnp.sum(jnp.cross(prep["r_s"], imp_s), axis=2)
                both = jnp.concatenate([lin_pair, torq_pair], -1)
                sc = _seg_scatter(seg, both, b)
                dpos = dpos + sc[..., :3]
                dtorq = dtorq + sc[..., 3:]
            dtheta = quat.mv(ii_world0, dtorq)
            pos_ = pos_ + dpos
            if has_com_offset:
                com_b3 = jnp.broadcast_to(jnp.asarray(com_local)[None],
                                          pos_.shape)
                pos_ = pos_ + jnp.cross(dtheta, -quat.rotate(rot_, com_b3))
            dq = 0.5 * quat.mul(
                jnp.concatenate([dtheta, jnp.zeros_like(dtheta[..., :1])], -1),
                rot_)
            rot_ = quat.normalize(rot_ + dq)
            new_depths = []
            for seg, prep, depth_ in zip(segs, preps, depths_):
                da6, db6 = _gather_ab(seg, jnp.concatenate([dpos, dtheta], -1))
                rel_corr = ((db6[..., None, :3] + jnp.cross(db6[..., None, 3:], prep["r_b"]))
                            - (da6[..., None, :3] + jnp.cross(da6[..., None, 3:], prep["r_a"])))
                new_depths.append(depth_ - jnp.sum(
                    rel_corr * prep["n"][:, :, None, :], -1))
            return (pos_, rot_, new_depths), None

        (pos, rot, _), _ = jax.lax.scan(stab, (pos, rot, depths), None,
                                        length=params.n_stabilization)

    return pos, rot, lv, av, lams


def solve_tgs(position, rotation, linvel, angvel, com_local,
              inv_mass, inv_inertia_local, gravity_accel,
              contacts: ContactBatch, params: SolverParams,
              warm=None, joints=None):
    """TGS substepped solve + integrate. Returns
    (pos, rot, linvel, angvel, (λn, λt1, λt2) or None)."""
    eps = 1e-12
    dtype = position.dtype
    h = params.dt / params.n_substeps
    has_contacts = contacts is not None
    w, b = position.shape[:2]
    # Rigid-body translation state is the body ORIGIN, but linvel is the COM
    # velocity: a torque-free spinning body must keep its COM fixed while the
    # origin orbits it. When every COM offset is zero (the common case) the
    # origin IS the COM and the conversion is skipped at trace time.
    com_np = np.asarray(com_local) if not isinstance(com_local, jax.core.Tracer) else None
    has_com_offset = com_np is None or bool(np.any(com_np))

    def body_kinematics(rot):
        rmat = quat.to_mat3(rot)
        ii_world = quat.sandwich_inv_inertia(rmat, jnp.asarray(inv_inertia_local))
        com_off = quat.rotate(rot, jnp.broadcast_to(com_local[None],
                                                    rot.shape[:2] + (3,)))
        return ii_world, com_off

    if has_contacts:
        if (contacts.inc_a is None and contacts.body_a.ndim == 2):
            kk = contacts.body_a.shape[1]
            onehot_bytes = 2 * w * kk * b * 4
            if onehot_bytes <= (2 << 30):
                gath_a, gath_b, scat = _make_dynamic_incidence_ops(contacts, b)
            else:
                gath_a, gath_b, scat = _make_ops(contacts)
        else:
            gath_a, gath_b, scat = _make_ops(contacts)
        act = contacts.active
        actf = act.astype(dtype)
        n = contacts.normal
        t1, t2 = _orthonormal_tangents(n)

        # mass splitting: full split over a manifold's own points (their
        # shared normal makes them coherent writers), count^pow across
        # distinct pairs (see SolverParams.mass_split_pow)
        own = (jnp.asarray(contacts.own_pts, dtype)
               if contacts.own_pts is not None else jnp.asarray(4.0, dtype))
        count = scat(jnp.zeros((w, b), dtype), actf / own, actf / own)
        count = jnp.maximum(count, 1.0)
        if params.mass_split_pow != 1.0:
            count = count ** params.mass_split_pow
        cnt_a = gath_a(count) * own
        cnt_b = gath_b(count) * own
        im_a_raw = gath_a(inv_mass)
        im_b_raw = gath_b(inv_mass)
        im_a = im_a_raw * cnt_a
        im_b = im_b_raw * cnt_b

        # restitution target from the pre-step approach velocity
        ii_w0, com_off0 = body_kinematics(rotation)
        com_w0 = position + com_off0
        r_a0 = contacts.point - gath_a(com_w0)
        r_b0 = contacts.point - gath_b(com_w0)
        va0 = gath_a(linvel) + jnp.cross(gath_a(angvel), r_a0)
        vb0 = gath_b(linvel) + jnp.cross(gath_b(angvel), r_b0)
        v0n = jnp.sum((vb0 - va0) * n, -1)
        rest_target = jnp.where(v0n < -params.restitution_threshold,
                                -contacts.restitution * v0n, 0.0)

        zk = jnp.zeros(contacts.depth.shape, dtype)
        if warm is None:
            warm_n, warm_t1, warm_t2 = zk, zk, zk
        else:
            warm_n, warm_t1, warm_t2 = (v * actf for v in warm)

    else:
        zk = jnp.zeros((w, 1), dtype)
        warm_n = warm_t1 = warm_t2 = zk

    # ---- prepare the contact frame ONCE per step (fixed anchors/masses,
    # the standard constraint-prep linearization: rapier/Box2D also prepare
    # constraints once and reuse them across substeps). Angular impulse
    # application happens in BODY space (scatter torques, then one per-body
    # I^-1 multiply) so no [W,K,3,3] inertia gathers appear in the substep
    # loop — that was the HBM bottleneck of the naive formulation. ----
    if has_contacts:
        ii_world0 = ii_w0
        r_a = contacts.point - gath_a(com_w0)
        r_b = contacts.point - gath_b(com_w0)
        ii_a_k = gath_a(ii_world0)     # one-time [W,K,3,3] gathers for masses
        ii_b_k = gath_b(ii_world0)

        def eff_mass(d):
            rxd_a = jnp.cross(r_a, d)
            rxd_b = jnp.cross(r_b, d)
            ang_a = quat.mv(ii_a_k, rxd_a)
            ang_b = quat.mv(ii_b_k, rxd_b)
            k_ = (im_a_raw * cnt_a + im_b_raw * cnt_b
                  + cnt_a * jnp.sum(rxd_a * ang_a, -1)
                  + cnt_b * jnp.sum(rxd_b * ang_b, -1))
            return 1.0 / jnp.maximum(k_, eps)

        m_n = eff_mass(n)
        m_t1 = eff_mass(t1)
        m_t2 = eff_mass(t2)

        def rel_vel(lv_, av_):
            va = gath_a(lv_) + jnp.cross(gath_a(av_), r_a)
            vb = gath_b(lv_) + jnp.cross(gath_b(av_), r_b)
            return vb - va

        def apply_imp(lv_, av_, imp_d):
            lv_ = scat(lv_, -imp_d * im_a_raw[..., None], imp_d * im_b_raw[..., None])
            torque = scat(jnp.zeros_like(lv_), jnp.cross(r_a, -imp_d),
                          jnp.cross(r_b, imp_d))
            av_ = av_ + quat.mv(ii_world0, torque)
            return lv_, av_

    ii_w_all, _com_off_all = body_kinematics(rotation)

    def substep(carry, _):
        pos, rot, lv, av, depth_cur, lam_n, lam_t1, lam_t2, lam_mx = carry
        lv = lv + h * gravity_accel

        if joints is not None and joints.num_joints > 0:
            from fyrox_tpu.physics import joints as joints_mod
            lv, av = joints_mod.solve_joints_velocity(
                pos, rot, lv, av, inv_mass, ii_w_all, joints, h)

        if has_contacts:
            # ---- warmstart this substep (Box2D-v3 per-substep impulses) ----
            wc = params.warmstart_coefficient
            lam_n = lam_n * wc
            lam_t1 = lam_t1 * wc
            lam_t2 = lam_t2 * wc
            warm_imp = (lam_n[..., None] * n + lam_t1[..., None] * t1
                        + lam_t2[..., None] * t2)
            lv, av = apply_imp(lv, av, warm_imp)

            # soft-spring coefficients at substep scale
            omega = 2.0 * np.pi * params.contact_hertz
            zeta = params.contact_damping_ratio
            csoft = h * omega * (2.0 * zeta + h * omega)
            bias_rate = omega / (2.0 * zeta + h * omega)
            mass_scale_soft = csoft / (1.0 + csoft)
            imp_scale_soft = 1.0 / (1.0 + csoft)
            sep = -(depth_cur - params.allowed_linear_error)  # <0 penetrating
            bias = jnp.where(sep > 0.0, sep / h,
                             jnp.maximum(bias_rate * sep,
                                         -params.max_corrective_velocity))
            mscale = jnp.where(sep > 0.0, 1.0, mass_scale_soft)
            iscale = jnp.where(sep > 0.0, 0.0, imp_scale_soft)

            # one combined impulse application per PGS pass
            for _pgs in range(params.n_pgs):
                rv = rel_vel(lv, av)
                vn = jnp.sum(rv * n, -1)
                dl = (-m_n * mscale * (vn + bias) - iscale * lam_n) * actf
                new_n = jnp.maximum(lam_n + dl, 0.0)
                d1 = new_n - lam_n
                vn2 = vn + d1 / m_n           # local post-soft estimate
                # hard relax → vn = 0 for touching contacts; separated
                # (speculative) ones keep the sep/h approach limit, or
                # resting stacks would levitate at the activation distance
                # (Box2D v3 keeps bias=s/h in its no-bias passes too)
                spec = jnp.where(sep > 0.0, bias, 0.0)
                dl2 = -m_n * (vn2 + spec) * actf
                new_n2 = jnp.maximum(new_n + dl2, 0.0)
                dn = new_n2 - lam_n
                lam_n = new_n2
                max_f = contacts.friction * lam_n
                vt1 = jnp.sum(rv * t1, -1)
                new1 = jnp.clip(lam_t1 - m_t1 * vt1 * actf, -max_f, max_f)
                dt1 = new1 - lam_t1
                lam_t1 = new1
                vt2 = jnp.sum(rv * t2, -1)
                new2 = jnp.clip(lam_t2 - m_t2 * vt2 * actf, -max_f, max_f)
                dt2 = new2 - lam_t2
                lam_t2 = new2
                imp = (dn[..., None] * n + dt1[..., None] * t1
                       + dt2[..., None] * t2)
                lv, av = apply_imp(lv, av, imp)

            lam_mx = jnp.maximum(lam_mx, lam_n)
            vn_end = jnp.sum(rel_vel(lv, av) * n, -1)
            depth_cur = depth_cur - h * vn_end

        dq = 0.5 * h * quat.mul(
            jnp.concatenate([av, jnp.zeros_like(av[..., :1])], -1), rot)
        new_rot = quat.normalize(rot + dq)
        if has_com_offset:
            com_b = jnp.broadcast_to(jnp.asarray(com_local)[None],
                                     pos.shape)
            com = pos + quat.rotate(rot, com_b) + h * lv
            pos = com - quat.rotate(new_rot, com_b)
        else:
            pos = pos + h * lv
        rot = new_rot
        return (pos, rot, lv, av, depth_cur, lam_n, lam_t1, lam_t2, lam_mx), None

    depth0 = contacts.depth if has_contacts else zk
    carry = (position, rotation, linvel, angvel, depth0,
             warm_n, warm_t1, warm_t2, jnp.zeros_like(warm_n))
    carry, _ = jax.lax.scan(substep, carry, None, length=params.n_substeps)
    pos, rot, lv, av, depth_cur, lam_n, lam_t1_f, lam_t2_f, lam_mx = carry

    if joints is not None and joints.num_joints > 0:
        from fyrox_tpu.physics import joints as joints_mod
        for _ in range(params.n_stabilization):
            pos = joints_mod.joint_position_pass(pos, rot, inv_mass, joints)

    if not has_contacts:
        return pos, rot, lv, av, None

    # ---- restitution pass: one add-only impulse so the final separating
    # velocity reaches -e * v0n (kept out of the substep loop so later
    # substeps cannot unwind the bounce) ----
    # gate on the MAX λ over substeps (Box2D-v3 maxNormalImpulse): the final
    # λ legitimately unwinds to ~0 on substeps where the accumulated impulse
    # was re-applied by the warmstart, so it cannot be the contact evidence
    vn = jnp.sum(rel_vel(lv, av) * n, -1)
    dl = jnp.maximum(-m_n * (vn - rest_target), 0.0) * actf * (lam_mx > 0.0)
    lv, av = apply_imp(lv, av, dl[..., None] * n)
    lam_n = lam_n + dl

    # ---- NGS position stabilization (rapier stabilization iterations) ----
    if params.n_stabilization > 0:
        m_pos = m_n

        def stab(carry, _):
            pos_, rot_, depth_ = carry
            corr = params.stabilization_erp * jnp.maximum(
                depth_ - params.allowed_linear_error, 0.0)
            p_imp = m_pos * corr * actf
            imp_d = p_imp[..., None] * n
            dpos = scat(jnp.zeros_like(pos_), -imp_d * im_a_raw[..., None],
                        imp_d * im_b_raw[..., None])
            torque = scat(jnp.zeros_like(pos_), jnp.cross(r_a, -imp_d),
                          jnp.cross(r_b, imp_d))
            dtheta = quat.mv(ii_world0, torque)
            pos_ = pos_ + dpos
            if has_com_offset:
                # NGS rotates about the COM; the origin sits at -com_off
                # from it and must follow: dorigin = dtheta x (-com_off).
                com_b = jnp.broadcast_to(jnp.asarray(com_local)[None],
                                         pos_.shape)
                pos_ = pos_ + jnp.cross(dtheta, -quat.rotate(rot_, com_b))
            dq = 0.5 * quat.mul(
                jnp.concatenate([dtheta, jnp.zeros_like(dtheta[..., :1])], -1), rot_)
            rot_ = quat.normalize(rot_ + dq)
            rel_corr = ((gath_b(dpos) + jnp.cross(gath_b(dtheta), r_b))
                        - (gath_a(dpos) + jnp.cross(gath_a(dtheta), r_a)))
            depth_ = depth_ - jnp.sum(rel_corr * n, -1)
            return (pos_, rot_, depth_), None

        (pos, rot, _), _ = jax.lax.scan(stab, (pos, rot, depth_cur), None,
                                        length=params.n_stabilization)

    return pos, rot, lv, av, (lam_n, lam_t1_f, lam_t2_f)
