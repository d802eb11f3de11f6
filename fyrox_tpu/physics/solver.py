"""Batched TGS-soft contact solver.

Replaces rapier's island-based TGS-soft solver (external crate; parameter
semantics documented at fyrox-impl/src/scene/graph/physics/mod.rs:830-908).
rapier's `num_solver_iterations = 4` are *small steps* (substeps) with
`num_internal_pgs_iterations = 1` velocity pass each, followed by
`num_internal_stabilization_iterations = 4` position-correction passes —
the same structure implemented here, with one mapping change for TPU:

  islands + per-contact sequential Gauss-Seidel → dense Jacobi with mass
  splitting (each body's inverse mass/inertia scaled by its constraint
  count), the standard data-parallel equivalent that keeps the parallel
  update contractive. Everything is fixed-shape: inactive contact slots
  carry zero impulses.

Per substep h = dt / n_substeps:
  1. integrate gravity/forces into velocities
  2. one (or more) Jacobi velocity passes per contact point:
       normal: Δλ = -m_eff (v_n - target), accumulated λ >= 0
               target = max(restitution_target, bias) with
               bias = (erp/h) * max(pen - allowed_linear_error, 0) capped by
               normalized_max_corrective_velocity (physics/mod.rs:852-854)
       friction: |λ_t| <= μ λ_n, box-clamped per tangent
  3. integrate positions, advance tracked penetration by the relative
     normal velocity (TGS: bias sees up-to-date penetration each substep)
After all substeps: NGS position stabilization (pseudo-impulses applied
directly to positions/rotations), mirroring rapier's stabilization pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fyrox_tpu.core import quat

__all__ = ["ContactBatch", "SolverParams", "solve_tgs"]


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
    # soft contact spring (TGS-soft / Box2D-v3 semantics; rapier's
    # contact_natural_frequency): prevents warmstart+bias energy pumping
    contact_hertz: float = 30.0
    contact_damping_ratio: float = 10.0


class ContactBatch(NamedTuple):
    """Flattened contact points. Indices are per-world [W,K]; geometry
    [W,K,3]."""
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    normal: jnp.ndarray      # A→B
    point: jnp.ndarray
    depth: jnp.ndarray
    friction: jnp.ndarray
    restitution: jnp.ndarray
    active: jnp.ndarray


def _orthonormal_tangents(n):
    """Two unit tangents orthogonal to n (branch-free Pixar ONB)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], -1)
    t2 = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1, t2


def _take2(arr, idx):
    """arr [W,B,...] gathered with per-world idx [W,K] → [W,K,...]."""
    return jnp.take_along_axis(arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)),
                               axis=1)


def _scatter_add2(arr, idx, val):
    return arr.at[jnp.arange(arr.shape[0])[:, None], idx].add(val, mode="drop")


def solve_tgs(position, rotation, linvel, angvel, com_local,
              inv_mass, inv_inertia_local, gravity_accel,
              contacts: ContactBatch, params: SolverParams,
              warm=None):
    """TGS substepped solve + integrate.

    position/rotation/linvel/angvel: [W,B,...]; com_local [B,3] (body-frame
    center of mass); inv_mass [W,B]; inv_inertia_local [B,3,3];
    gravity_accel [W,B,3] (already includes gravity_scale + external
    forces/mass — applied per substep).

    warm: optional (λn, λt1, λt2) [W,K] from the previous step, matched by
    contact slot (valid because the candidate pair list is static). Applied
    as initial impulses scaled by warmstart_coefficient — the rapier
    warmstart semantics (physics/mod.rs:877, default 1.0), which is what
    lets resting stacks converge with only 4 substeps x 1 PGS iteration.

    Returns (pos, rot, linvel, angvel, (λn, λt1, λt2)).
    """
    eps = 1e-12
    dtype = position.dtype
    h = params.dt / params.n_substeps
    has_contacts = contacts is not None
    w, b = position.shape[:2]

    if has_contacts:
        ia, ib = contacts.body_a, contacts.body_b
        act = contacts.active
        actf = act.astype(dtype)
        n = contacts.normal
        t1, t2 = _orthonormal_tangents(n)

        # mass splitting: constraint counts per body
        count = jnp.zeros((w, b), dtype)
        count = _scatter_add2(count, ia, actf)
        count = _scatter_add2(count, ib, actf)
        count = jnp.maximum(count, 1.0)

    def body_kinematics(rot):
        rmat = quat.to_mat3(rot)
        ii_world = jnp.einsum("wbij,bjk,wblk->wbil", rmat,
                              jnp.asarray(inv_inertia_local), rmat,
                              precision="highest")
        com_world_off = quat.rotate(rot, jnp.broadcast_to(com_local[None], rot.shape[:2] + (3,)))
        return ii_world, com_world_off

    # restitution target: from the approach velocity at step start (persists
    # across substeps — otherwise later substeps unwind the bounce impulse)
    if has_contacts:
        ii0, com_off0 = None, None
        rmat0 = quat.to_mat3(rotation)
        com_w0 = position + quat.rotate(rotation,
                                        jnp.broadcast_to(com_local[None],
                                                         rotation.shape[:2] + (3,)))
        r_a0 = contacts.point - _take2(com_w0, contacts.body_a)
        r_b0 = contacts.point - _take2(com_w0, contacts.body_b)
        va0 = _take2(linvel, contacts.body_a) + jnp.cross(_take2(angvel, contacts.body_a), r_a0)
        vb0 = _take2(linvel, contacts.body_b) + jnp.cross(_take2(angvel, contacts.body_b), r_b0)
        v0n = jnp.sum((vb0 - va0) * contacts.normal, -1)
        rest_target = jnp.where(v0n < -params.restitution_threshold,
                                -contacts.restitution * v0n, 0.0)

    # λ stores are PER-SUBSTEP impulses (≈ force·h), warmstarted at every
    # substep — the Box2D-v3 bookkeeping. The previous step's final substep
    # impulses seed the first substep here.
    warm_n = warm_t1 = warm_t2 = None
    if has_contacts:
        zk = jnp.zeros(contacts.depth.shape, dtype)
        if warm is None:
            warm_n, warm_t1, warm_t2 = zk, zk, zk
        else:
            warm_n, warm_t1, warm_t2 = (v * actf for v in warm)

    def substep(carry, _):
        pos, rot, lv, av, depth_cur, lam_n, lam_t1, lam_t2 = carry
        # ---- 1. external acceleration ----
        lv = lv + h * gravity_accel

        ii_world, com_off = body_kinematics(rot)

        if has_contacts:
            com_world = pos + com_off
            r_a = contacts.point - _take2(com_world, ia)
            r_b = contacts.point - _take2(com_world, ib)
            im_a = _take2(inv_mass[..., None], ia)[..., 0] * _take2(count[..., None], ia)[..., 0]
            im_b = _take2(inv_mass[..., None], ib)[..., 0] * _take2(count[..., None], ib)[..., 0]
            ii_a = _take2(ii_world, ia) * _take2(count[..., None, None], ia)
            ii_b = _take2(ii_world, ib) * _take2(count[..., None, None], ib)

            def eff_mass(d):
                rxd_a = jnp.cross(r_a, d)
                rxd_b = jnp.cross(r_b, d)
                ang_a = jnp.einsum("wkij,wkj->wki", ii_a, rxd_a, precision="highest")
                ang_b = jnp.einsum("wkij,wkj->wki", ii_b, rxd_b, precision="highest")
                k_ = im_a + im_b + jnp.sum(rxd_a * ang_a, -1) + jnp.sum(rxd_b * ang_b, -1)
                return 1.0 / jnp.maximum(k_, eps)

            m_n = eff_mass(n)
            m_t1 = eff_mass(t1)
            m_t2 = eff_mass(t2)

            def rel_vel(lv_, av_):
                va = _take2(lv_, ia) + jnp.cross(_take2(av_, ia), r_a)
                vb = _take2(lv_, ib) + jnp.cross(_take2(av_, ib), r_b)
                return vb - va

            # soft-constraint normal solve (TGS-soft): penetrating contacts
            # behave as a stiff critically-over-damped spring; separated
            # (speculative) contacts use a hard constraint that lets the gap
            # close exactly in one substep (prevents tunneling). Restitution
            # is a separate pass after the substep loop so later substeps
            # cannot unwind the bounce impulse.
            omega = 2.0 * jnp.pi * params.contact_hertz
            zeta = params.contact_damping_ratio
            csoft = h * omega * (2.0 * zeta + h * omega)
            bias_rate = omega / (2.0 * zeta + h * omega)
            mass_scale_soft = csoft / (1.0 + csoft)
            imp_scale_soft = 1.0 / (1.0 + csoft)

            sep = -(depth_cur - params.allowed_linear_error)  # <0 when penetrating
            bias = jnp.where(sep > 0.0, sep / h,
                             jnp.maximum(bias_rate * sep,
                                         -params.max_corrective_velocity))
            mscale = jnp.where(sep > 0.0, 1.0, mass_scale_soft)
            iscale = jnp.where(sep > 0.0, 0.0, imp_scale_soft)

            def apply_impulse(lv_, av_, imp, d):
                imp_d = imp[..., None] * d
                lv_ = _scatter_add2(lv_, ia, -imp_d * _take2(inv_mass[..., None], ia))
                lv_ = _scatter_add2(lv_, ib, imp_d * _take2(inv_mass[..., None], ib))
                ii_a0 = _take2(ii_world, ia)
                ii_b0 = _take2(ii_world, ib)
                av_ = _scatter_add2(av_, ia, jnp.einsum("wkij,wkj->wki", ii_a0,
                                                        jnp.cross(r_a, -imp_d),
                                                        precision="highest"))
                av_ = _scatter_add2(av_, ib, jnp.einsum("wkij,wkj->wki", ii_b0,
                                                        jnp.cross(r_b, imp_d),
                                                        precision="highest"))
                return lv_, av_

            # ---- warm start this substep: apply the stored impulses ----
            wc = params.warmstart_coefficient
            lam_n = lam_n * wc
            lam_t1 = lam_t1 * wc
            lam_t2 = lam_t2 * wc
            warm_imp = (lam_n[..., None] * n + lam_t1[..., None] * t1
                        + lam_t2[..., None] * t2)
            lv = _scatter_add2(lv, ia, -warm_imp * _take2(inv_mass[..., None], ia))
            lv = _scatter_add2(lv, ib, warm_imp * _take2(inv_mass[..., None], ib))
            av = _scatter_add2(av, ia, jnp.einsum("wkij,wkj->wki", _take2(ii_world, ia),
                                                  jnp.cross(r_a, -warm_imp),
                                                  precision="highest"))
            av = _scatter_add2(av, ib, jnp.einsum("wkij,wkj->wki", _take2(ii_world, ib),
                                                  jnp.cross(r_b, warm_imp),
                                                  precision="highest"))

            for _pgs in range(params.n_pgs):
                vn = jnp.sum(rel_vel(lv, av) * n, -1)
                dl = (-m_n * mscale * (vn + bias) - iscale * lam_n) * actf
                new_n = jnp.maximum(lam_n + dl, 0.0)
                lv, av = apply_impulse(lv, av, new_n - lam_n, n)
                lam_n = new_n

                # relax pass (bias-free, hard, bidirectional): drives vn → 0
                # exactly; with cross-step warmstart this acts as an
                # integrator so resting loads converge over a few frames
                # (Box2D-v3 relax semantics)
                vn = jnp.sum(rel_vel(lv, av) * n, -1)
                dl = -m_n * vn * actf
                new_n = jnp.maximum(lam_n + dl, 0.0)
                lv, av = apply_impulse(lv, av, new_n - lam_n, n)
                lam_n = new_n

                max_f = contacts.friction * lam_n
                vt1 = jnp.sum(rel_vel(lv, av) * t1, -1)
                dl1 = -m_t1 * vt1 * actf
                new1 = jnp.clip(lam_t1 + dl1, -max_f, max_f)
                lv, av = apply_impulse(lv, av, new1 - lam_t1, t1)
                lam_t1 = new1

                vt2 = jnp.sum(rel_vel(lv, av) * t2, -1)
                dl2 = -m_t2 * vt2 * actf
                new2 = jnp.clip(lam_t2 + dl2, -max_f, max_f)
                lv, av = apply_impulse(lv, av, new2 - lam_t2, t2)
                lam_t2 = new2

            # ---- track penetration for the next substep's bias ----
            vn_end = jnp.sum(rel_vel(lv, av) * n, -1)
            depth_cur = depth_cur - h * vn_end

        # ---- 3. integrate positions ----
        pos = pos + h * lv
        dq = 0.5 * h * quat.mul(
            jnp.concatenate([av, jnp.zeros_like(av[..., :1])], -1), rot)
        rot = quat.normalize(rot + dq)
        return (pos, rot, lv, av, depth_cur, lam_n, lam_t1, lam_t2), None

    zeros_k = (jnp.zeros(contacts.depth.shape, dtype) if has_contacts
               else jnp.zeros((w, 1), dtype))
    depth0 = contacts.depth if has_contacts else zeros_k
    carry = (position, rotation, linvel, angvel, depth0,
             warm_n if has_contacts else zeros_k,
             warm_t1 if has_contacts else zeros_k,
             warm_t2 if has_contacts else zeros_k)
    carry, _ = jax.lax.scan(substep, carry, None, length=params.n_substeps)
    pos, rot, lv, av, depth_cur, lam_n, lam_t1_f, lam_t2_f = carry

    # ---- restitution pass (Box2D-v3 style): one additional impulse so the
    # final separating velocity reaches -e * v0n, add-only (never unwinds) ----
    if has_contacts:
        actf = contacts.active.astype(dtype)
        ii_world, com_off = body_kinematics(rot)
        com_world = pos + com_off
        r_a = contacts.point - _take2(com_world, ia)
        r_b = contacts.point - _take2(com_world, ib)
        im_a = _take2(inv_mass[..., None], ia)[..., 0] * _take2(count[..., None], ia)[..., 0]
        im_b = _take2(inv_mass[..., None], ib)[..., 0] * _take2(count[..., None], ib)[..., 0]
        ii_a = _take2(ii_world, ia) * _take2(count[..., None, None], ia)
        ii_b = _take2(ii_world, ib) * _take2(count[..., None, None], ib)
        rxn_a = jnp.cross(r_a, n)
        rxn_b = jnp.cross(r_b, n)
        k_ = (im_a + im_b
              + jnp.sum(rxn_a * jnp.einsum("wkij,wkj->wki", ii_a, rxn_a,
                                           precision="highest"), -1)
              + jnp.sum(rxn_b * jnp.einsum("wkij,wkj->wki", ii_b, rxn_b,
                                           precision="highest"), -1))
        m_n = 1.0 / jnp.maximum(k_, eps)
        va = _take2(lv, ia) + jnp.cross(_take2(av, ia), r_a)
        vb = _take2(lv, ib) + jnp.cross(_take2(av, ib), r_b)
        vn = jnp.sum((vb - va) * n, -1)
        want = rest_target
        dl = jnp.maximum(-m_n * (vn - want), 0.0) * actf * (lam_n > 0.0)
        imp_d = dl[..., None] * n
        lv = _scatter_add2(lv, ia, -imp_d * _take2(inv_mass[..., None], ia))
        lv = _scatter_add2(lv, ib, imp_d * _take2(inv_mass[..., None], ib))
        av = _scatter_add2(av, ia, jnp.einsum("wkij,wkj->wki", _take2(ii_world, ia),
                                              jnp.cross(r_a, -imp_d), precision="highest"))
        av = _scatter_add2(av, ib, jnp.einsum("wkij,wkj->wki", _take2(ii_world, ib),
                                              jnp.cross(r_b, imp_d), precision="highest"))
        lam_n = lam_n + dl

    # ---- NGS position stabilization (rapier stabilization iterations) ----
    if has_contacts and params.n_stabilization > 0:
        n = contacts.normal
        actf = contacts.active.astype(dtype)
        ii_world, com_off = body_kinematics(rot)
        com_world = pos + com_off
        r_a = contacts.point - _take2(com_world, ia)
        r_b = contacts.point - _take2(com_world, ib)
        im_a = _take2(inv_mass[..., None], ia)[..., 0] * _take2(count[..., None], ia)[..., 0]
        im_b = _take2(inv_mass[..., None], ib)[..., 0] * _take2(count[..., None], ib)[..., 0]
        ii_a = _take2(ii_world, ia) * _take2(count[..., None, None], ia)
        ii_b = _take2(ii_world, ib) * _take2(count[..., None, None], ib)
        rxn_a = jnp.cross(r_a, n)
        rxn_b = jnp.cross(r_b, n)
        k_ = (im_a + im_b
              + jnp.sum(rxn_a * jnp.einsum("wkij,wkj->wki", ii_a, rxn_a,
                                           precision="highest"), -1)
              + jnp.sum(rxn_b * jnp.einsum("wkij,wkj->wki", ii_b, rxn_b,
                                           precision="highest"), -1))
        m_n = 1.0 / jnp.maximum(k_, eps)

        def stab(carry, _):
            pos_, rot_, depth_ = carry
            corr = params.stabilization_erp * jnp.maximum(
                depth_ - params.allowed_linear_error, 0.0)
            p_imp = m_n * corr * actf                     # positional pseudo-impulse
            imp_d = p_imp[..., None] * n
            dpos = jnp.zeros_like(pos_)
            dpos = _scatter_add2(dpos, ia, -imp_d * _take2(inv_mass[..., None], ia))
            dpos = _scatter_add2(dpos, ib, imp_d * _take2(inv_mass[..., None], ib))
            dth_a = jnp.einsum("wkij,wkj->wki", _take2(ii_world, ia),
                               jnp.cross(r_a, -imp_d), precision="highest")
            dth_b = jnp.einsum("wkij,wkj->wki", _take2(ii_world, ib),
                               jnp.cross(r_b, imp_d), precision="highest")
            dtheta = jnp.zeros_like(pos_)
            dtheta = _scatter_add2(dtheta, ia, dth_a)
            dtheta = _scatter_add2(dtheta, ib, dth_b)
            pos_ = pos_ + dpos
            dq = 0.5 * quat.mul(
                jnp.concatenate([dtheta, jnp.zeros_like(dtheta[..., :1])], -1), rot_)
            rot_ = quat.normalize(rot_ + dq)
            # penetration shrinks by the relative normal correction
            rel_corr = ((_take2(dpos, ib) + jnp.cross(_take2(dtheta, ib), r_b))
                        - (_take2(dpos, ia) + jnp.cross(_take2(dtheta, ia), r_a)))
            depth_ = depth_ - jnp.sum(rel_corr * n, -1)
            return (pos_, rot_, depth_), None

        (pos, rot, _), _ = jax.lax.scan(stab, (pos, rot, depth_cur), None,
                                        length=params.n_stabilization)

    return pos, rot, lv, av, ((lam_n, lam_t1_f, lam_t2_f) if has_contacts else None)
