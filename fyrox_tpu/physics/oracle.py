"""Sequential float64 reference implementation of the physics step.

The fidelity oracle the round-1 verdict asked for: no Rust toolchain
exists in this environment, so rapier itself cannot be run here. Instead
this module re-implements the SAME documented solver semantics
(rapier/Box2D-v3 TGS-soft structure, parameters per
/root/reference/fyrox-impl/src/scene/graph/physics/mod.rs:830-908) as
straight-line sequential numpy in float64:

  * all-pairs broadphase, per-pair narrowphase (ball/cuboid/capsule/
    halfspace kernels mirroring physics/narrowphase.py formulas)
  * Jacobi + mass-splitting velocity solve with per-substep warmstart,
    soft-contact bias, speculative sep/h limiting, friction pyramid
  * restitution pass gated on max-λ, NGS positional stabilization
  * semi-implicit Euler with COM-correct integration

It shares NO code with the batched JAX path (independent scalar loops),
so golden-trace tests diffing the two catch vectorization, masking,
gather/scatter and broadphase-compaction bugs at the 1e-5/step level
(float32 forward vs float64 oracle). Trajectory-level physical tests
(stacks, friction cones, bounce apexes) guard absolute physics.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from fyrox_tpu.physics import shapes as sh

__all__ = ["oracle_step", "OracleState", "state_from_device"]

_DYNAMIC = 0


@dataclass
class OracleState:
    position: np.ndarray   # [B,3] f64
    rotation: np.ndarray   # [B,4] f64 xyzw
    linvel: np.ndarray     # [B,3]
    angvel: np.ndarray     # [B,3]
    warm: dict             # pair-key -> (lam_n[4], lam_t1[4], lam_t2[4])


def state_from_device(state, world=0):
    """PhysicsState ([W,B,...] device arrays) -> OracleState of one world."""
    return OracleState(
        position=np.asarray(state.position[world], np.float64),
        rotation=np.asarray(state.rotation[world], np.float64),
        linvel=np.asarray(state.linvel[world], np.float64),
        angvel=np.asarray(state.angvel[world], np.float64),
        warm={})


def _quat_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz])


def _normalize(q):
    return q / max(np.linalg.norm(q), 1e-12)


def _tangents(n):
    """Pixar branch-free ONB (must match solver._orthonormal_tangents)."""
    sign = 1.0 if n[2] >= 0.0 else -1.0
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    t1 = np.array([1.0 + sign * n[0] ** 2 * a, sign * b, -sign * n[0]])
    t2 = np.array([b, sign + n[1] ** 2 * a, -n[1]])
    return t1, t2


# --------------------------------------------------------------------------
# scalar narrowphase kernels (formulas mirror physics/narrowphase.py)
# --------------------------------------------------------------------------

def _ball_ball(pa, ra, pb, rb):
    d = pb - pa
    dist = np.linalg.norm(d)
    n = d / dist if dist > 1e-9 else np.array([0.0, 1.0, 0.0])
    depth = ra + rb - dist
    point = pa + n * (ra - 0.5 * depth)
    return n, [point], [depth]


def _ball_cuboid(pa, ra, pb, rot_b, half_b):
    rel = rot_b.T @ (pa - pb)
    clamped = np.clip(rel, -half_b, half_b)
    delta = rel - clamped
    dist = np.linalg.norm(delta)
    if dist > 1e-9:
        n_local = delta / dist
        depth = ra - dist
        surf = clamped
    else:
        pen = half_b - np.abs(rel)
        axis = int(np.argmin(pen))
        sign = 1.0 if rel[axis] >= 0 else -1.0
        n_local = np.zeros(3)
        n_local[axis] = sign
        depth = ra + pen[axis]
        surf = clamped.copy()
        surf[axis] = half_b[axis] * sign
    n_world = rot_b @ n_local
    p_world = pb + rot_b @ surf
    return -n_world, [p_world], [depth]


def _seg_ends(p, rot, hh):
    axis = rot[:, 1]
    return p - axis * hh, p + axis * hh


def _closest_on_seg(a, b, p):
    ab = b - a
    t = np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-9)
    return a + ab * np.clip(t, 0.0, 1.0)


def _ball_capsule(pa, ra, pb, rot_b, hh, rb):
    s0, s1 = _seg_ends(pb, rot_b, hh)
    c = _closest_on_seg(s0, s1, pa)
    return _ball_ball(pa, ra, c, rb)


def _capsule_capsule(pa, rot_a, hha, ra, pb, rot_b, hhb, rb):
    a0, a1 = _seg_ends(pa, rot_a, hha)
    b0, b1 = _seg_ends(pb, rot_b, hhb)
    d1, d2 = a1 - a0, b1 - b0
    r = a0 - b0
    a = np.dot(d1, d1)
    e = np.dot(d2, d2)
    f = np.dot(d2, r)
    c = np.dot(d1, r)
    b = np.dot(d1, d2)
    denom = a * e - b * b
    s = np.clip((b * f - c * e) / denom, 0, 1) if denom > 1e-9 else 0.0
    t = np.clip((b * s + f) / max(e, 1e-9), 0.0, 1.0)
    s = np.clip((b * t - c) / max(a, 1e-9), 0.0, 1.0)
    t = np.clip((b * s + f) / max(e, 1e-9), 0.0, 1.0)
    return _ball_ball(a0 + d1 * s, ra, b0 + d2 * t, rb)


def _ball_halfspace(pa, ra, pp, rot_p):
    n = rot_p[:, 1]
    dist = np.dot(n, pa - pp)
    depth = ra - dist
    return -n, [pa - n * dist], [depth]


def _capsule_halfspace(pa, rot_a, hh, ra, pp, rot_p):
    n = rot_p[:, 1]
    d = np.dot(n, pp)
    pts, deps = [], []
    for e in _seg_ends(pa, rot_a, hh):
        dist = np.dot(n, e) - d
        pts.append(e - n * dist)
        deps.append(ra - dist)
    return -n, pts, deps


def _cuboid_halfspace(pa, rot_a, half_a, pp, rot_p):
    n = rot_p[:, 1]
    d = np.dot(n, pp)
    corners = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                corners.append(pa + rot_a @ (np.array([sx, sy, sz]) * half_a))
    deps = [d - np.dot(n, c) for c in corners]
    order = np.argsort(deps)[::-1][:4]
    return -n, [corners[i] for i in order], [deps[i] for i in order]


def _cuboid_cuboid(pa, rot_a, half_a, pb, rot_b, half_b):
    d = pb - pa
    axes_a = [rot_a[:, i] for i in range(3)]
    axes_b = [rot_b[:, i] for i in range(3)]

    def face_pen(axis):
        ra = sum(half_a[i] * abs(np.dot(axes_a[i], axis)) for i in range(3))
        rb = sum(half_b[i] * abs(np.dot(axes_b[i], axis)) for i in range(3))
        return ra + rb - abs(np.dot(d, axis))

    best_pen, best_axis = 1e9, np.zeros(3)
    for axis in axes_a + axes_b:
        pen = face_pen(axis)
        if pen < best_pen:
            best_pen, best_axis = pen, axis
    for i in range(3):
        for j in range(3):
            axis = np.cross(axes_a[i], axes_b[j])
            ln = np.linalg.norm(axis)
            if ln > 1e-6:
                axis = axis / ln
                pen = face_pen(axis)
                if pen < best_pen - 1e-6:
                    best_pen, best_axis = pen, axis
    normal = -best_axis if np.dot(best_axis, d) < 0 else best_axis

    def face_vertices(p, rot, half, axis_dir):
        ax = [rot[:, i] for i in range(3)]
        dots = np.array([np.dot(a, axis_dir) for a in ax])
        fi = int(np.argmax(np.abs(dots)))
        sign = 1.0 if dots[fi] >= 0 else -1.0
        ta, tb = (fi + 1) % 3, (fi + 2) % 3
        n_l = np.zeros(3)
        n_l[fi] = sign
        corners = []
        for s1 in (-1, 1):
            for s2 in (-1, 1):
                c_local = n_l * half[fi]
                c_local = c_local.copy()
                c_local[ta] += s1 * half[ta]
                c_local[tb] += s2 * half[tb]
                corners.append(p + rot @ c_local)
        center = p + rot @ (n_l * half[fi])
        return (corners, center, rot @ np.eye(3)[ta], rot @ np.eye(3)[tb],
                half[ta], half[tb])

    ref_pts, ref_c, rt1, rt2, h1, h2 = face_vertices(pa, rot_a, half_a, normal)
    inc_pts, _, _, _, _, _ = face_vertices(pb, rot_b, half_b, -normal)
    plane_d = np.dot(normal, ref_c)
    pts, deps = [], []
    for ip in inc_pts:
        rel = ip - ref_c
        u = np.clip(np.dot(rel, rt1), -h1, h1)
        v = np.clip(np.dot(rel, rt2), -h2, h2)
        pts.append(ref_c + u * rt1 + v * rt2)
        deps.append(plane_d - np.dot(normal, ip))
    if best_pen < -1e9:
        deps = [-1e9] * 4
    return normal, pts, deps, best_pen


# --------------------------------------------------------------------------
# the sequential step
# --------------------------------------------------------------------------

def _manifold(kind_a, pa6, pos_a, rot_a, kind_b, pb6, pos_b, rot_b):
    """Canonically-ordered manifold (kind_a <= kind_b effective)."""
    extra_gate = None
    if kind_a == sh.BALL and kind_b == sh.BALL:
        n, pts, deps = _ball_ball(pos_a, pa6[0], pos_b, pb6[0])
    elif kind_a == sh.BALL and kind_b == sh.CUBOID:
        n, pts, deps = _ball_cuboid(pos_a, pa6[0], pos_b, rot_b, pb6[:3])
    elif kind_a == sh.BALL and kind_b == sh.CAPSULE:
        n, pts, deps = _ball_capsule(pos_a, pa6[0], pos_b, rot_b, pb6[0], pb6[1])
    elif kind_a == sh.BALL and kind_b == sh.HALFSPACE:
        n, pts, deps = _ball_halfspace(pos_a, pa6[0], pos_b, rot_b)
    elif kind_a == sh.CUBOID and kind_b == sh.CUBOID:
        n, pts, deps, pen = _cuboid_cuboid(pos_a, rot_a, pa6[:3],
                                           pos_b, rot_b, pb6[:3])
        extra_gate = pen
    elif kind_a == sh.CUBOID and kind_b == sh.CAPSULE:
        # two sphere queries at the capsule segment ends (narrowphase.py
        # capsule_cuboid), roles swapped back
        a0, a1 = _seg_ends(pos_b, rot_b, pb6[0])
        n0, p0, d0 = _ball_cuboid(a0, pb6[1], pos_a, rot_a, pa6[:3])
        n1, p1, d1 = _ball_cuboid(a1, pb6[1], pos_a, rot_a, pa6[:3])
        n = n0 if d0[0] >= d1[0] else n1
        return -n, [p0[0], p1[0]], [d0[0], d1[0]], None
    elif kind_a == sh.CUBOID and kind_b == sh.HALFSPACE:
        n, pts, deps = _cuboid_halfspace(pos_a, rot_a, pa6[:3], pos_b, rot_b)
    elif kind_a == sh.CAPSULE and kind_b == sh.CAPSULE:
        n, pts, deps = _capsule_capsule(pos_a, rot_a, pa6[0], pa6[1],
                                        pos_b, rot_b, pb6[0], pb6[1])
    elif kind_a == sh.CAPSULE and kind_b == sh.HALFSPACE:
        n, pts, deps = _capsule_halfspace(pos_a, rot_a, pa6[0], pa6[1],
                                          pos_b, rot_b)
    else:
        return None
    return n, pts, deps, extra_gate


def oracle_step(st: OracleState, t, dt: float,
                sequential: bool = False) -> OracleState:
    """One sequential reference step of PhysicsTemplate `t`.

    sequential=False (default): Jacobi + mass splitting — the repo's own
    algorithm in scalar f64, validating the vectorization.

    sequential=True: Gauss-Seidel ordering WITHOUT mass splitting — the
    rapier-style solve (impulses applied contact-by-contact against live
    velocities, contacts iterated in pair order; islands are a
    parallelization detail, not a numerics one, per
    fyrox-impl/src/scene/graph/physics/mod.rs:830-908 semantics). Diffing
    the two modes MEASURES the Jacobi departure instead of assuming it
    (tests/test_oracle.py::test_jacobi_vs_gauss_seidel)."""
    from fyrox_tpu.physics.world import SPECULATIVE_MARGIN
    b = t.num_bodies
    body_type = np.asarray(t.body_type)
    inv_mass = np.asarray(t.inv_mass, np.float64)
    inv_inertia = np.asarray(t.inv_inertia_local, np.float64)
    com_local = np.asarray(t.com_local, np.float64)
    margin = t.allowed_linear_error + SPECULATIVE_MARGIN

    pos = st.position.copy()
    rot = st.rotation.copy()
    lv = st.linvel.copy()
    av = st.angvel.copy()

    gravity = np.asarray(t.gravity, np.float64)
    gscale = np.asarray(t.gravity_scale, np.float64)
    dyn = body_type == _DYNAMIC
    accel = np.where(dyn[:, None], gravity[None, :] * gscale[:, None], 0.0)

    rmats = np.stack([_quat_mat(q) for q in rot])
    ii_world = np.einsum("bij,bjk,blk->bil", rmats, inv_inertia, rmats)
    com_w = pos + np.einsum("bij,bj->bi", rmats, com_local)

    # ---- narrowphase over canonical pairs (all-pairs reference) ----
    kinds = np.asarray([sh.CAPSULE if k in (sh.CYLINDER, sh.CONE) else int(k)
                        for k in np.asarray(t.col_shape)])
    col_body = np.asarray(t.col_body)
    nc = len(col_body)
    cpos = np.zeros((nc, 3))
    crot = np.zeros((nc, 3, 3))
    for c in range(nc):
        bi = col_body[c]
        crot[c] = rmats[bi] @ _quat_mat(np.asarray(t.col_rot[c], np.float64))
        cpos[c] = pos[bi] + rmats[bi] @ np.asarray(t.col_pos[c], np.float64)

    contacts = []   # dicts with body_a, body_b, n, point, depth, fric, rest
    for i in range(nc):
        for j in range(i + 1, nc):
            if col_body[i] == col_body[j]:
                continue
            if not (dyn[col_body[i]] or dyn[col_body[j]]):
                continue
            a, bb = (i, j) if kinds[i] <= kinds[j] else (j, i)
            m = _manifold(kinds[a], np.asarray(t.col_params[a], np.float64),
                          cpos[a], crot[a],
                          kinds[bb], np.asarray(t.col_params[bb], np.float64),
                          cpos[bb], crot[bb])
            if m is None:
                continue
            n, pts, deps, gate = m
            # speculative-CCD activation distance (world.py pred_p /
            # slab2 pred): the static margin EXTENDED by the pair's
            # relative linear sweep |lv_a - lv_b|*dt, so fast approaches
            # activate early and the solver's sep/h bias clamps the
            # approach (the repo's documented CCD model; rapier's static
            # prediction_distance + separate TOI solve is replaced by
            # this, physics/mod.rs:905 semantics)
            pred = margin + float(np.linalg.norm(
                lv[col_body[a]] - lv[col_body[bb]])) * dt
            for p, dep in zip(pts, deps):
                if dep <= -pred:
                    continue
                if gate is not None and gate <= -pred:
                    continue
                contacts.append(dict(
                    a=col_body[a], b=col_body[bb], n=np.asarray(n, np.float64),
                    p=np.asarray(p, np.float64), depth=float(dep),
                    own=float(len(pts)),
                    fric=math.sqrt(t.col_friction[i] * t.col_friction[j]),
                    rest=max(t.col_restitution[i], t.col_restitution[j]),
                    key=(min(i, j), max(i, j), len(pts))))

    # mass splitting: full split over a manifold's own points, count^pow
    # across distinct pairs (mirrors solver.py)
    cnt = np.zeros(b)
    for c in contacts:
        cnt[c["a"]] += 1.0 / c["own"]
        cnt[c["b"]] += 1.0 / c["own"]
    count = np.maximum(cnt, 1.0) ** t.mass_split_pow

    # constraint prep
    h = dt / t.n_substeps
    omega = 2.0 * math.pi * 30.0
    zeta = 10.0
    csoft = h * omega * (2.0 * zeta + h * omega)
    bias_rate = omega / (2.0 * zeta + h * omega)
    mass_scale_soft = csoft / (1.0 + csoft)
    imp_scale_soft = 1.0 / (1.0 + csoft)

    for c in contacts:
        a, bb = c["a"], c["b"]
        c["t1"], c["t2"] = _tangents(c["n"])
        c["r_a"] = c["p"] - com_w[a]
        c["r_b"] = c["p"] - com_w[bb]
        va = lv[a] + np.cross(av[a], c["r_a"])
        vb = lv[bb] + np.cross(av[bb], c["r_b"])
        v0n = np.dot(vb - va, c["n"])
        c["rest_target"] = -c["rest"] * v0n \
            if v0n < -t.restitution_threshold else 0.0

        # GS applies impulses one at a time — no mass splitting needed
        s_a = 1.0 if sequential else count[a] * c["own"]
        s_b = 1.0 if sequential else count[bb] * c["own"]

        def eff(dvec):
            rxd_a = np.cross(c["r_a"], dvec)
            rxd_b = np.cross(c["r_b"], dvec)
            k = (inv_mass[a] * s_a + inv_mass[bb] * s_b
                 + s_a * np.dot(rxd_a, ii_world[a] @ rxd_a)
                 + s_b * np.dot(rxd_b, ii_world[bb] @ rxd_b))
            return 1.0 / max(k, 1e-12)

        c["m_n"] = eff(c["n"])
        c["m_t1"] = eff(c["t1"])
        c["m_t2"] = eff(c["t2"])
        c["lam"] = np.zeros(3)
        c["lam_max"] = 0.0
        c["depth_cur"] = c["depth"]

    def apply_contact_imp(c, imp):
        a, bb = c["a"], c["b"]
        lv[a] -= imp * inv_mass[a]
        lv[bb] += imp * inv_mass[bb]
        av[a] += ii_world[a] @ np.cross(c["r_a"], -imp)
        av[bb] += ii_world[bb] @ np.cross(c["r_b"], imp)

    # ---- substep loop ----
    for _s in range(t.n_substeps):
        lv += h * accel

        # warmstart (Jacobi: all computed against the same pre-pass state;
        # the batched solver applies all impulses simultaneously, so apply
        # sequentially but compute from a snapshot)
        wc = t.warmstart_coefficient
        imps = []
        for c in contacts:
            c["lam"] = c["lam"] * wc
            imps.append(c["lam"][0] * c["n"] + c["lam"][1] * c["t1"]
                        + c["lam"][2] * c["t2"])
        for c, imp in zip(contacts, imps):
            apply_contact_imp(c, imp)

        for _p in range(t.n_pgs):
            if sequential:
                lv_s, av_s = lv, av             # Gauss-Seidel: live state
            else:
                lv_s, av_s = lv.copy(), av.copy()   # Jacobi snapshot
            imps = []
            for c in contacts:
                a, bb = c["a"], c["b"]
                rv = (lv_s[bb] + np.cross(av_s[bb], c["r_b"])
                      - lv_s[a] - np.cross(av_s[a], c["r_a"]))
                vn = np.dot(rv, c["n"])
                sep = -(c["depth_cur"] - t.allowed_linear_error)
                if sep > 0:
                    bias, mscale, iscale = sep / h, 1.0, 0.0
                else:
                    bias = max(bias_rate * sep, -t.max_corrective_velocity)
                    mscale, iscale = mass_scale_soft, imp_scale_soft
                lam_n = c["lam"][0]
                dl = -c["m_n"] * mscale * (vn + bias) - iscale * lam_n
                new_n = max(lam_n + dl, 0.0)
                vn2 = vn + (new_n - lam_n) / c["m_n"]
                spec = bias if sep > 0 else 0.0
                new_n2 = max(new_n - c["m_n"] * (vn2 + spec), 0.0)
                dn = new_n2 - lam_n
                c["lam"][0] = new_n2
                max_f = c["fric"] * new_n2
                vt1 = np.dot(rv, c["t1"])
                new1 = np.clip(c["lam"][1] - c["m_t1"] * vt1, -max_f, max_f)
                dt1 = new1 - c["lam"][1]
                c["lam"][1] = new1
                vt2 = np.dot(rv, c["t2"])
                new2 = np.clip(c["lam"][2] - c["m_t2"] * vt2, -max_f, max_f)
                dt2 = new2 - c["lam"][2]
                c["lam"][2] = new2
                imp = dn * c["n"] + dt1 * c["t1"] + dt2 * c["t2"]
                if sequential:
                    apply_contact_imp(c, imp)   # GS: apply immediately
                else:
                    imps.append(imp)
            if not sequential:
                for c, imp in zip(contacts, imps):
                    apply_contact_imp(c, imp)

        lv_s, av_s = lv.copy(), av.copy()
        for c in contacts:
            c["lam_max"] = max(c["lam_max"], c["lam"][0])
            a, bb = c["a"], c["b"]
            rv = (lv_s[bb] + np.cross(av_s[bb], c["r_b"])
                  - lv_s[a] - np.cross(av_s[a], c["r_a"]))
            c["depth_cur"] -= h * np.dot(rv, c["n"])

        # integrate
        for k in range(b):
            dq = 0.5 * h * _quat_mul(np.array([av[k, 0], av[k, 1], av[k, 2], 0.0]),
                                     rot[k])
            new_q = _normalize(rot[k] + dq)
            com_k = pos[k] + _quat_mat(rot[k]) @ com_local[k] + h * lv[k]
            pos[k] = com_k - _quat_mat(new_q) @ com_local[k]
            rot[k] = new_q

    # ---- restitution pass ----
    lv_s, av_s = lv.copy(), av.copy()
    imps = []
    for c in contacts:
        a, bb = c["a"], c["b"]
        rv = (lv_s[bb] + np.cross(av_s[bb], c["r_b"])
              - lv_s[a] - np.cross(av_s[a], c["r_a"]))
        vn = np.dot(rv, c["n"])
        dl = max(-c["m_n"] * (vn - c["rest_target"]), 0.0) \
            if c["lam_max"] > 0.0 else 0.0
        c["lam"][0] += dl
        imps.append(dl * c["n"])
    for c, imp in zip(contacts, imps):
        apply_contact_imp(c, imp)

    # ---- NGS stabilization ----
    for _it in range(t.n_stabilization):
        dpos = np.zeros((b, 3))
        dtheta = np.zeros((b, 3))
        for c in contacts:
            a, bb = c["a"], c["b"]
            corr = t.erp * max(c["depth_cur"] - t.allowed_linear_error, 0.0)
            p_imp = c["m_n"] * corr
            imp = p_imp * c["n"]
            dpos[a] -= imp * inv_mass[a]
            dpos[bb] += imp * inv_mass[bb]
            dtheta[a] += ii_world[a] @ np.cross(c["r_a"], -imp)
            dtheta[bb] += ii_world[bb] @ np.cross(c["r_b"], imp)
        for k in range(b):
            pos[k] += dpos[k]
            if np.any(com_local[k]):
                pos[k] += np.cross(dtheta[k],
                                   -(_quat_mat(rot[k]) @ com_local[k]))
            dq = 0.5 * _quat_mul(np.array([dtheta[k, 0], dtheta[k, 1],
                                           dtheta[k, 2], 0.0]), rot[k])
            rot[k] = _normalize(rot[k] + dq)
        for c in contacts:
            a, bb = c["a"], c["b"]
            rel = ((dpos[bb] + np.cross(dtheta[bb], c["r_b"]))
                   - (dpos[a] + np.cross(dtheta[a], c["r_a"])))
            c["depth_cur"] -= np.dot(rel, c["n"])

    # ---- locks + damping ----
    if t.lin_lock is not None:
        keep = np.asarray(t.lin_lock, np.float64)
        lv *= keep
        av *= np.asarray(t.ang_lock, np.float64)
        pos = pos * keep + st.position * (1.0 - keep)
    lv /= (1.0 + dt * np.asarray(t.lin_damping, np.float64)[:, None])
    av /= (1.0 + dt * np.asarray(t.ang_damping, np.float64)[:, None])

    return OracleState(position=pos, rotation=rot, linvel=lv, angvel=av,
                       warm={})
