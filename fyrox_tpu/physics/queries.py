"""Physics queries: batched ray casting against collider sets.

Equivalent of the reference's `PhysicsWorld::cast_ray` (fyrox-impl/src/
scene/graph/physics/mod.rs:1292, sorted intersection buffer). Every ray
tests every collider (compute-everything-select, like the narrowphase);
returns the nearest hit. Batched over worlds and rays.
"""
from __future__ import annotations

import jax.numpy as jnp

from fyrox_tpu.core import ray as ray_mod
from fyrox_tpu.physics import shapes as sh
from fyrox_tpu.physics.world import PhysicsState, PhysicsTemplate, _collider_world

__all__ = ["cast_ray", "sphere_cast", "shape_cast", "compute_contacts"]

_BIG = 3.0e38


def cast_ray(state: PhysicsState, t: PhysicsTemplate, origin, direction,
             max_toi=jnp.inf):
    """Nearest-hit ray cast.

    origin/direction: [W,R,3]. Returns dict with hit [W,R] bool, toi [W,R],
    collider [W,R] int32 (-1 on miss), body [W,R] int32, point [W,R,3],
    normal [W,R,3].
    """
    cpos, crot = _collider_world(state, t)           # [W,C,3], [W,C,3,3]
    w = cpos.shape[0]
    c = cpos.shape[1]
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    r = origin.shape[1]

    # broadcast everything to [W,R,C,...]
    o = jnp.broadcast_to(origin[:, :, None], (w, r, c, 3))
    d = jnp.broadcast_to(direction[:, :, None], (w, r, c, 3))
    cp = jnp.broadcast_to(cpos[:, None], (w, r, c, 3))
    cr = jnp.broadcast_to(crot[:, None], (w, r, c, 3, 3))
    params = jnp.broadcast_to(jnp.asarray(t.col_params)[None, None], (w, r, c, 6))
    ctype = jnp.broadcast_to(jnp.asarray(t.col_shape)[None, None], (w, r, c))

    # --- ball ---
    hit_b, t_b = ray_mod.sphere(o, d, cp, params[..., 0])

    # --- cuboid: ray into the box frame, slab test ---
    crT = jnp.swapaxes(cr, -1, -2)
    o_loc = jnp.einsum("wrcij,wrcj->wrci", crT, o - cp, precision="highest")
    d_loc = jnp.einsum("wrcij,wrcj->wrci", crT, d, precision="highest")
    half = params[..., :3]
    hit_c, tmin_c, _ = ray_mod.aabb(o_loc, d_loc, -half, half)
    t_c = jnp.where(hit_c, jnp.maximum(tmin_c, 0.0), _BIG)

    # --- capsule: cap spheres + finite cylinder body in the local frame ---
    hh = params[..., 0]
    rad = params[..., 1]
    a_cyl = d_loc[..., 0] ** 2 + d_loc[..., 2] ** 2
    b_cyl = 2.0 * (o_loc[..., 0] * d_loc[..., 0] + o_loc[..., 2] * d_loc[..., 2])
    c_cyl = o_loc[..., 0] ** 2 + o_loc[..., 2] ** 2 - rad * rad
    disc = b_cyl * b_cyl - 4 * a_cyl * c_cyl
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b_cyl - sq) / jnp.maximum(2 * a_cyl, 1e-12)
    y_at = o_loc[..., 1] + t_cyl * d_loc[..., 1]
    # guard axis-parallel rays (a≈0): the quadratic degenerates; the cap
    # spheres cover that case
    cyl_ok = ((a_cyl > 1e-10) & (disc >= 0) & (t_cyl >= 0)
              & (jnp.abs(y_at) <= hh))
    t_cyl = jnp.where(cyl_ok, t_cyl, _BIG)
    axis_w = cr[..., :, 1]
    _, t_top = ray_mod.sphere(o, d, cp + axis_w * hh[..., None], rad)
    _, t_bot = ray_mod.sphere(o, d, cp - axis_w * hh[..., None], rad)
    t_k = jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))

    # --- halfspace (plane through collider origin, +Y local normal) ---
    n_hs = cr[..., :, 1]
    d_hs = -jnp.sum(n_hs * cp, -1)
    hit_h, t_h = ray_mod.plane(o, d, n_hs, d_hs)

    eff = jnp.where((ctype == sh.CYLINDER) | (ctype == sh.CONE),
                    sh.CAPSULE, ctype)
    toi = jnp.where(eff == sh.BALL, jnp.where(hit_b, t_b, _BIG),
          jnp.where(eff == sh.CUBOID, t_c,
          jnp.where(eff == sh.CAPSULE, t_k,
          jnp.where(eff == sh.HALFSPACE, jnp.where(hit_h, t_h, _BIG), _BIG))))
    toi = jnp.where(toi <= max_toi, toi, _BIG)        # [W,R,C]

    best = jnp.argmin(toi, axis=-1)                   # [W,R]
    best_toi = jnp.take_along_axis(toi, best[..., None], -1)[..., 0]
    hit = best_toi < _BIG
    collider = jnp.where(hit, best, -1)
    body = jnp.where(hit, jnp.asarray(t.col_body)[best], -1)
    point = origin + direction * jnp.where(hit, best_toi, 0.0)[..., None]

    def take_c(arr):  # [W,R,C,3] → winner [W,R,3]
        return jnp.take_along_axis(
            arr, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]

    cp_best = take_c(cp)
    rel_p = point - cp_best
    normal = rel_p / jnp.maximum(jnp.linalg.norm(rel_p, axis=-1, keepdims=True),
                                 1e-8)
    best_type = jnp.take_along_axis(eff, best[..., None], -1)[..., 0]
    n_best = take_c(n_hs)
    normal = jnp.where((best_type == sh.HALFSPACE)[..., None], n_best, normal)
    # cuboid: face normal from the local hit point
    p_loc_best = take_c(o_loc) + take_c(d_loc) * best_toi[..., None]
    half_best = take_c(half)
    ratios = jnp.abs(p_loc_best) / jnp.maximum(half_best, 1e-8)
    face = jnp.argmax(ratios, -1)
    sign = jnp.sign(jnp.take_along_axis(p_loc_best, face[..., None], -1))[..., 0]
    n_loc = jnp.eye(3, dtype=jnp.float32)[face] * sign[..., None]
    cr_best = jnp.take_along_axis(
        cr, best[..., None, None, None].repeat(3, -2).repeat(3, -1),
        axis=-3)[..., 0, :, :]
    n_box = jnp.einsum("wrij,wrj->wri", cr_best, n_loc, precision="highest")
    normal = jnp.where((best_type == sh.CUBOID)[..., None], n_box, normal)

    return dict(hit=hit, toi=jnp.where(hit, best_toi, jnp.inf),
                collider=collider, body=body, point=point, normal=normal)


def sphere_cast(state: PhysicsState, t: PhysicsTemplate, origin, direction,
                radius, max_toi=jnp.inf):
    """Swept-sphere cast (the reference's shape cast, physics/mod.rs:1371)
    via Minkowski inflation: a sphere of radius r swept along a ray hits a
    shape exactly when the ray hits the shape inflated by r. Balls/capsules
    inflate exactly; cuboids use the rounded-box approximation (inflated
    half-extents — conservative near corners); halfspaces offset by r.

    origin/direction [W,R,3], radius scalar or [W,R]. Same return dict as
    cast_ray.
    """
    import dataclasses
    r = jnp.asarray(radius, jnp.float32)
    params = t.col_params.copy()
    shape = t.col_shape
    rr = float(r) if r.ndim == 0 else float(jnp.max(r))  # static inflation
    for ci in range(t.num_colliders):
        k = shape[ci]
        if k == sh.BALL:
            params[ci, 0] += rr
        elif k == sh.CUBOID:
            params[ci, :3] += rr
        elif k in (sh.CAPSULE, sh.CYLINDER, sh.CONE):
            params[ci, 1] += rr
        # HALFSPACE handled by toi adjustment below (plane through origin)
    t_inf = dataclasses.replace(t, col_params=params)
    t_inf._incidence = None
    t_inf._flat_layout = getattr(t, "_flat_layout", None)
    out = cast_ray(state, t_inf, origin, direction, max_toi=max_toi)
    # halfspace: shift the plane toward the sphere by r along its normal
    # (cast_ray used the uninflated plane; correct toi by r / |d·n|)
    best_type = jnp.asarray(t.col_shape)[jnp.maximum(out["collider"], 0)]
    is_plane = (best_type == sh.HALFSPACE) & out["hit"]
    d = jnp.asarray(direction, jnp.float32)
    dn = jnp.abs(jnp.sum(d * out["normal"], -1))
    toi_adj = jnp.where(is_plane,
                        jnp.maximum(out["toi"] - r / jnp.maximum(dn, 1e-6), 0.0),
                        out["toi"])
    out["toi"] = toi_adj
    out["point"] = jnp.asarray(origin) + d * jnp.where(out["hit"], toi_adj,
                                                       0.0)[..., None]
    return out


def _support_h(kind, params, m):
    """Local support height g(m) = max_{x in shape} m·x for direction m
    (any scale) in the shape's local frame. kind: [.,.] int or python int;
    params [...,6]; m [...,3]. Exact for ball/cuboid/capsule/cylinder/
    cone/halfspace-irrelevant; CONVEX uses its bounding-sphere radius
    (params[0]) — conservative."""
    mx, my, mz = m[..., 0], m[..., 1], m[..., 2]
    mlen = jnp.sqrt(mx * mx + my * my + mz * mz)
    mxz = jnp.sqrt(mx * mx + mz * mz)
    g_ball = params[..., 0] * mlen
    g_box = (params[..., 0] * jnp.abs(mx) + params[..., 1] * jnp.abs(my)
             + params[..., 2] * jnp.abs(mz))
    g_cap = params[..., 0] * jnp.abs(my) + params[..., 1] * mlen
    g_cyl = params[..., 0] * jnp.abs(my) + params[..., 1] * mxz
    g_cone = jnp.maximum(params[..., 0] * my,
                         -params[..., 0] * my + params[..., 1] * mxz)
    g_conv = params[..., 0] * mlen
    if isinstance(kind, int):
        return {sh.BALL: g_ball, sh.CUBOID: g_box, sh.CAPSULE: g_cap,
                sh.CYLINDER: g_cyl, sh.CONE: g_cone,
                sh.CONVEX: g_conv}[kind]
    return jnp.where(kind == sh.BALL, g_ball,
           jnp.where(kind == sh.CUBOID, g_box,
           jnp.where(kind == sh.CAPSULE, g_cap,
           jnp.where(kind == sh.CYLINDER, g_cyl,
           jnp.where(kind == sh.CONE, g_cone, g_conv)))))


def _support_point(kind, params, rot, m_local):
    """Local support POINT along local direction m (unit-ish); world
    offset = rot @ point. Used only to report the contact location."""
    mx, my, mz = m_local[..., 0], m_local[..., 1], m_local[..., 2]
    mlen = jnp.sqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-12))
    n = m_local / mlen[..., None]
    if kind == sh.BALL:
        p = n * params[..., 0:1]
    elif kind == sh.CUBOID:
        p = jnp.sign(m_local) * params[..., :3]
    elif kind in (sh.CAPSULE, sh.CYLINDER, sh.CONE):
        ay = jnp.sign(my) * params[..., 0]
        p = jnp.stack([n[..., 0] * params[..., 1], ay,
                       n[..., 2] * params[..., 1]], -1)
    else:
        p = n * params[..., 0:1]
    return jnp.einsum("...ij,...j->...i", rot, p)


def shape_cast(state: PhysicsState, t: PhysicsTemplate, kind, params,
               origin, rotation, direction, max_toi=jnp.inf):
    """Arbitrary convex shape cast (reference `cast_shape`,
    fyrox-impl/src/scene/graph/physics/mod.rs:1357): sweep a shape of
    `kind` (BALL/CUBOID/CAPSULE/CYLINDER/CONE) along `direction` from
    (origin, rotation) and return the earliest hit per ray.

    Method — swept SAT over a candidate separating-axis set (shape axes,
    collider axes, their 9 edge crosses, the center line, the sweep
    direction, plane normals): every gap along an axis n is linear in the
    sweep parameter λ (gap_n(λ) = gap_n(0) − λ n·direction), so the hit
    time is max over crossing axes and a positive non-closing gap is an
    exact miss certificate. Exact for box/convex-polytope pairs when the
    achieving axis is in the set (face normals + edge crosses — the SAT
    completeness set); round shapes have exact supports so errors only
    come from the finite axis set. Heightfield/trimesh colliders are not
    supported (dense-scenery scenes: use cast_ray grids).

    origin [W,R,3]; rotation [W,R,4] xyzw quat (None = identity);
    direction [W,R,3] = velocity (toi is in time units of it). Returns
    the cast_ray dict.
    """
    from fyrox_tpu.core import quat as quat_mod
    kind = int(kind)
    cpos, crot = _collider_world(state, t)           # [W,C,3], [W,C,3,3]
    w, c = cpos.shape[:2]
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    r = origin.shape[1]
    if rotation is None:
        rot_a = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (w, r, 3, 3))
    else:
        rot_a = quat_mod.to_mat3(jnp.asarray(rotation, jnp.float32))
    p6 = jnp.broadcast_to(
        jnp.pad(jnp.asarray(params, jnp.float32), (0, 6 - len(params)))[
            None, None], (w, r, 6))

    ctype = jnp.asarray(t.col_shape)
    is_hs = ctype == sh.HALFSPACE
    cparams = jnp.asarray(t.col_params)

    # ---- candidate axes [W,R,C,D,3] ----
    axes_a = [jnp.broadcast_to(rot_a[..., None, :, j], (w, r, c, 3))
              for j in range(3)]
    axes_b = [jnp.broadcast_to(crot[:, None, :, :, j], (w, r, c, 3))
              for j in range(3)]
    c2c = cpos[:, None] - origin[:, :, None]                      # [W,R,C,3]
    dn = jnp.broadcast_to(direction[:, :, None], (w, r, c, 3))
    cands = list(axes_a) + list(axes_b) + [c2c, dn]
    for i in range(3):
        for j in range(3):
            cr_ = jnp.cross(axes_a[i], axes_b[j])
            ln = jnp.linalg.norm(cr_, axis=-1, keepdims=True)
            cands.append(jnp.where(ln > 1e-8, cr_, c2c))
    # halfspace: ONLY the inward plane normal is a valid axis (B on the
    # -m side); others get gap = -inf below via masking
    m_plane = crot[:, None, :, :, 1]                              # [W,R,C,3]
    cands.append(jnp.where(is_hs[None, :, None], -m_plane, c2c))
    nd = jnp.stack(cands, axis=-2)                                # [W,R,C,D,3]
    nd = jnp.concatenate([nd, -nd], axis=-2)                      # ± both
    d_ax = nd.shape[-2]

    # ---- gaps at λ=0: gap_n = -h_B(-n) - h_A(n) ----
    # h_X(n) = n·p_X + g_X(R_X^T n)
    m_a = jnp.einsum("wrji,wrcdj->wrcdi", rot_a, nd)              # R_A^T n
    g_a = _support_h(kind, p6[:, :, None, None], m_a)
    h_a = jnp.sum(nd * origin[:, :, None, None], -1) + g_a
    m_b = jnp.einsum("wcji,wrcdj->wrcdi", crot, -nd)
    g_b = _support_h(ctype[None, None, :, None],
                     cparams[None, None, :, None], m_b)
    h_b_neg = jnp.sum(-nd * cpos[:, None, :, None], -1) + g_b
    gap = -h_b_neg - h_a                                          # [W,R,C,D]
    # halfspace: valid only on its dedicated axis slots (the ± of cand -1)
    if True:
        d_base = d_ax // 2
        ax_id = jnp.arange(d_ax) % d_base
        hs_ok = (ax_id == (d_base - 1))[None, None, None, :]
        gap = jnp.where(is_hs[None, None, :, None] & ~hs_ok, -1e9, gap)
        # the mirrored (+m_plane) slot must not certify a miss either
        sign_neg = (jnp.arange(d_ax) >= d_base)[None, None, None, :]
        gap = jnp.where(is_hs[None, None, :, None] & hs_ok & sign_neg,
                        -1e9, gap)

    closing = jnp.sum(nd * dn[..., None, :], -1)                  # n·d
    sep = gap > 0.0
    crossing = sep & (closing > 1e-12)
    lam = jnp.where(crossing, gap / jnp.maximum(closing, 1e-12), -1.0)
    toi_pair = jnp.max(lam, axis=-1)                              # [W,R,C]
    miss_cert = jnp.any(sep & (closing <= 1e-12), axis=-1)
    started_sep = jnp.any(sep, axis=-1)
    toi_pair = jnp.where(~started_sep, 0.0, toi_pair)   # already touching
    toi_pair = jnp.where(miss_cert | (toi_pair > max_toi)
                         | (toi_pair < 0.0), _BIG, toi_pair)

    best = jnp.argmin(toi_pair, axis=-1)                          # [W,R]
    best_toi = jnp.take_along_axis(toi_pair, best[..., None], -1)[..., 0]
    hit = best_toi < _BIG
    collider = jnp.where(hit, best, -1)
    body = jnp.where(hit, jnp.asarray(t.col_body)[best], -1)

    # achieving axis of the winning collider → hit normal (-n, outward
    # from the collider toward the cast shape)
    lam_best = jnp.take_along_axis(
        lam, best[..., None, None].repeat(d_ax, -1), axis=-2)[..., 0, :]
    n_best = jnp.take_along_axis(
        nd, best[..., None, None, None].repeat(d_ax, -2).repeat(3, -1),
        axis=-3)[..., 0, :, :]                                    # [W,R,D,3]
    ax_best = jnp.argmax(lam_best, axis=-1)                       # [W,R]
    n_hit = jnp.take_along_axis(
        n_best, ax_best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    n_hit = n_hit / jnp.maximum(
        jnp.linalg.norm(n_hit, axis=-1, keepdims=True), 1e-8)
    # contact point: the cast shape's support along n at the hit pose
    m_loc = jnp.einsum("wrji,wrj->wri", rot_a, n_hit)
    sp = _support_point(kind, p6, rot_a, m_loc)
    point = origin + direction * jnp.where(hit, best_toi, 0.0)[..., None] + sp

    return dict(hit=hit, toi=jnp.where(hit, best_toi, jnp.inf),
                collider=collider, body=body, point=point, normal=-n_hit)


def compute_contacts(state: PhysicsState, t: PhysicsTemplate, pred=0.002):
    """Contact introspection (the reference's narrow-phase contact queries,
    physics/mod.rs:2002-2018): runs the kind-grouped narrowphase over the
    static pair list and returns the flat manifold dict plus per-contact
    body pairs. Requires a dense (uncompacted) template."""
    from fyrox_tpu.physics import narrowphase as np_mod
    import numpy as _np
    if t.pair_kind_ranges is None:
        raise ValueError("compute_contacts requires a dense pair list")
    cpos, crot = _collider_world(state, t)
    cparams = jnp.asarray(t.col_params)
    pa_s, pb_s = t.pair_a, t.pair_b
    flat = np_mod.generate_contacts_flat(
        t.pair_kind_ranges,
        cparams[jnp.asarray(pa_s)][None], cpos[:, pa_s], crot[:, pa_s],
        cparams[jnp.asarray(pb_s)][None], cpos[:, pb_s], crot[:, pb_s],
        pred=jnp.asarray(pred, jnp.float32))
    pair_idx, _ = t.flat_layout()
    flat["body_a"] = _np.asarray(t.col_body[t.pair_a[pair_idx]])
    flat["body_b"] = _np.asarray(t.col_body[t.pair_b[pair_idx]])
    return flat
