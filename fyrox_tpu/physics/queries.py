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

__all__ = ["cast_ray", "sphere_cast", "compute_contacts"]

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
