"""Contact generation (narrowphase), batched over candidate pairs.

Replaces parry's narrowphase (external crate; see SURVEY.md §2.10
[NATIVE-DEP: rapier]). Each kernel takes pair-aligned arrays of collider
world poses + params and emits a fixed 4-point manifold:

    normal  [..., 3]   from A toward B (world)
    points  [..., 4, 3] world contact positions
    depth   [..., 4]   penetration depth (>0 = overlapping); points with
                       depth > -prediction are 'speculative' per rapier's
                       prediction_distance semantics
    active  [..., 4]   bool mask

Pair kinds are canonicalized (type_a <= type_b) by the dispatcher; every
kernel is evaluated for every pair and the result selected by type — the
compute-everything-select pattern that keeps the whole narrowphase one
vectorized program (no per-pair branching under jit).

Supported: ball-ball, ball-cuboid, ball-capsule, capsule-capsule,
capsule-cuboid, cuboid-cuboid (SAT + reference-face clipping), every
shape vs HALFSPACE, and CONVEX polyhedra via the dense SAT kernels
(physics/convex.py). Cylinder/cone carry registered 12-gon prism/
pyramid hulls (world.add_collider), so in hull-aware paths they resolve
through real SAT; only the hull-free plane path falls back to their
capsule proxy (KIND_POINTS rows). Segment/Triangle lower at build time
(world.add_collider) to zero-radius capsule / single-cell trimesh.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import jax

from fyrox_tpu.physics import shapes as sh

__all__ = ["Manifold", "generate_contacts"]

_EPS = 1e-9


class Manifold(NamedTuple):
    normal: jnp.ndarray   # [...,3] A→B
    points: jnp.ndarray   # [...,4,3]
    depth: jnp.ndarray    # [...,4]
    active: jnp.ndarray   # [...,4] bool


def _mk(normal, pts, depth, active):
    return Manifold(normal, pts, depth, active)


def _empty_like(pos_a):
    shape = pos_a.shape[:-1]
    return Manifold(
        normal=jnp.zeros(shape + (3,), pos_a.dtype),
        points=jnp.zeros(shape + (4, 3), pos_a.dtype),
        depth=jnp.full(shape + (4,), -1e9, pos_a.dtype),
        active=jnp.zeros(shape + (4,), bool),
    )


def _safe_normalize(v, fallback):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > _EPS, v / jnp.maximum(n, _EPS), fallback), n[..., 0]



def _predn(pred):
    """pred broadcastable against multi-point depth [..., n]: scalars get a
    length-1 trailing axis, [W,K] arrays become [W,K,1] (velocity-scaled
    speculative prediction for CCD passes per-slot pred arrays)."""
    return jnp.asarray(pred)[..., None]

def _one_point(m: Manifold, normal, point, depth, valid):
    pts = m.points.at[..., 0, :].set(point)
    dep = m.depth.at[..., 0].set(depth)
    act = m.active.at[..., 0].set(valid)
    return Manifold(normal, pts, dep, act)


# --------------------------------------------------------------------------
# sphere family
# --------------------------------------------------------------------------

def ball_ball(pa, ra, pb, rb, pred):
    d = pb - pa
    n, dist = _safe_normalize(d, jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), d.shape))
    depth = ra + rb - dist
    point = pa + n * (ra - 0.5 * depth)[..., None]
    m = _empty_like(pa)
    return _one_point(m, n, point, depth, depth > -pred)


def _closest_on_box(p_local, half):
    return jnp.clip(p_local, -half, half)


def ball_cuboid(pa, ra, pb, rot_b, half_b, pred):
    """Sphere A vs box B (rot_b: [...,3,3] world←local)."""
    rel = jnp.sum(rot_b * (pa - pb)[..., :, None], -2)  # R^T into box frame
    clamped = _closest_on_box(rel, half_b)
    delta = rel - clamped
    dist = jnp.linalg.norm(delta, axis=-1)
    outside = dist > _EPS

    # outside: normal from surface point toward sphere center
    n_out = delta / jnp.maximum(dist[..., None], _EPS)
    # inside: push along the axis of least penetration
    pen_axis = half_b - jnp.abs(rel)
    axis = jnp.argmin(pen_axis, axis=-1)
    eye = jnp.eye(3, dtype=rel.dtype)
    # masked reduction instead of take_along_axis (tiny-axis gathers are
    # slow on TPU; see core/curve.py sample)
    sign = jnp.sign(jnp.sum(rel * eye[axis], axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    n_in = eye[axis] * sign[..., None]
    depth_out = ra - dist
    depth_in = ra + jnp.min(pen_axis, axis=-1)
    n_local = jnp.where(outside[..., None], n_out, n_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surface_local = jnp.where(outside[..., None], clamped,
                              clamped * (1 - eye[axis]) + (half_b * eye[axis] * sign[..., None]))
    # to world; normal points box→sphere = B→A, flip for A→B convention
    n_world = jnp.sum(rot_b * n_local[..., None, :], -1)
    p_world = pb + jnp.sum(rot_b * surface_local[..., None, :], -1)
    m = _empty_like(pa)
    return _one_point(m, -n_world, p_world, depth, depth > -pred)


def _segment_endpoints(p, rot, hh):
    axis = rot[..., :, 1]  # local +Y column
    return p - axis * hh[..., None], p + axis * hh[..., None]


def _closest_point_on_segment(a, b, p):
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)
    t = jnp.clip(t, 0.0, 1.0)
    return a + ab * t[..., None]


def ball_capsule(pa, ra, pb, rot_b, hh_b, rb, pred):
    s0, s1 = _segment_endpoints(pb, rot_b, hh_b)
    c = _closest_point_on_segment(s0, s1, pa)
    return ball_ball(pa, ra, c, rb, pred)


def _closest_segment_segment(a0, a1, b0, b1):
    """Closest points between two segments (batched, branch-free)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > _EPS, jnp.clip((b * f - c * e) / jnp.maximum(denom, _EPS), 0, 1), 0.0)
    t = (b * s + f) / jnp.maximum(e, _EPS)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, _EPS), 0.0, 1.0)
    pa = a0 + d1 * s[..., None]
    pb = b0 + d2 * t[..., None]
    return pa, pb


def capsule_capsule(pa, rot_a, hh_a, ra, pb, rot_b, hh_b, rb, pred):
    a0, a1 = _segment_endpoints(pa, rot_a, hh_a)
    b0, b1 = _segment_endpoints(pb, rot_b, hh_b)
    ca, cb = _closest_segment_segment(a0, a1, b0, b1)
    return ball_ball(ca, ra, cb, rb, pred)


def capsule_cuboid(pa, rot_a, hh_a, ra, pb, rot_b, half_b, pred):
    """Capsule A vs box B: two sphere queries at the segment's closest
    approach ends (2-point manifold, adequate for resting stability)."""
    a0, a1 = _segment_endpoints(pa, rot_a, hh_a)
    m0 = ball_cuboid(a0, ra, pb, rot_b, half_b, pred)
    m1 = ball_cuboid(a1, ra, pb, rot_b, half_b, pred)
    # merge: take both single points
    m = _empty_like(pa)
    # prefer the deeper contact's normal
    deeper0 = m0.depth[..., 0] >= m1.depth[..., 0]
    normal = jnp.where(deeper0[..., None], m0.normal, m1.normal)
    pts = m.points.at[..., 0, :].set(m0.points[..., 0, :])
    pts = pts.at[..., 1, :].set(m1.points[..., 0, :])
    dep = m.depth.at[..., 0].set(m0.depth[..., 0]).at[..., 1].set(m1.depth[..., 0])
    act = m.active.at[..., 0].set(m0.active[..., 0]).at[..., 1].set(m1.active[..., 0])
    return Manifold(normal, pts, dep, act)


# --------------------------------------------------------------------------
# halfspace family (plane normal = collider local +Y)
# --------------------------------------------------------------------------

def _halfspace_frame(pp, rot_p):
    n = rot_p[..., :, 1]
    return n, jnp.sum(n * pp, axis=-1)  # plane normal + offset d (n·x = d)


def ball_halfspace(pa, ra, pp, rot_p, pred):
    n, d = _halfspace_frame(pp, rot_p)
    dist = jnp.sum(n * pa, axis=-1) - d
    depth = ra - dist
    point = pa - n * dist[..., None]
    m = _empty_like(pa)
    # normal must point A→B == toward the plane == -n
    return _one_point(m, -n, point, depth, depth > -pred)


def cuboid_halfspace(pa, rot_a, half_a, pp, rot_p, pred):
    """Box vs plane: up to 4 deepest corners."""
    n, d = _halfspace_frame(pp, rot_p)
    # 8 corners in world
    sel = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                      dtype=pa.dtype)                                  # [8,3]
    corners_local = sel * half_a[..., None, :]
    corners = pa[..., None, :] + jnp.sum(
        rot_a[..., None, :, :] * corners_local[..., None, :], -1)     # [...,8,3]
    depth = d[..., None] - jnp.sum(n[..., None, :] * corners, axis=-1)  # [...,8]
    # take the 4 deepest corners — selected with a one-hot contraction
    # rather than take_along_axis (tiny-axis gathers are slow on TPU)
    top_d, top_i = jax.lax.top_k(depth, 4)
    oh = (top_i[..., :, None]
          == jnp.arange(8, dtype=top_i.dtype)).astype(pa.dtype)       # [...,4,8]
    pts = jnp.sum(oh[..., None] * corners[..., None, :, :], -2)
    m = _empty_like(pa)
    return Manifold(-n, pts, top_d, top_d > -_predn(pred))


def capsule_halfspace(pa, rot_a, hh_a, ra, pp, rot_p, pred):
    n, d = _halfspace_frame(pp, rot_p)
    a0, a1 = _segment_endpoints(pa, rot_a, hh_a)
    m = _empty_like(pa)
    pts = m.points
    dep = m.depth
    act = m.active
    for k, e in enumerate((a0, a1)):
        dist = jnp.sum(n * e, axis=-1) - d
        depth = ra - dist
        point = e - n * dist[..., None]
        pts = pts.at[..., k, :].set(point)
        dep = dep.at[..., k].set(depth)
        act = act.at[..., k].set(depth > -pred)
    return Manifold(-n, pts, dep, act)


# --------------------------------------------------------------------------
# cuboid-cuboid: SAT + reference face clipping
# --------------------------------------------------------------------------

def _box_axes(rot):
    return rot[..., :, 0], rot[..., :, 1], rot[..., :, 2]


def cuboid_cuboid(pa, rot_a, half_a, pb, rot_b, half_b, pred):
    """SAT over 6 face axes + 9 edge-cross axes; manifold from clipping the
    incident face of B(or A) against the reference face side planes.

    This mirrors the classic OBB clip used by parry/box2d; manifolds have up
    to 4 points.
    """
    d = pb - pa
    axes_a = _box_axes(rot_a)
    axes_b = _box_axes(rot_b)

    # ---- SAT: find minimum-penetration axis ----
    def face_pen(axis, which):
        # penetration along a candidate separating axis
        ra = sum(half_a[..., i, None] * jnp.abs(jnp.sum(axes_a[i] * axis, -1, keepdims=True))
                 for i in range(3))[..., 0]
        rb = sum(half_b[..., i, None] * jnp.abs(jnp.sum(axes_b[i] * axis, -1, keepdims=True))
                 for i in range(3))[..., 0]
        dist = jnp.abs(jnp.sum(d * axis, -1))
        return ra + rb - dist

    best_pen = jnp.full(pa.shape[:-1], 1e9, pa.dtype)
    best_axis = jnp.zeros_like(d)
    # face axes (A then B); prefer earlier axes on ties via strict less-than
    for axis in (*axes_a, *axes_b):
        pen = face_pen(axis, None)
        better = pen < best_pen
        best_pen = jnp.where(better, pen, best_pen)
        best_axis = jnp.where(better[..., None], axis, best_axis)
    # edge-cross axes: contribute only the separation test (their manifolds
    # degrade to the face clip of the nearest face axis, adequate in batch)
    for i in range(3):
        for j in range(3):
            axis = jnp.cross(axes_a[i], axes_b[j])
            axis, ln = _safe_normalize(axis, best_axis)
            pen = face_pen(axis, None)
            valid = ln > 1e-6
            better = valid & (pen < best_pen - 1e-6)
            best_pen = jnp.where(better, pen, best_pen)
            best_axis = jnp.where(better[..., None], axis, best_axis)

    # orient normal A→B
    flip = jnp.sum(best_axis * d, -1) < 0
    normal = jnp.where(flip[..., None], -best_axis, best_axis)

    # ---- clip incident face of B against reference face of A ----
    # reference face: the face of A most along +normal
    def face_vertices(p, rot, half, axis_dir):
        """4 vertices of the face of a box whose outward normal is closest
        to axis_dir."""
        ax = _box_axes(rot)
        dots = jnp.stack([jnp.sum(a * axis_dir, -1) for a in ax], axis=-1)  # [...,3]
        face_i = jnp.argmax(jnp.abs(dots), axis=-1)
        eye = jnp.eye(3, dtype=p.dtype)
        fa = eye[face_i]  # one-hot of face axis [...,3]
        sign = jnp.sign(jnp.sum(dots * fa, axis=-1))
        sign = jnp.where(sign == 0, 1.0, sign)
        # local tangent axes = the other two
        ta = eye[(face_i + 1) % 3]
        tb = eye[(face_i + 2) % 3]
        hn = jnp.sum(half * fa, -1)
        ht1 = jnp.sum(half * ta, -1)
        ht2 = jnp.sum(half * tb, -1)
        n_l = fa * sign[..., None]
        corners = []
        for s1 in (-1, 1):
            for s2 in (-1, 1):
                c_local = (n_l * hn[..., None] + ta * (s1 * ht1)[..., None]
                           + tb * (s2 * ht2)[..., None])
                corners.append(p + jnp.sum(rot * c_local[..., None, :], -1))
        t1_w = jnp.sum(rot * ta[..., None, :], -1)
        t2_w = jnp.sum(rot * tb[..., None, :], -1)
        center = p + jnp.sum(rot * (n_l * hn[..., None])[..., None, :], -1)
        return jnp.stack(corners, axis=-2), center, t1_w, t2_w, ht1, ht2

    ref_pts, ref_c, ref_t1, ref_t2, ref_h1, ref_h2 = face_vertices(pa, rot_a, half_a, normal)
    inc_pts, _, _, _, _, _ = face_vertices(pb, rot_b, half_b, -normal)

    # clip incident face corners to the reference face's tangent bounds
    rel = inc_pts - ref_c[..., None, :]
    u = jnp.sum(rel * ref_t1[..., None, :], -1)
    v = jnp.sum(rel * ref_t2[..., None, :], -1)
    u = jnp.clip(u, -ref_h1[..., None], ref_h1[..., None])
    v = jnp.clip(v, -ref_h2[..., None], ref_h2[..., None])
    clipped = (ref_c[..., None, :] + u[..., None] * ref_t1[..., None, :]
               + v[..., None] * ref_t2[..., None, :])
    # depth of each incident corner along the contact normal, measured from
    # its unclamped position (projection onto the reference plane)
    plane_d = jnp.sum(normal * ref_c, -1)
    depth = plane_d[..., None] - jnp.sum(normal[..., None, :] * inc_pts, -1)
    pts = clipped
    active = (depth > -_predn(pred)) & (best_pen[..., None] > -_predn(pred))
    return Manifold(normal, pts, depth, active)


# --------------------------------------------------------------------------
# dispatcher
# --------------------------------------------------------------------------

def _k_ball_ball(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return ball_ball(pos_a, pa6[..., 0], pos_b, pb6[..., 0], pred)


def _k_ball_cuboid(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return ball_cuboid(pos_a, pa6[..., 0], pos_b, rot_b, pb6[..., :3], pred)


def _k_ball_capsule(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return ball_capsule(pos_a, pa6[..., 0], pos_b, rot_b, pb6[..., 0],
                        pb6[..., 1], pred)


def _k_ball_halfspace(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return ball_halfspace(pos_a, pa6[..., 0], pos_b, rot_b, pred)


def _k_cuboid_cuboid(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return cuboid_cuboid(pos_a, rot_a, pa6[..., :3], pos_b, rot_b,
                         pb6[..., :3], pred)


def _k_cuboid_capsule(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    m = capsule_cuboid(pos_b, rot_b, pb6[..., 0], pb6[..., 1],
                       pos_a, rot_a, pa6[..., :3], pred)
    return Manifold(-m.normal, m.points, m.depth, m.active)


def _k_cuboid_halfspace(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return cuboid_halfspace(pos_a, rot_a, pa6[..., :3], pos_b, rot_b, pred)


def _k_capsule_capsule(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return capsule_capsule(pos_a, rot_a, pa6[..., 0], pa6[..., 1],
                           pos_b, rot_b, pb6[..., 0], pb6[..., 1], pred)


def _k_capsule_halfspace(pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    return capsule_halfspace(pos_a, rot_a, pa6[..., 0], pa6[..., 1],
                             pos_b, rot_b, pred)


def effective_kind(t):
    """Collapse cylinder/cone onto their capsule proxy (host-side int)."""
    return sh.CAPSULE if t in (sh.CYLINDER, sh.CONE) else t


def manifold_points_dynamic(eff_a, eff_b):
    """KIND_POINTS as traced elementwise math over canonical effective
    kinds (the slab path pads every slot to 4 points; mass splitting
    needs the TRUE per-kind manifold size)."""
    four = (eff_a == sh.CUBOID) & ((eff_b == sh.CUBOID)
                                   | (eff_b == sh.HALFSPACE))
    two = (((eff_a == sh.CUBOID) & (eff_b == sh.CAPSULE))
           | ((eff_a == sh.CAPSULE) & (eff_b == sh.HALFSPACE)))
    return jnp.where(four, 4.0, jnp.where(two, 2.0, 1.0))


# kernel per canonicalized (effective_kind_a <= effective_kind_b) pair
KIND_KERNELS = {
    (sh.BALL, sh.BALL): _k_ball_ball,
    (sh.BALL, sh.CUBOID): _k_ball_cuboid,
    (sh.BALL, sh.CAPSULE): _k_ball_capsule,
    (sh.BALL, sh.HALFSPACE): _k_ball_halfspace,
    (sh.CUBOID, sh.CUBOID): _k_cuboid_cuboid,
    (sh.CUBOID, sh.CAPSULE): _k_cuboid_capsule,
    (sh.CUBOID, sh.HALFSPACE): _k_cuboid_halfspace,
    (sh.CAPSULE, sh.CAPSULE): _k_capsule_capsule,
    (sh.CAPSULE, sh.HALFSPACE): _k_capsule_halfspace,
}


# max useful manifold points per canonical pair kind (sphere contacts are
# single-point; capsules two; box faces four) — lets the dense contact
# layout skip the all-pairs-get-4-slots waste
KIND_POINTS = {
    (sh.BALL, sh.BALL): 1,
    (sh.BALL, sh.CUBOID): 1,
    (sh.BALL, sh.CAPSULE): 1,
    (sh.BALL, sh.HALFSPACE): 1,
    (sh.CUBOID, sh.CUBOID): 4,
    (sh.CUBOID, sh.CAPSULE): 2,
    (sh.CUBOID, sh.HALFSPACE): 4,
    (sh.CAPSULE, sh.CAPSULE): 1,
    (sh.CAPSULE, sh.HALFSPACE): 2,
    # convex polyhedra (SAT kernels, physics/convex.py) — dense mode only
    (sh.BALL, sh.CONVEX): 1,
    (sh.CUBOID, sh.CONVEX): 4,
    (sh.CAPSULE, sh.CONVEX): 2,
    (sh.HALFSPACE, sh.CONVEX): 4,
    (sh.CONVEX, sh.CONVEX): 4,
    # static scenery (point-sample kernels, physics/scenery.py)
    (sh.BALL, sh.HEIGHTFIELD): 1,
    (sh.CAPSULE, sh.HEIGHTFIELD): 2,
    (sh.CUBOID, sh.HEIGHTFIELD): 4,
    (sh.CONVEX, sh.HEIGHTFIELD): 4,
    (sh.BALL, sh.TRIMESH): 1,
    (sh.CAPSULE, sh.TRIMESH): 2,
    (sh.CUBOID, sh.TRIMESH): 4,
    (sh.CONVEX, sh.TRIMESH): 4,
}


def _scenery_kernel(ka, kb, scn_ctx, hull_a,
                    pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred, sl):
    """Canonical (dynamic kind, HEIGHTFIELD|TRIMESH) pair via the
    point-sample formulation (physics/scenery.py): sample the dynamic
    shape, contact each sample against the scenery surface, keep the 4
    deepest."""
    from fyrox_tpu.physics import scenery as sc_mod
    (hf_heights, hf_size, col_hf, tm_tris, tm_mask, col_tm,
     pair_a, pair_b) = scn_ctx
    hull = None
    if ka == sh.CONVEX:
        hull = (jnp.asarray(hull_a[0])[None], jnp.asarray(hull_a[1])[None])
    samples, radius = sc_mod.sample_points_for(ka, pa6, pos_a, rot_a,
                                               hull=hull)
    predn = jnp.asarray(pred)
    if jnp.ndim(predn) == 0:
        predn = jnp.broadcast_to(predn, pos_a.shape[:-1])
    if kb == sh.HEIGHTFIELD:
        idx = col_hf[pair_b[sl]]
        heights = jnp.asarray(hf_heights[idx])[None]
        sx = jnp.asarray(hf_size[idx, 0])[None]
        sz = jnp.asarray(hf_size[idx, 1])[None]
        normal, p_w, depth, active = sc_mod.points_heightfield(
            samples, radius, pos_b, rot_b, heights, sx, sz, predn)
    else:
        idx = col_tm[pair_b[sl]]
        tris = jnp.asarray(tm_tris[idx])[None]
        mask = jnp.asarray(tm_mask[idx])[None]
        # two-sided trimesh distance cannot represent penetration for
        # zero-radius samples (box corners, hull verts): give every
        # sample a Bullet-style collision margin so the solver has a
        # representable depth band around the surface
        radius = jnp.maximum(radius, 0.04)
        normal, p_w, depth, active = sc_mod.points_trimesh(
            samples, radius, pos_b, rot_b, tris, mask, predn)
    # 4-slot manifold from the deepest samples
    n_s = depth.shape[-1]
    if n_s <= 4:
        padn = 4 - n_s
        pts4 = jnp.concatenate(
            [p_w, jnp.zeros(p_w.shape[:-2] + (padn, 3), p_w.dtype)], -2)
        dep4 = jnp.concatenate(
            [depth, jnp.full(depth.shape[:-1] + (padn,), -1e9, depth.dtype)], -1)
        act4 = jnp.concatenate(
            [active, jnp.zeros(active.shape[:-1] + (padn,), bool)], -1)
        return Manifold(normal, pts4, dep4, act4)
    top_d, top_i = jax.lax.top_k(jnp.where(active, depth, -1e9), 4)
    oh = (top_i[..., None] == jnp.arange(n_s)).astype(p_w.dtype)
    pts = jnp.sum(oh[..., None] * p_w[..., None, :, :], -2)
    act = (jnp.sum(oh * active.astype(p_w.dtype)[..., None, :], -1) > 0.5) \
        & (top_d > -1e8)
    dep = jnp.sum(oh * depth[..., None, :], -1)
    return Manifold(normal, pts, dep, act)


def _convex_kernel(ka, kb, hull_a, hull_b,
                   pa6, pos_a, rot_a, pb6, pos_b, rot_b, pred):
    """Dispatch a canonical (ka, kb) pair where kb (or both) is CONVEX.
    hull_a/hull_b: (verts, vmask, normals, nmask) constant per-pair arrays
    ([P,V,3] etc, broadcast over worlds) or None for non-convex sides."""
    from fyrox_tpu.physics import convex as cx
    vb, vmb, nb, nmb = (jnp.asarray(h)[None] for h in hull_b)
    if ka == sh.BALL:
        return cx.ball_convex(pos_a, pa6[..., 0], pos_b, rot_b,
                              vb, vmb, nb, nmb, pred)
    if ka == sh.CUBOID:
        va, vma, na, nma = cx.box_as_hull(pa6[..., :3])
        return cx.convex_convex(pos_a, rot_a, va, vma, na, nma,
                                pos_b, rot_b, vb, vmb, nb, nmb, pred)
    if ka == sh.CAPSULE:
        a0, a1 = _segment_endpoints(pos_a, rot_a, pa6[..., 0])
        ra = pa6[..., 1]
        m0 = cx.ball_convex(a0, ra, pos_b, rot_b, vb, vmb, nb, nmb, pred)
        m1 = cx.ball_convex(a1, ra, pos_b, rot_b, vb, vmb, nb, nmb, pred)
        m = _empty_like(pos_a)
        deeper0 = m0.depth[..., 0] >= m1.depth[..., 0]
        normal = jnp.where(deeper0[..., None], m0.normal, m1.normal)
        pts = m.points.at[..., 0, :].set(m0.points[..., 0, :])
        pts = pts.at[..., 1, :].set(m1.points[..., 0, :])
        dep = (m.depth.at[..., 0].set(m0.depth[..., 0])
               .at[..., 1].set(m1.depth[..., 0]))
        act = (m.active.at[..., 0].set(m0.active[..., 0])
               .at[..., 1].set(m1.active[..., 0]))
        return Manifold(normal, pts, dep, act)
    if ka == sh.HALFSPACE:
        m = cx.convex_halfspace(pos_b, rot_b, vb, vmb, pos_a, rot_a, pred)
        return Manifold(-m.normal, m.points, m.depth, m.active)
    if ka == sh.CONVEX:
        va, vma, na, nma = (jnp.asarray(h)[None] for h in hull_a)
        return cx.convex_convex(pos_a, rot_a, va, vma, na, nma,
                                pos_b, rot_b, vb, vmb, nb, nmb, pred)
    raise NotImplementedError((ka, kb))


def _hull_gather(hull_ctx, side, sl):
    """Static per-pair hull arrays for one kind-range slice."""
    hulls, col_hull, pair_a, pair_b = hull_ctx
    pairs = pair_a if side == 0 else pair_b
    idx = col_hull[pairs[sl]]
    return (hulls.verts[idx], hulls.vmask[idx],
            hulls.normals[idx], hulls.nmask[idx])


# kind combos per manifold-size class (canonical effective ordering);
# class 0 = 1 point, 1 = 2 points, 2 = 4 points — see broadphase.CLASS_NPTS
CLASS_COMBOS = {
    0: [(sh.BALL, sh.BALL), (sh.BALL, sh.CUBOID), (sh.BALL, sh.CAPSULE),
        (sh.BALL, sh.HALFSPACE), (sh.CAPSULE, sh.CAPSULE)],
    1: [(sh.CUBOID, sh.CAPSULE), (sh.CAPSULE, sh.HALFSPACE)],
    2: [(sh.CUBOID, sh.CUBOID), (sh.CUBOID, sh.HALFSPACE)],
}

# convex combos per class (runtime-hull kernels; only evaluated when the
# caller supplies hull data — pure-primitive scenes pay nothing)
CLASS_COMBOS_CONVEX = {
    0: [(sh.BALL, sh.CONVEX)],
    1: [(sh.CAPSULE, sh.CONVEX)],
    2: [(sh.CUBOID, sh.CONVEX), (sh.HALFSPACE, sh.CONVEX),
        (sh.CONVEX, sh.CONVEX)],
}


def generate_contacts_class(cls, type_a, params_a, pos_a, rot_a,
                            type_b, params_b, pos_b, rot_b, pred,
                            hull_a=None, hull_b=None,
                            include_primitives=True):
    """Manifolds for canonically-ordered pairs KNOWN to be in one
    manifold-size class: runs only that class's kernels (the grid
    broadphase compacts candidates per class, so e.g. box-box clipping
    never runs on sphere pairs). Inputs as generate_contacts; returns a
    Manifold with the point axis sliced to the class's size.

    hull_a/hull_b: optional (verts, vmask, normals, nmask) slot-aligned
    hull arrays for CONVEX pairs (slab runtime path). When absent, convex
    combos are skipped. include_primitives=False runs ONLY the convex
    combos (the slab-v2 plane path handles primitives in plane form and
    calls back here just for the hull kernels)."""
    npts = {0: 1, 1: 2, 2: 4}[cls]
    is_capsuleish_a = (type_a == sh.CAPSULE) | (type_a == sh.CYLINDER) | (type_a == sh.CONE)
    is_capsuleish_b = (type_b == sh.CAPSULE) | (type_b == sh.CYLINDER) | (type_b == sh.CONE)
    eff_a = jnp.where(is_capsuleish_a, sh.CAPSULE, type_a)
    eff_b = jnp.where(is_capsuleish_b, sh.CAPSULE, type_b)

    out = _empty_like(pos_a)

    def sel(cond, m_true, m_false):
        c1 = cond[..., None]
        c2 = cond[..., None, None]
        return Manifold(jnp.where(c1, m_true.normal, m_false.normal),
                        jnp.where(c2, m_true.points, m_false.points),
                        jnp.where(c1, m_true.depth, m_false.depth),
                        jnp.where(c1, m_true.active, m_false.active))

    if include_primitives:
        for (ka, kb) in CLASS_COMBOS[cls]:
            kern = KIND_KERNELS[(ka, kb)]
            m = kern(params_a, pos_a, rot_a, params_b, pos_b, rot_b, pred)
            out = sel((eff_a == ka) & (eff_b == kb), m, out)
    if hull_b is not None:
        from fyrox_tpu.physics import convex as cx
        vb, vmb, nb_, nmb = hull_b
        for (ka, kb) in CLASS_COMBOS_CONVEX[cls]:
            if ka == sh.BALL:
                m = cx.ball_convex(pos_a, params_a[..., 0], pos_b, rot_b,
                                   vb, vmb, nb_, nmb, pred)
            elif ka == sh.CAPSULE:
                a0, a1 = _segment_endpoints(pos_a, rot_a, params_a[..., 0])
                ra = params_a[..., 1]
                m0 = cx.ball_convex(a0, ra, pos_b, rot_b, vb, vmb, nb_, nmb,
                                    pred)
                m1 = cx.ball_convex(a1, ra, pos_b, rot_b, vb, vmb, nb_, nmb,
                                    pred)
                mm = _empty_like(pos_a)
                deeper0 = m0.depth[..., 0] >= m1.depth[..., 0]
                nrm = jnp.where(deeper0[..., None], m0.normal, m1.normal)
                pts = mm.points.at[..., 0, :].set(m0.points[..., 0, :])
                pts = pts.at[..., 1, :].set(m1.points[..., 0, :])
                dep = (mm.depth.at[..., 0].set(m0.depth[..., 0])
                       .at[..., 1].set(m1.depth[..., 0]))
                act = (mm.active.at[..., 0].set(m0.active[..., 0])
                       .at[..., 1].set(m1.active[..., 0]))
                m = Manifold(nrm, pts, dep, act)
            elif ka == sh.CUBOID:
                va, vma, na_, nma = cx.box_as_hull(params_a[..., :3])
                m = cx.convex_convex(pos_a, rot_a, va, vma, na_, nma,
                                     pos_b, rot_b, vb, vmb, nb_, nmb, pred)
            elif ka == sh.HALFSPACE:
                mh = cx.convex_halfspace(pos_b, rot_b, vb, vmb,
                                         pos_a, rot_a, pred)
                m = Manifold(-mh.normal, mh.points, mh.depth, mh.active)
            else:  # CONVEX-CONVEX
                va, vma, na_, nma = hull_a
                m = cx.convex_convex(pos_a, rot_a, va, vma, na_, nma,
                                     pos_b, rot_b, vb, vmb, nb_, nmb, pred)
            out = sel((eff_a == ka) & (eff_b == kb), m, out)
    return Manifold(normal=out.normal, points=out.points[..., :npts, :],
                    depth=out.depth[..., :npts], active=out.active[..., :npts])


def flat_contact_layout(kind_ranges):
    """Static per-point pair mapping for the compact dense layout.

    Returns (pair_idx [K] int32, K) where each pair contributes
    KIND_POINTS[kind] contact slots.
    """
    import numpy as _np
    idx = []
    for (ka, kb), s0, s1 in kind_ranges:
        npts = KIND_POINTS[(ka, kb)]
        for p in range(s0, s1):
            idx.extend([p] * npts)
    return _np.asarray(idx, _np.int32), len(idx)


def generate_contacts_flat(kind_ranges, params_a, pos_a, rot_a,
                           params_b, pos_b, rot_b, pred, hull_ctx=None,
                           scenery_ctx=None):
    """Kind-grouped narrowphase emitting the COMPACT flat contact layout:
    dict(normal [W,K,3], point [W,K,3], depth [W,K], active [W,K]) with K
    from flat_contact_layout (per-kind manifold sizes, no padding to 4)."""
    normals, points, depths, actives = [], [], [], []
    for (ka, kb), s0, s1 in kind_ranges:
        npts = KIND_POINTS[(ka, kb)]
        sl = slice(s0, s1)
        pr = pred[:, sl] if jnp.ndim(pred) >= 2 else pred
        if kb == sh.CONVEX:
            hull_a = _hull_gather(hull_ctx, 0, sl) if ka == sh.CONVEX else None
            hull_b = _hull_gather(hull_ctx, 1, sl)
            m = _convex_kernel(ka, kb, hull_a, hull_b,
                               params_a[:, sl], pos_a[:, sl], rot_a[:, sl],
                               params_b[:, sl], pos_b[:, sl], rot_b[:, sl], pr)
        elif kb in (sh.HEIGHTFIELD, sh.TRIMESH):
            hull_a = (_hull_gather(hull_ctx, 0, sl)[:2]
                      if ka == sh.CONVEX else None)
            m = _scenery_kernel(ka, kb, scenery_ctx, hull_a,
                                params_a[:, sl], pos_a[:, sl], rot_a[:, sl],
                                params_b[:, sl], pos_b[:, sl], rot_b[:, sl],
                                pr, sl)
        else:
            kern = KIND_KERNELS[(ka, kb)]
            m = kern(params_a[:, sl], pos_a[:, sl], rot_a[:, sl],
                     params_b[:, sl], pos_b[:, sl], rot_b[:, sl], pr)
        w = m.points.shape[0]
        normals.append(jnp.repeat(m.normal, npts, axis=1))
        points.append(m.points[:, :, :npts].reshape(w, -1, 3))
        depths.append(m.depth[:, :, :npts].reshape(w, -1))
        actives.append(m.active[:, :, :npts].reshape(w, -1))
    return dict(normal=jnp.concatenate(normals, 1),
                point=jnp.concatenate(points, 1),
                depth=jnp.concatenate(depths, 1),
                active=jnp.concatenate(actives, 1))


def generate_contacts_grouped(kind_ranges, params_a, pos_a, rot_a,
                              params_b, pos_b, rot_b, pred):
    """Narrowphase over a kind-sorted static pair list.

    kind_ranges: list of ((kind_a, kind_b), start, end) with pairs sorted so
    each kernel runs ONLY on its contiguous slice — no wasted
    compute-everything-select work (that path remains for dynamic compacted
    slots in `generate_contacts`).
    """
    outs = []
    for (ka, kb), s0, s1 in kind_ranges:
        kern = KIND_KERNELS[(ka, kb)]
        sl = slice(s0, s1)
        pr = pred[:, sl] if jnp.ndim(pred) >= 2 else pred
        outs.append(kern(params_a[:, sl], pos_a[:, sl], rot_a[:, sl],
                         params_b[:, sl], pos_b[:, sl], rot_b[:, sl], pr))
    return Manifold(
        normal=jnp.concatenate([m.normal for m in outs], axis=1),
        points=jnp.concatenate([m.points for m in outs], axis=1),
        depth=jnp.concatenate([m.depth for m in outs], axis=1),
        active=jnp.concatenate([m.active for m in outs], axis=1),
    )


def generate_contacts(type_a, params_a, pos_a, rot_a,
                      type_b, params_b, pos_b, rot_b, pred):
    """Compute manifolds for pair-aligned collider arrays.

    type_*: [...,] int; params_*: [...,6]; pos_*: [...,3]; rot_*: [...,3,3]
    (world rotation matrices). Assumes the dispatcher caller canonicalized
    each pair so type_a <= type_b. Cylinders/cones use their capsule proxy.
    """
    # capsule proxies for cylinder/cone
    is_capsuleish_a = (type_a == sh.CAPSULE) | (type_a == sh.CYLINDER) | (type_a == sh.CONE)
    is_capsuleish_b = (type_b == sh.CAPSULE) | (type_b == sh.CYLINDER) | (type_b == sh.CONE)
    eff_a = jnp.where(is_capsuleish_a, sh.CAPSULE, type_a)
    eff_b = jnp.where(is_capsuleish_b, sh.CAPSULE, type_b)

    ra = params_a[..., 0]
    half_a = params_a[..., :3]
    hh_a, rcap_a = params_a[..., 0], params_a[..., 1]
    rb = params_b[..., 0]
    half_b = params_b[..., :3]
    hh_b, rcap_b = params_b[..., 0], params_b[..., 1]

    mans = {}
    mans["bb"] = ball_ball(pos_a, ra, pos_b, rb, pred)
    mans["bc"] = ball_cuboid(pos_a, ra, pos_b, rot_b, half_b, pred)
    mans["bk"] = ball_capsule(pos_a, ra, pos_b, rot_b, hh_b, rcap_b, pred)
    mans["bh"] = ball_halfspace(pos_a, ra, pos_b, rot_b, pred)
    mans["cc"] = cuboid_cuboid(pos_a, rot_a, half_a, pos_b, rot_b, half_b, pred)
    mans["ch"] = cuboid_halfspace(pos_a, rot_a, half_a, pos_b, rot_b, pred)
    mans["kk"] = capsule_capsule(pos_a, rot_a, hh_a, rcap_a,
                                 pos_b, rot_b, hh_b, rcap_b, pred)
    mans["kh"] = capsule_halfspace(pos_a, rot_a, hh_a, rcap_a, pos_b, rot_b, pred)
    # capsule(A)-cuboid(B) arrives canonicalized as cuboid(A)-capsule(B)
    # (CUBOID < CAPSULE in the tag order); compute with swapped roles and
    # flip the normal back.
    m_ck = capsule_cuboid(pos_b, rot_b, hh_b, rcap_b, pos_a, rot_a, half_a, pred)
    mans["ck"] = Manifold(-m_ck.normal, m_ck.points, m_ck.depth, m_ck.active)

    def sel(cond, m_true, m_false):
        c1 = cond[..., None]
        c2 = cond[..., None, None]
        return Manifold(jnp.where(c1, m_true.normal, m_false.normal),
                        jnp.where(c2, m_true.points, m_false.points),
                        jnp.where(c1, m_true.depth, m_false.depth),
                        jnp.where(c1, m_true.active, m_false.active))

    is_ = lambda ta, tb: (eff_a == ta) & (eff_b == tb)
    out = _empty_like(pos_a)
    out = sel(is_(sh.BALL, sh.BALL), mans["bb"], out)
    out = sel(is_(sh.BALL, sh.CUBOID), mans["bc"], out)
    out = sel(is_(sh.BALL, sh.CAPSULE), mans["bk"], out)
    out = sel(is_(sh.BALL, sh.HALFSPACE), mans["bh"], out)
    out = sel(is_(sh.CUBOID, sh.CUBOID), mans["cc"], out)
    out = sel(is_(sh.CUBOID, sh.HALFSPACE), mans["ch"], out)
    out = sel(is_(sh.CUBOID, sh.CAPSULE), mans["ck"], out)
    out = sel(is_(sh.CAPSULE, sh.CAPSULE), mans["kk"], out)
    out = sel(is_(sh.CAPSULE, sh.HALFSPACE), mans["kh"], out)
    return out
