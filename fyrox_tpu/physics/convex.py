"""Convex polyhedron colliders: hull data, mass properties, SAT kernels.

Parity rows from the reference's `ColliderShape` set
(fyrox-impl/src/scene/collider.rs:511): ConvexPolyhedron, plus dedicated
Cylinder/Cone collision — both are routed through n-gon prism/pyramid
hulls here (parry resolves them with GJK/EPA support functions; a padded
face-SAT over an n-gon hull is the TPU-shaped equivalent and replaces the
round-1 capsule proxy, which had the wrong silhouette for stacking).

Geometry storage is padded SoA on the template (`ConvexSet`): every
convex collider owns up to MAX_HULL_VERTS vertices and MAX_HULL_FACES
face normals; kernels mask the padding. Manifolds come from a
vertex-sampling clip: SAT picks the minimum-penetration face axis, then
the 4 deepest vertices of each body against the other's support plane
form the contact set. Exact for face-face stacking; edge-edge contacts
degrade to the 2 nearest vertices (TODO: edge-cross axes + polygon
clipping for parry-grade edge manifolds).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["MAX_HULL_VERTS", "MAX_HULL_FACES", "MAX_HULL_EDGES",
           "ConvexSet", "ConvexBuilder",
           "hull_from_points", "prism_hull", "cone_hull", "hull_mass",
           "convex_support", "convex_convex", "ball_convex",
           "convex_halfspace", "box_as_hull"]

MAX_HULL_VERTS = 32
MAX_HULL_FACES = 32
MAX_HULL_EDGES = 16
_EDGE_AXES = 8   # face-normal cap per side for SAT cross axes


def hull_from_points(points):
    """(verts [V,3], face_normals [F,3]) of the convex hull of `points`,
    deduplicating near-parallel face normals."""
    from scipy.spatial import ConvexHull
    pts = np.asarray(points, np.float64)
    hull = ConvexHull(pts)
    verts = pts[hull.vertices]
    normals = []
    for eq in hull.equations:            # [nx,ny,nz,d] with n·x + d <= 0
        n = eq[:3] / np.linalg.norm(eq[:3])
        if not any(np.dot(n, m) > 0.999 for m in normals):
            normals.append(n)
    if len(verts) > MAX_HULL_VERTS:
        raise ValueError(f"hull has {len(verts)} verts > {MAX_HULL_VERTS}; "
                         "decimate the collider hull")
    if len(normals) > MAX_HULL_FACES:
        raise ValueError(f"hull has {len(normals)} faces > {MAX_HULL_FACES}")
    return verts.astype(np.float32), np.asarray(normals, np.float32)


def hull_edge_dirs(points, max_edges=None):
    """Unique edge DIRECTIONS of the convex hull (for SAT cross axes).

    ±d count as one direction; capped at max_edges (the most-frequent
    directions win, so boxes keep their 3 and high-n prisms keep the
    dominant ring directions)."""
    from scipy.spatial import ConvexHull
    max_edges = MAX_HULL_EDGES if max_edges is None else max_edges
    pts = np.asarray(points, np.float64)
    hull = ConvexHull(pts)
    dirs, counts = [], []
    for simplex in hull.simplices:
        for i in range(3):
            a, b = pts[simplex[i]], pts[simplex[(i + 1) % 3]]
            d = b - a
            ln = np.linalg.norm(d)
            if ln < 1e-9:
                continue
            d = d / ln
            for k, e in enumerate(dirs):
                if abs(np.dot(d, e)) > 0.9999:
                    counts[k] += 1
                    break
            else:
                dirs.append(d)
                counts.append(1)
    order = np.argsort(counts)[::-1][:max_edges]
    return np.asarray([dirs[i] for i in order], np.float32)


def prism_hull(half_height, radius, n=8):
    """n-gon prism approximating a cylinder (axis = local +Y)."""
    ang = np.arange(n) * (2 * np.pi / n) + np.pi / n
    # circumscribe so the flats don't undercut the true radius
    r = radius / np.cos(np.pi / n)
    ring = np.stack([r * np.cos(ang), np.zeros(n), r * np.sin(ang)], 1)
    verts = np.concatenate([ring + [0, half_height, 0],
                            ring - [0, half_height, 0]])
    return hull_from_points(verts)


def cone_hull(half_height, radius, n=8):
    """n-gon pyramid approximating a cone (apex up, base at -hh)."""
    ang = np.arange(n) * (2 * np.pi / n) + np.pi / n
    r = radius / np.cos(np.pi / n)
    base = np.stack([r * np.cos(ang), np.full(n, -half_height),
                     r * np.sin(ang)], 1)
    verts = np.concatenate([base, [[0.0, half_height, 0.0]]])
    return hull_from_points(verts)


def hull_mass(verts, normals, density):
    """Exact mass + COM + inertia of a closed convex hull via signed
    tetrahedra against the hull centroid (parry MassProperties parity).
    Returns (mass, com [3], inertia about COM [3,3])."""
    from scipy.spatial import ConvexHull
    hull = ConvexHull(np.asarray(verts, np.float64))
    pts = hull.points
    ref = pts[hull.vertices].mean(axis=0)
    vol = 0.0
    com = np.zeros(3)
    inertia = np.zeros((3, 3))
    for simplex in hull.simplices:
        a, b, c = pts[simplex] - ref
        # outward orientation
        if np.dot(np.cross(b - a, c - a), a + b + c) < 0:
            b, c = c, b
        v = np.dot(a, np.cross(b, c)) / 6.0
        centroid = (a + b + c) / 4.0
        vol += v
        com += v * centroid
        # canonical tetra inertia (about ref) via covariance
        cov_canon = np.array([[1 / 60, 1 / 120, 1 / 120],
                              [1 / 120, 1 / 60, 1 / 120],
                              [1 / 120, 1 / 120, 1 / 60]])
        A = np.stack([a, b, c], 0)
        cov = 6.0 * v * A.T @ cov_canon @ A
        inertia += np.trace(cov) * np.eye(3) - cov
    com = ref + com / max(vol, 1e-12)
    mass = density * vol
    inertia = density * inertia
    d = com - ref
    inertia -= mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    return float(mass), com, inertia


class ConvexSet(NamedTuple):
    """Padded SoA hull storage for a template's convex colliders.

    verts   [NCx, MAX_HULL_VERTS, 3]  local-space (about body origin
                                      offsetting is the collider offset)
    vmask   [NCx, MAX_HULL_VERTS]     validity
    normals [NCx, MAX_HULL_FACES, 3]  unit outward face normals, local
    nmask   [NCx, MAX_HULL_FACES]
    """
    verts: np.ndarray
    vmask: np.ndarray
    normals: np.ndarray
    nmask: np.ndarray

    @property
    def count(self):
        return int(self.verts.shape[0])


class ConvexBuilder:
    def __init__(self):
        self.verts = []
        self.normals = []

    def add(self, verts, normals=None) -> int:
        if normals is None:
            verts, normals = hull_from_points(verts)
        self.verts.append(np.asarray(verts, np.float32))
        self.normals.append(np.asarray(normals, np.float32))
        return len(self.verts) - 1

    def build(self) -> "ConvexSet":
        n = len(self.verts)
        v = np.zeros((n, MAX_HULL_VERTS, 3), np.float32)
        vm = np.zeros((n, MAX_HULL_VERTS), bool)
        f = np.zeros((n, MAX_HULL_FACES, 3), np.float32)
        f[..., 1] = 1.0      # padded normals stay unit (masked anyway)
        fm = np.zeros((n, MAX_HULL_FACES), bool)
        for i, (vv, nn) in enumerate(zip(self.verts, self.normals)):
            v[i, :len(vv)] = vv
            vm[i, :len(vv)] = True
            f[i, :len(nn)] = nn
            fm[i, :len(nn)] = True
        return ConvexSet(v, vm, f, fm)


# --------------------------------------------------------------------------
# batched kernels (inputs gathered per pair; world-space verts/normals)
# --------------------------------------------------------------------------

_NEG = -1.0e9


def convex_support(verts_w, vmask, axis):
    """max_k axis·vert_k over valid verts. verts_w [...,V,3], axis [...,3]
    → [...] support value."""
    d = jnp.sum(verts_w * axis[..., None, :], -1)
    return jnp.max(jnp.where(vmask, d, _NEG), -1)


def _world_verts(pos, rot, verts, vmask):
    w = jnp.sum(rot[..., None, :, :] * verts[..., None, :], -1)
    return pos[..., None, :] + w, vmask


def box_as_hull(half):
    """Box half-extents [...,3] → padded hull arrays (8 verts, 6 normals)
    built inline so CUBOID pairs reuse the convex kernels."""
    sel = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                       for sz in (-1, 1)], half.dtype)          # [8,3]
    verts = sel * half[..., None, :]                            # [...,8,3]
    pad_v = jnp.zeros(half.shape[:-1] + (MAX_HULL_VERTS - 8, 3), half.dtype)
    verts = jnp.concatenate([verts, pad_v], axis=-2)
    vmask = jnp.concatenate(
        [jnp.ones(half.shape[:-1] + (8,), bool),
         jnp.zeros(half.shape[:-1] + (MAX_HULL_VERTS - 8,), bool)], -1)
    eye = jnp.concatenate([jnp.eye(3, dtype=half.dtype),
                           -jnp.eye(3, dtype=half.dtype)], 0)   # [6,3]
    normals = jnp.broadcast_to(eye, half.shape[:-1] + (6, 3))
    pad_n = jnp.zeros(half.shape[:-1] + (MAX_HULL_FACES - 6, 3), half.dtype)
    pad_n = pad_n.at[..., 1].set(1.0)
    normals = jnp.concatenate([normals, pad_n], axis=-2)
    nmask = jnp.concatenate(
        [jnp.ones(half.shape[:-1] + (6,), bool),
         jnp.zeros(half.shape[:-1] + (MAX_HULL_FACES - 6,), bool)], -1)
    return verts, vmask, normals, nmask


def convex_convex(pos_a, rot_a, va, vma, na, nma,
                  pos_b, rot_b, vb, vmb, nb, nmb, pred):
    """SAT over both bodies' face normals; manifold = 4 deepest vertices
    against the opposing support plane. Returns a narrowphase.Manifold
    (4-point). All hull arrays are LOCAL; poses world."""
    from fyrox_tpu.physics.narrowphase import Manifold

    wa, _ = _world_verts(pos_a, rot_a, va, vma)       # [...,V,3]
    wb, _ = _world_verts(pos_b, rot_b, vb, vmb)
    na_w = jnp.sum(rot_a[..., None, :, :] * na[..., None, :], -1)  # [...,F,3]
    nb_w = jnp.sum(rot_b[..., None, :, :] * nb[..., None, :], -1)

    def axis_pen(axes, amask):
        """penetration along each axis (oriented A→B): overlap of support
        intervals. axes [...,F,3] → pen [...,F]."""
        d = pos_b - pos_a
        dir_ = jnp.where(jnp.sum(axes * d[..., None, :], -1,
                                 keepdims=True) >= 0, 1.0, -1.0)
        ax = axes * dir_
        sup_a = convex_support(wa[..., None, :, :], vma[..., None, :],
                               ax)                      # [...,F]
        min_b = -convex_support(wb[..., None, :, :], vmb[..., None, :],
                                -ax)
        pen = sup_a - min_b
        return jnp.where(amask, pen, 1e9), ax

    pen_a, ax_a = axis_pen(na_w, nma)
    pen_b, ax_b = axis_pen(nb_w, nmb)

    # ---- edge-cross axes (classic polytope SAT). Hull edge directions
    # are approximated by the face-normal set (exact for boxes, whose
    # edges ARE face-normal-parallel; tight for prisms); capped at
    # _EDGE_AXES per side → _EDGE_AXES² cross axes.
    ecap = _EDGE_AXES
    ea_d = na_w[..., :ecap, :]
    eam = nma[..., :ecap]
    eb_d = nb_w[..., :ecap, :]
    ebm = nmb[..., :ecap]
    cr = jnp.cross(ea_d[..., :, None, :], eb_d[..., None, :, :])
    crm = eam[..., :, None] & ebm[..., None, :]
    crl = jnp.linalg.norm(cr, axis=-1)
    crm = crm & (crl > 1e-6)                      # parallel pairs drop out
    cr = cr / jnp.maximum(crl[..., None], 1e-12)
    flat = cr.shape[:-3] + (ecap * ecap, 3)
    pen_e, ax_e = axis_pen(cr.reshape(flat), crm.reshape(flat[:-1]))

    n_f = pen_a.shape[-1] + pen_b.shape[-1]
    pen_all = jnp.concatenate([pen_a, pen_b, pen_e], -1)
    ax_all = jnp.concatenate([ax_a, ax_b, ax_e], -2)
    best = jnp.argmin(pen_all, -1)
    oh = (best[..., None] == jnp.arange(pen_all.shape[-1]))
    best_pen = jnp.sum(jnp.where(oh, pen_all, 0.0), -1)
    normal = jnp.sum(jnp.where(oh[..., None], ax_all, 0.0), -2)
    nlen = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nlen, 1e-12)
    edge_win = best >= n_f

    # ---- edge-edge contact point: closest point between the two
    # supporting edges' LINES (midpoint), replacing the vertex-sampled
    # manifold when a cross axis is the minimum (parry's edge clipping)
    # winning cross pair: from the global argmin when an edge axis won,
    # else the best edge axis (the lateral-clip fallback path)
    ebest = jnp.argmin(pen_e, -1)
    eidx = jnp.where(best >= n_f, jnp.maximum(best - n_f, 0), ebest)
    ia = eidx // ecap
    ib = eidx % ecap
    oh_a = (ia[..., None] == jnp.arange(ecap)).astype(ea_d.dtype)
    oh_b = (ib[..., None] == jnp.arange(ecap)).astype(eb_d.dtype)
    da = jnp.sum(oh_a[..., None] * ea_d, -2)      # [...,3] edge dir on A
    db = jnp.sum(oh_b[..., None] * eb_d, -2)
    # support vertices along ±normal lie on the supporting edges
    sa_d = jnp.where(vma, jnp.sum(wa * normal[..., None, :], -1), _NEG)
    pa_oh = (jnp.argmax(sa_d, -1)[..., None]
             == jnp.arange(sa_d.shape[-1])).astype(wa.dtype)
    pa_pt = jnp.sum(pa_oh[..., None] * wa, -2)
    sb_d = jnp.where(vmb, -jnp.sum(wb * normal[..., None, :], -1), _NEG)
    pb_oh = (jnp.argmax(sb_d, -1)[..., None]
             == jnp.arange(sb_d.shape[-1])).astype(wb.dtype)
    pb_pt = jnp.sum(pb_oh[..., None] * wb, -2)
    w0 = pa_pt - pb_pt
    aa = jnp.sum(da * da, -1)
    bb = jnp.sum(da * db, -1)
    cc = jnp.sum(db * db, -1)
    dd = jnp.sum(da * w0, -1)
    ee = jnp.sum(db * w0, -1)
    den = aa * cc - bb * bb
    safe = jnp.abs(den) > 1e-9
    den_s = jnp.where(safe, den, 1.0)
    s_par = jnp.where(safe, (bb * ee - cc * dd) / den_s, 0.0)
    t_par = jnp.where(safe, (aa * ee - bb * dd) / den_s, 0.0)
    edge_pt = 0.5 * (pa_pt + s_par[..., None] * da
                     + pb_pt + t_par[..., None] * db)

    # vertex-sampled manifold: depth of B's verts below A's support plane
    # along n, and of A's verts above B's support plane
    sup_a = convex_support(wa, vma, normal)                       # [...]
    d_b = sup_a[..., None] - jnp.sum(wb * normal[..., None, :], -1)
    d_b = jnp.where(vmb, d_b, _NEG)                               # [...,V]
    min_b = -convex_support(wb, vmb, -normal)
    d_a = jnp.sum(wa * normal[..., None, :], -1) - min_b[..., None]
    d_a = jnp.where(vma, d_a, _NEG)

    pts_all = jnp.concatenate([wb, wa], -2)                       # [...,2V,3]
    dep_all = jnp.concatenate([d_b, d_a], -1)

    # lateral clip surrogate: a candidate vertex only forms a contact if
    # it lies (within a margin) INSIDE the opposite hull's face planes —
    # without this, depth-along-n alone selects e.g. the far endpoints of
    # a crossing edge, placing contacts outside the overlap region with
    # wrong lever arms (parry clips the incident polygon instead)
    lat_margin = jnp.asarray(pred) + 1e-3

    def _inside(p, nw, nmw, vw, vmw):
        """p [...,P,3] inside hull (world normals nw [...,F,3], verts vw)."""
        sup_f = jnp.max(jnp.where(vmw[..., None, :],
                                  jnp.sum(vw[..., None, :, :]
                                          * nw[..., :, None, :], -1),
                                  _NEG), -1)                      # [...,F]
        d = (jnp.sum(p[..., None, :, :] * nw[..., :, None, :], -1)
             - sup_f[..., None])                                  # [...,F,P]
        d = jnp.where(nmw[..., None], d, _NEG)
        return jnp.max(d, -2) <= lat_margin[..., None]            # [...,P]

    in_a = _inside(wb, na_w, nma, wa, vma)        # B's verts vs hull A
    in_b = _inside(wa, nb_w, nmb, wb, vmb)        # A's verts vs hull B
    lat_ok = jnp.concatenate([in_a, in_b], -1)
    dep_all = jnp.where(lat_ok, dep_all, _NEG)

    top_d, top_i = jax.lax.top_k(dep_all, 4)
    ohp = (top_i[..., :, None]
           == jnp.arange(dep_all.shape[-1]))[..., :, :].astype(pts_all.dtype)
    pts = jnp.sum(ohp[..., None] * pts_all[..., None, :, :], -2)
    predn = jnp.asarray(pred)[..., None]
    active = (top_d > -predn) & (best_pen[..., None] > -predn)

    # take the single line-line edge point when the winning axis is an
    # edge cross OR when the lateral clip left no vertex (pure edge-edge
    # overlap whose minimum axis tied with a face normal)
    use_edge = edge_win | (~jnp.any(active, -1)
                           & (best_pen > -jnp.asarray(pred)))
    ew1 = use_edge[..., None]
    ew2 = use_edge[..., None, None]
    e_sel = jnp.arange(4) == 0
    pts = jnp.where(ew2, jnp.where(e_sel[..., :, None],
                                   edge_pt[..., None, :], 0.0), pts)
    top_d = jnp.where(ew1, jnp.where(e_sel, best_pen[..., None], _NEG),
                      top_d)
    active = jnp.where(ew1,
                       e_sel & (best_pen[..., None] > -predn), active)
    return Manifold(normal, pts, top_d, active)


def ball_convex(pa, ra, pos_b, rot_b, vb, vmb, nb, nmb, pred):
    """Sphere vs hull: max signed face-plane distance of the center gives
    the separating face; exact in face regions, conservative at edges."""
    from fyrox_tpu.physics.narrowphase import Manifold, _empty_like
    nb_w = jnp.sum(rot_b[..., None, :, :] * nb[..., None, :], -1)  # [...,F,3]
    wb, _ = _world_verts(pos_b, rot_b, vb, vmb)
    # face plane offsets: d_f = max over verts of n_f·v
    plane_d = convex_support(wb[..., None, :, :], vmb[..., None, :], nb_w)
    sd = jnp.sum(nb_w * pa[..., None, :], -1) - plane_d           # [...,F]
    sd = jnp.where(nmb, sd, _NEG)
    fi = jnp.argmax(sd, -1)
    oh = (fi[..., None] == jnp.arange(sd.shape[-1]))
    dist = jnp.sum(jnp.where(oh, sd, 0.0), -1)
    n_face = jnp.sum(jnp.where(oh[..., None], nb_w, 0.0), -2)
    depth = ra - dist
    point = pa - n_face * dist[..., None]
    m = _empty_like(pa)
    # normal A→B: from ball toward hull = -n_face
    pts = m.points.at[..., 0, :].set(point)
    dep = m.depth.at[..., 0].set(depth)
    act = m.active.at[..., 0].set(depth > -pred)
    return Manifold(-n_face, pts, dep, act)


def convex_halfspace(pos_a, rot_a, va, vma, pos_p, rot_p, pred):
    """Hull vs plane: 4 deepest vertices below the plane."""
    from fyrox_tpu.physics.narrowphase import Manifold
    n = rot_p[..., :, 1]
    d = jnp.sum(n * pos_p, -1)
    wa, _ = _world_verts(pos_a, rot_a, va, vma)
    depth = d[..., None] - jnp.sum(wa * n[..., None, :], -1)
    depth = jnp.where(vma, depth, _NEG)
    top_d, top_i = jax.lax.top_k(depth, 4)
    oh = (top_i[..., :, None]
          == jnp.arange(depth.shape[-1])).astype(wa.dtype)
    pts = jnp.sum(oh[..., None] * wa[..., None, :, :], -2)
    return Manifold(-n, pts, top_d, top_d > -jnp.asarray(pred)[..., None])


import jax  # noqa: E402  (used by top_k above)
