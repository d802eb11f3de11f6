"""Batched rigid-body world: template, state, and the step pipeline.

Equivalent of the reference's `PhysicsWorld` (fyrox-impl/src/scene/graph/
physics/mod.rs:916) which wraps rapier3d's PhysicsPipeline (:939-968,
update :1151-1203). The TPU pipeline per step:

    1. integrate forces      (gravity * gravity_scale + user forces)
    2. broadphase            AABB overlap over a static candidate pair
                             list, compacted to MAX_ACTIVE_PAIRS slots
    3. narrowphase           shape-pair manifolds (narrowphase.py)
    4. velocity solve        Jacobi + mass-splitting impulses (solver.py)
    5. integrate positions   semi-implicit Euler, quaternion update
    6. damping               v *= 1/(1 + dt*damping)  (rapier convention)

Sleeping/islands are replaced by dense masking (see SURVEY.md §5
long-context row): static/kinematic bodies have inv_mass = 0.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core import quat
from fyrox_tpu.physics import narrowphase as np_mod
from fyrox_tpu.physics import shapes as sh
from fyrox_tpu.physics import solver as solver_mod

__all__ = ["BodyType", "PhysicsTemplate", "PhysicsBuilder", "PhysicsState",
           "init_physics_state", "step_physics"]

DYNAMIC, STATIC, KINEMATIC = 0, 1, 2

# speculative contact activation / fat-AABB margin. Wider than rapier's
# prediction_distance (0.002, physics/mod.rs:855) by design: the TGS
# sep/h bias turns every activated-but-separated contact into an exact
# approach limiter, which is what lets piles dropped from height settle
# without transient interpenetration.
SPECULATIVE_MARGIN = 0.05
# rapier's contact activation distance (IntegrationParameters::
# prediction_distance default, physics/mod.rs:900). Everything rapier
# itself would generate lives within THIS margin; the wider
# SPECULATIVE_MARGIN band above is our approach-limiter extension. Under
# slot-window overflow, compaction packs the rapier-equivalent tier
# first (broadphase.slab_candidates tight_delta / slab2._compact), so
# capacity pressure only ever drops beyond-rapier speculative extras.
PREDICTION_DISTANCE = 0.002


class BodyType:
    DYNAMIC, STATIC, KINEMATIC = DYNAMIC, STATIC, KINEMATIC


@dataclass
class PhysicsTemplate:
    # bodies
    body_node: np.ndarray          # [B] scene node index (-1 standalone)
    body_type: np.ndarray          # [B]
    inv_mass: np.ndarray           # [B] f32 (0 for non-dynamic)
    inv_inertia_local: np.ndarray  # [B,3,3]
    com_local: np.ndarray          # [B,3]
    lin_damping: np.ndarray        # [B]
    ang_damping: np.ndarray        # [B]
    gravity_scale: np.ndarray      # [B]
    # colliders
    col_body: np.ndarray           # [C]
    col_shape: np.ndarray          # [C]
    col_params: np.ndarray         # [C,6]
    col_pos: np.ndarray            # [C,3]
    col_rot: np.ndarray            # [C,4]
    col_friction: np.ndarray       # [C]
    col_restitution: np.ndarray    # [C]
    col_node: np.ndarray           # [C] scene node (-1)
    # broadphase candidate pairs (host-precomputed, canonicalized by shape tag)
    pair_a: np.ndarray             # [P] collider index
    pair_b: np.ndarray             # [P]
    pair_kind_ranges: list = None  # [((kind_a,kind_b), start, end)] — pairs
                                   # sorted by shape kind for the grouped
                                   # narrowphase (dense mode)
    # axis locks (1 = free, 0 = locked): the 2D twin (rapier2d equivalent,
    # scene/dim2/physics) is expressed as z-translation + x/y-rotation locks
    lin_lock: np.ndarray = None    # [B,3]
    ang_lock: np.ndarray = None    # [B,3]
    joints: object = None          # JointSet (impulse joints, joint.rs:775)
    max_active_pairs: int = 0      # compaction width (0 = use P)
    grid: object = None            # broadphase.GridConfig (hash-grid mode)
    # convex-polyhedron geometry (collider.rs:511 ConvexPolyhedron parity;
    # cylinders/cones route through n-gon prism/pyramid hulls in dense
    # mode instead of the round-1 capsule proxy)
    hulls: object = None           # convex.ConvexSet
    col_hull: np.ndarray = None    # [C] hull index (-1 none)
    # static scenery shapes (collider.rs:511 Heightfield / Trimesh rows;
    # physics/scenery.py kernels). All heightfields in a scene share one
    # resolution (pad on the host if needed).
    hf_heights: np.ndarray = None  # [Nhf, Rz, Rx]
    hf_size: np.ndarray = None     # [Nhf, 2] (size_x, size_z)
    col_hf: np.ndarray = None      # [C] heightfield index (-1)
    tm_tris: np.ndarray = None     # [Ntm, MAX_TRIS, 3, 3] local
    tm_mask: np.ndarray = None     # [Ntm, MAX_TRIS]
    col_tm: np.ndarray = None      # [C] trimesh index (-1)
    # builder-time initial body poses (engine fallback for standalone
    # bodies whose node == -1)
    init_body_pos: np.ndarray = None   # [B,3]
    init_body_rot: np.ndarray = None   # [B,4]
    # solver config (reference defaults physics/mod.rs:892-908)
    erp: float = 0.2
    allowed_linear_error: float = 0.002
    max_corrective_velocity: float = 10.0
    restitution_threshold: float = 1.0
    n_substeps: int = 4          # num_solver_iterations (physics/mod.rs:892)
    n_pgs: int = 1               # num_internal_pgs_iterations
    n_stabilization: int = 4     # num_internal_stabilization_iterations
    warmstart_coefficient: float = 1.0   # physics/mod.rs:877
    mass_split_pow: float = 0.5          # solver.SolverParams.mass_split_pow
    gravity: tuple = (0.0, -9.81, 0.0)   # physics/mod.rs:1118
    # broadphase temporal reuse (slab-v2 path only): rebuild the candidate
    # windows every N steps from two-sided temporally-fattened AABBs and
    # reuse them in between (rapier's incremental-SAP margin analog —
    # candidates stay a superset of the true overlap set, so reuse is
    # semantically exact while amortizing the rebuild cost N×).
    broadphase_period: int = 1

    @property
    def num_bodies(self):
        return int(self.body_node.shape[0])

    @property
    def num_colliders(self):
        return int(self.col_body.shape[0])

    @property
    def num_pairs(self):
        return int(self.pair_a.shape[0])

    def flat_layout(self):
        """(pair_idx [K], K): the compact per-kind contact-slot layout
        (narrowphase.KIND_POINTS) used in dense mode."""
        if getattr(self, "_flat_layout", None) is None:
            from fyrox_tpu.physics.narrowphase import flat_contact_layout
            self._flat_layout = flat_contact_layout(self.pair_kind_ranges or [])
        return self._flat_layout

    def incidence(self):
        """Static one-hot contact→body incidence [K,B] for the compact
        layout, cached. Used by the solver's MXU matmul gather/scatter fast
        path (only valid without broadphase compaction, where contact slot
        k always maps to the same body)."""
        if getattr(self, "_incidence", None) is None:
            pair_idx, k = self.flat_layout()
            b = self.num_bodies
            inc_a = np.zeros((k, b), np.float32)
            inc_b = np.zeros((k, b), np.float32)
            ba = self.col_body[self.pair_a[pair_idx]]
            bb = self.col_body[self.pair_b[pair_idx]]
            inc_a[np.arange(k), ba] = 1.0
            inc_b[np.arange(k), bb] = 1.0
            self._incidence = (inc_a, inc_b)
        return self._incidence


class PhysicsState(NamedTuple):
    """[W,B,...] rigid body state. position = body frame origin (the node's
    global position, physics/mod.rs:1447-1475 sync semantics).

    warm_*: accumulated contact impulses per contact slot from the previous
    step (rapier warmstart, physics/mod.rs:877); warm_pair tracks which
    candidate pair occupied each slot so compacted broadphase slots only
    warmstart when they still hold the same pair."""
    position: jnp.ndarray     # [W,B,3]
    rotation: jnp.ndarray     # [W,B,4] quat xyzw
    linvel: jnp.ndarray       # [W,B,3] at center of mass
    angvel: jnp.ndarray       # [W,B,3] world
    force: jnp.ndarray        # [W,B,3] user force accumulator (cleared/step)
    torque: jnp.ndarray       # [W,B,3]
    warm_n: Optional[jnp.ndarray] = None    # [W,K]
    warm_t1: Optional[jnp.ndarray] = None   # [W,K]
    warm_t2: Optional[jnp.ndarray] = None   # [W,K]
    warm_pair: Optional[jnp.ndarray] = None # [W,K//4] int32 pair id per slot
    # broadphase temporal-reuse cache (template.broadphase_period > 1 on
    # the slab-v2 path): per manifold class a (j_real, body_j, valid,
    # swap, pid) tuple of [W,Kc] slot tensors, plus the step age that
    # schedules rebuilds. None everywhere else.
    bp_cache: Optional[tuple] = None
    bp_age: Optional[jnp.ndarray] = None    # [W] int32


class PhysicsBuilder:
    """Host-side construction of bodies + colliders → packed template."""

    def __init__(self):
        self._bodies = []
        self._colliders = []
        self._joints = None

    def add_body(self, node=-1, body_type=DYNAMIC, position=(0, 0, 0),
                 rotation=(0, 0, 0, 1), lin_damping=0.0, ang_damping=0.0,
                 gravity_scale=1.0, dim2=False,
                 lock_translation=(1, 1, 1), lock_rotation=(1, 1, 1)) -> int:
        """dim2=True constrains the body to the XY plane (z translation and
        x/y rotations locked) — the rapier2d-equivalent mode."""
        if dim2:
            lock_translation = (1, 1, 0)
            lock_rotation = (0, 0, 1)
        self._bodies.append(dict(node=node, body_type=body_type,
                                 position=np.asarray(position, np.float32),
                                 rotation=np.asarray(rotation, np.float32),
                                 lin_damping=lin_damping, ang_damping=ang_damping,
                                 gravity_scale=gravity_scale,
                                 lin_lock=np.asarray(lock_translation, np.float32),
                                 ang_lock=np.asarray(lock_rotation, np.float32)))
        return len(self._bodies) - 1

    def add_joint(self, kind, body_a, body_b, anchor_a=(0, 0, 0),
                  anchor_b=(0, 0, 0), axis=(0, 0, 1), ref_rot=None) -> int:
        """Impulse joint (scene/joint.rs equivalents): kind from
        fyrox_tpu.physics.joints.JointKind (BALL/FIXED/REVOLUTE).

        ref_rot: relative orientation (xyzw) the joint holds. Default None
        captures the bodies' creation-time relative rotation qa0^-1*qb0
        (rapier local_frame semantics)."""
        from fyrox_tpu.physics.joints import JointBuilder
        if self._joints is None:
            self._joints = JointBuilder()
        if ref_rot is None:
            qa = np.asarray(self._bodies[body_a]["rotation"], np.float64)
            qb = np.asarray(self._bodies[body_b]["rotation"], np.float64)
            ax, ay, az, aw = -qa[0], -qa[1], -qa[2], qa[3]  # qa^-1
            bx, by, bz, bw = qb
            ref_rot = np.asarray([
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz], np.float32)
        return self._joints.add(kind, body_a, body_b, anchor_a, anchor_b,
                                axis, ref_rot)

    def add_collider(self, body, shape, params=(), density=1.0, friction=0.5,
                     restitution=0.0, offset=(0, 0, 0), offset_rot=(0, 0, 0, 1),
                     node=-1, points=None, heights=None, size=None,
                     triangles=None) -> int:
        """shape=shapes.CONVEX takes `points` (hull point cloud, local
        space); HEIGHTFIELD takes `heights` [Rz,Rx] + `size=(sx,sz)`
        (centered local rectangle); TRIMESH takes `triangles` ((verts,
        faces) or a [T,3,3] soup) — both static-only. Cylinders/cones
        additionally register a 12-gon prism/pyramid hull so the dense
        narrowphase resolves them with real SAT kernels (collider.rs:511
        Cylinder/Cone rows) instead of a capsule proxy.

        SEGMENT and TRIANGLE (the last collider.rs:511 vocabulary rows)
        are builder-level shapes that LOWER here: SEGMENT takes
        `points=(a, b)` local endpoints (or `params=[half_height]` for a
        local-Y segment) and becomes a zero-radius capsule — exact same
        closest-point geometry, zero volume; TRIANGLE takes
        `points=(a, b, c)` (or `triangles=` one cell) and becomes a
        single-cell trimesh (static-only, like trimesh)."""
        from fyrox_tpu.physics import convex as cx
        if int(shape) == sh.SEGMENT:
            if points is not None:
                a, b = (np.asarray(p, np.float32) for p in points)
                mid = 0.5 * (a + b)
                d = b - a
                ln = float(np.linalg.norm(d))
                if ln > 1e-12:
                    # rotation taking local +Y onto the segment direction
                    y = np.array([0.0, 1.0, 0.0])
                    dn = d / ln
                    v = np.cross(y, dn)
                    c = float(np.dot(y, dn))
                    s = float(np.linalg.norm(v))
                    if s > 1e-8:
                        axis = v / s
                        half = np.arctan2(s, c) * 0.5
                        offset_rot = np.concatenate(
                            [axis * np.sin(half), [np.cos(half)]])
                    elif c < 0.0:                    # antiparallel: flip
                        offset_rot = np.array([0.0, 0.0, 1.0, 0.0])
                    offset = np.asarray(offset, np.float32) + mid
                params = [0.5 * ln, 0.0]
            else:
                params = [float(params[0]) if len(params) else 0.5, 0.0]
            shape = sh.CAPSULE
        elif int(shape) == sh.TRIANGLE:
            if triangles is None:
                if points is None or len(points) != 3:
                    raise ValueError("TRIANGLE collider needs points=(a,b,c)"
                                     " or triangles= one cell")
                triangles = np.asarray(points, np.float32)[None]
            shape = sh.TRIMESH
        p6 = np.zeros(6, np.float32)
        hull = hf = tm = -1
        if int(shape) == sh.CONVEX:
            if points is None:
                raise ValueError("CONVEX collider needs points=")
            verts, normals = cx.hull_from_points(points)
            hull = self._hulls_add(verts, normals)
            p6[0] = float(np.linalg.norm(verts, axis=1).max())
        elif int(shape) == sh.HEIGHTFIELD:
            if heights is None or size is None:
                raise ValueError("HEIGHTFIELD collider needs heights= and "
                                 "size=(size_x, size_z)")
            h = np.asarray(heights, np.float32)
            sx, sz = float(size[0]), float(size[1])
            if not hasattr(self, "_hfs"):
                self._hfs = []
            hf = len(self._hfs)
            self._hfs.append((h, sx, sz))
            p6[:3] = [sx, sz, float(np.linalg.norm(
                [sx * 0.5, np.abs(h).max() + 1e-3, sz * 0.5]))]
        elif int(shape) == sh.TRIMESH:
            if triangles is None:
                raise ValueError("TRIMESH collider needs triangles= "
                                 "((verts, tris) or [T,3,3] soup)")
            from fyrox_tpu.physics.scenery import MAX_TRIS
            if isinstance(triangles, tuple):
                v, f = triangles
                soup = np.asarray(v, np.float32)[np.asarray(f, np.int64)]
            else:
                soup = np.asarray(triangles, np.float32)
            if soup.shape[0] > MAX_TRIS:
                raise ValueError(f"trimesh has {soup.shape[0]} tris > "
                                 f"{MAX_TRIS}; decimate or split")
            if not hasattr(self, "_tms"):
                self._tms = []
            tm = len(self._tms)
            self._tms.append(soup)
            p6[0] = float(np.linalg.norm(soup.reshape(-1, 3), axis=1).max())
        else:
            p6[:len(params)] = params
            if int(shape) == sh.CYLINDER:
                verts, normals = cx.prism_hull(p6[0], p6[1], n=12)
                hull = self._hulls_add(verts, normals)
            elif int(shape) == sh.CONE:
                verts, normals = cx.cone_hull(p6[0], p6[1], n=12)
                hull = self._hulls_add(verts, normals)
        if int(shape) in (sh.HEIGHTFIELD, sh.TRIMESH) \
                and self._bodies[body]["body_type"] == DYNAMIC:
            raise ValueError("heightfield/trimesh colliders are static-only")
        self._colliders.append(dict(body=body, shape=int(shape), params=p6,
                                    density=density, friction=friction,
                                    restitution=restitution,
                                    offset=np.asarray(offset, np.float32),
                                    offset_rot=np.asarray(offset_rot, np.float32),
                                    node=node, hull=hull, hf=hf, tm=tm))
        return len(self._colliders) - 1

    def _scenery_fields(self):
        out = dict(hf_heights=None, hf_size=None, col_hf=None,
                   tm_tris=None, tm_mask=None, col_tm=None)
        if hasattr(self, "_hfs") and self._hfs:
            shapes_set = {h.shape for h, _, _ in self._hfs}
            if len(shapes_set) > 1:
                raise ValueError("all heightfields in a scene must share one "
                                 "resolution (pad on the host)")
            out["hf_heights"] = np.stack([h for h, _, _ in self._hfs])
            out["hf_size"] = np.asarray([(sx, sz) for _, sx, sz in self._hfs],
                                        np.float32)
            out["col_hf"] = np.asarray([c.get("hf", -1)
                                        for c in self._colliders], np.int32)
        if hasattr(self, "_tms") and self._tms:
            from fyrox_tpu.physics.scenery import MAX_TRIS
            n = len(self._tms)
            tris = np.zeros((n, MAX_TRIS, 3, 3), np.float32)
            mask = np.zeros((n, MAX_TRIS), bool)
            for i, soup in enumerate(self._tms):
                tris[i, :len(soup)] = soup
                mask[i, :len(soup)] = True
            out["tm_tris"] = tris
            out["tm_mask"] = mask
            out["col_tm"] = np.asarray([c.get("tm", -1)
                                        for c in self._colliders], np.int32)
        return out

    def _hulls_add(self, verts, normals):
        from fyrox_tpu.physics import convex as cx
        if not hasattr(self, "_hulls"):
            self._hulls = cx.ConvexBuilder()
        return self._hulls.add(verts, normals)

    def build(self, max_active_pairs=0, broadphase="auto",
              grid_window=48, grid_caps=None, grid_windows_body=None,
              slab_window=(12, 8, 10), slab_active=16, slab_walk=48,
              **solver_kw) -> "PhysicsTemplate":
        """broadphase: "dense" = static all-pairs candidate list (best for
        small scenes — unlocks the static-incidence MXU solver path);
        "slab" = hash-grid into static per-collider candidate windows
        (O(C), MXU-native gathers — the TPU production path for large
        collider counts); "grid" = hash-grid + global stream compaction
        (legacy, XLA-gather-bound on TPU); "auto" picks slab at >= 192
        colliders."""
        nb = len(self._bodies)
        nc = len(self._colliders)
        if broadphase == "auto":
            broadphase = "slab" if nc >= 192 else "dense"
        inv_mass = np.zeros(nb, np.float32)
        inv_inertia = np.zeros((nb, 3, 3), np.float32)
        com = np.zeros((nb, 3), np.float32)

        # mass properties: accumulate collider masses about the body origin
        by_body = {}
        for c in self._colliders:
            by_body.setdefault(c["body"], []).append(c)

        def _np_quat_mat(q):
            x, y, z, w = q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]],
                np.float64)

        def _collider_mass(c):
            """(mass, inertia about the shape's own COM in shape-local
            axes, COM in collider-local space)."""
            if c["shape"] == sh.CONVEX:
                from fyrox_tpu.physics.convex import hull_mass
                v = self._hulls.verts[c["hull"]]
                n = self._hulls.normals[c["hull"]]
                m, com_h, i_com = hull_mass(v, n, c["density"])
                return m, i_com, com_h
            m, i_local = sh.mass_properties(c["shape"], c["params"],
                                            c["density"])
            return m, i_local, np.zeros(3)

        for bi, body in enumerate(self._bodies):
            if body["body_type"] != DYNAMIC:
                continue
            cols = by_body.get(bi, [])
            props = [(_collider_mass(c), c) for c in cols]
            mass = sum(m for (m, _i, _cm), _c in props)
            if mass <= 0.0:
                # rapier gives massless dynamic bodies unit mass behavior:
                # keep them translating-only with unit mass
                inv_mass[bi] = 1.0
                continue
            centers = [(c["offset"]
                        + _np_quat_mat(c["offset_rot"]) @ cm)
                       for (_m, _i, cm), c in props]
            com[bi] = sum(m * ctr for ((m, _i, _cm), _c), ctr
                          in zip(props, centers)) / mass
            inertia = np.zeros((3, 3))
            for ((m, i_local, _cm), c), ctr in zip(props, centers):
                r = _np_quat_mat(c["offset_rot"])
                d = ctr - com[bi]
                inertia += (r @ i_local @ r.T
                            + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d)))
            inv_mass[bi] = 1.0 / mass
            inv_inertia[bi] = np.linalg.inv(inertia)

        body_type = np.asarray([b["body_type"] for b in self._bodies], np.int32)
        col_body = np.asarray([c["body"] for c in self._colliders], np.int32)

        col_shape_arr = np.asarray([c["shape"] for c in self._colliders], np.int32)
        col_params_arr = (np.stack([c["params"] for c in self._colliders])
                          if nc else np.zeros((0, 6), np.float32))

        grid_cfg = None
        if broadphase == "grid" and nc:
            from fyrox_tpu.physics.broadphase import build_grid_config
            margin = solver_kw.get("allowed_linear_error", 0.002) + 0.05
            grid_cfg = build_grid_config(
                col_shape_arr, col_params_arr, col_body, body_type,
                margin=margin, window=grid_window, caps=grid_caps,
                windows_body=grid_windows_body)
        elif broadphase == "slab" and nc:
            from fyrox_tpu.physics.broadphase import build_slab_config
            margin = solver_kw.get("allowed_linear_error", 0.002) + 0.05
            extent = 0.0
            if self._bodies:
                extent = float(np.abs(np.stack(
                    [b["position"] for b in self._bodies])).max())
            grid_cfg = build_slab_config(
                col_shape_arr, col_params_arr, col_body, body_type,
                margin=margin, window=slab_window, active_window=slab_active,
                walk=slab_walk, extent_hint=extent * 2.0)

        if grid_cfg is not None:
            pa = pb = np.zeros(0, np.int32)
            kind_ranges = None
        else:
            # dense mode: static all-pairs candidate list, sorted by
            # effective shape kind so the grouped narrowphase runs each
            # kernel on one contiguous slice. Cylinders/cones with a
            # registered hull dispatch as CONVEX (real SAT) here.
            from fyrox_tpu.physics.narrowphase import effective_kind
            kinds = np.asarray(
                [sh.CONVEX if (c["shape"] == sh.CONVEX
                               or (c["shape"] in (sh.CYLINDER, sh.CONE)
                                   and c.get("hull", -1) >= 0))
                 else effective_kind(c["shape"])
                 for c in self._colliders], np.int32)
            ii, jj = np.triu_indices(nc, k=1)
            keep = (col_body[ii] != col_body[jj]) &                ((body_type[col_body[ii]] == DYNAMIC)
                    | (body_type[col_body[jj]] == DYNAMIC))
            ii, jj = ii[keep], jj[keep]
            # canonical order: smaller effective kind first
            swap = kinds[ii] > kinds[jj]
            pa_arr = np.where(swap, jj, ii).astype(np.int64)
            pb_arr = np.where(swap, ii, jj).astype(np.int64)
            ka = kinds[pa_arr]
            kb = kinds[pb_arr]
            order = np.lexsort((kb, ka))
            pa_arr, pb_arr, ka, kb = pa_arr[order], pb_arr[order], ka[order], kb[order]
            pa = pa_arr
            pb = pb_arr
            kind_ranges = []
            if len(pa_arr):
                combo = ka.astype(np.int64) * 1000 + kb
                bounds = np.flatnonzero(np.diff(combo)) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [len(combo)]])
                kind_ranges = [((int(ka[s0]), int(kb[s0])), int(s0), int(e0))
                               for s0, e0 in zip(starts, ends)]

        return PhysicsTemplate(
            body_node=np.asarray([b["node"] for b in self._bodies], np.int32),
            body_type=body_type,
            inv_mass=inv_mass,
            inv_inertia_local=inv_inertia.astype(np.float32),
            com_local=com.astype(np.float32),
            lin_damping=np.asarray([b["lin_damping"] for b in self._bodies], np.float32),
            ang_damping=np.asarray([b["ang_damping"] for b in self._bodies], np.float32),
            gravity_scale=np.asarray([b["gravity_scale"] for b in self._bodies], np.float32),
            lin_lock=(np.stack([b["lin_lock"] for b in self._bodies])
                      if nb else np.ones((0, 3), np.float32)),
            ang_lock=(np.stack([b["ang_lock"] for b in self._bodies])
                      if nb else np.ones((0, 3), np.float32)),
            col_body=col_body,
            col_shape=np.asarray([c["shape"] for c in self._colliders], np.int32),
            col_params=np.stack([c["params"] for c in self._colliders]) if nc
                       else np.zeros((0, 6), np.float32),
            col_pos=np.stack([c["offset"] for c in self._colliders]) if nc
                    else np.zeros((0, 3), np.float32),
            col_rot=np.stack([c["offset_rot"] for c in self._colliders]) if nc
                    else np.zeros((0, 4), np.float32),
            col_friction=np.asarray([c["friction"] for c in self._colliders], np.float32),
            col_restitution=np.asarray([c["restitution"] for c in self._colliders], np.float32),
            col_node=np.asarray([c["node"] for c in self._colliders], np.int32),
            pair_a=np.asarray(pa, np.int32),
            pair_b=np.asarray(pb, np.int32),
            pair_kind_ranges=kind_ranges,
            hulls=(self._hulls.build() if hasattr(self, "_hulls") else None),
            col_hull=np.asarray([c.get("hull", -1)
                                 for c in self._colliders], np.int32),
            **self._scenery_fields(),
            joints=(self._joints.build(com_local=com)
                    if self._joints is not None else None),
            init_body_pos=(np.stack([b["position"] for b in self._bodies])
                           if nb else np.zeros((0, 3), np.float32)),
            init_body_rot=(np.stack([b["rotation"] for b in self._bodies])
                           if nb else np.zeros((0, 4), np.float32)),
            max_active_pairs=max_active_pairs,
            grid=grid_cfg,
            **solver_kw,
        )

    # initial body poses for init_physics_state
    def initial_pose(self):
        if not self._bodies:
            return np.zeros((0, 3), np.float32), np.zeros((0, 4), np.float32)
        return (np.stack([b["position"] for b in self._bodies]),
                np.stack([b["rotation"] for b in self._bodies]))


def init_physics_state(builder_or_pose, template: PhysicsTemplate,
                       num_worlds: int) -> PhysicsState:
    if isinstance(builder_or_pose, PhysicsBuilder):
        pos, rot = builder_or_pose.initial_pose()
    else:
        pos, rot = builder_or_pose
    w = num_worlds
    b = template.num_bodies
    z = jnp.zeros((w, b, 3), jnp.float32)
    bp_fields = {}
    if template.grid is not None:
        from fyrox_tpu.physics.broadphase import CLASS_NPTS, SlabConfig
        if isinstance(template.grid, SlabConfig):
            import os
            from fyrox_tpu.physics import slab2
            if slab2.supports(template) and not os.environ.get("FYROX_SLAB_V1"):
                # v2 plane path: point-level compacted slots (pid-matched
                # warmstart at Cg * s_active contact points)
                kk = cap = (int(template.grid.grid_cols.size)
                            * int(template.grid.s_active))
                period = int(getattr(template, "broadphase_period", 1) or 1)
                if period > 1:
                    # empty candidate cache; age 0 + zero coverage force a
                    # rebuild on the first step (slab2 temporal reuse).
                    # Cache = (per-class slot tuples, rebuild positions,
                    # per-body coverage budgets)
                    sc = template.grid
                    cgn = int(sc.grid_cols.size)
                    cache = []
                    for cls in range(3):
                        k = cgn * sc.nslot(cls)
                        cache.append((jnp.zeros((w, k), jnp.int32),
                                      jnp.zeros((w, k), jnp.int32),
                                      jnp.zeros((w, k), bool),
                                      jnp.zeros((w, k), bool),
                                      jnp.full((w, k), -1, jnp.int32)))
                    nb = template.num_bodies
                    bp_fields = dict(
                        bp_cache=(tuple(cache),
                                  jnp.zeros((w, nb, 3), jnp.float32),
                                  jnp.zeros((w, nb, 3), jnp.float32)),
                        bp_age=jnp.zeros((w,), jnp.int32))
            else:
                cap = template.grid.n_slots
                kk = template.grid.slot_points
        else:
            kk = sum(c * n for c, n in zip(template.grid.caps, CLASS_NPTS))
            cap = sum(template.grid.caps)
    else:
        cap = min(template.max_active_pairs or template.num_pairs,
                  template.num_pairs)
        if cap >= template.num_pairs and template.pair_kind_ranges is not None:
            _, kk = template.flat_layout()      # compact dense layout
        else:
            kk = cap * 4
    return PhysicsState(
        position=jnp.broadcast_to(jnp.asarray(pos, jnp.float32), (w, b, 3)),
        rotation=jnp.broadcast_to(jnp.asarray(rot, jnp.float32), (w, b, 4)),
        linvel=z, angvel=z, force=z, torque=z,
        warm_n=jnp.zeros((w, kk), jnp.float32),
        warm_t1=jnp.zeros((w, kk), jnp.float32),
        warm_t2=jnp.zeros((w, kk), jnp.float32),
        warm_pair=jnp.full((w, cap), -1, jnp.int32),
        **bp_fields,
    )


def _collider_world(state: PhysicsState, t: PhysicsTemplate):
    """World pose of every collider: body pose ∘ local offset. Returns
    (pos [W,C,3], rot_mat [W,C,3,3])."""
    cb = jnp.asarray(t.col_body)
    bq = state.rotation[:, cb]
    bp = state.position[:, cb]
    cq = jnp.asarray(t.col_rot)[None]
    cp = jnp.asarray(t.col_pos)[None]
    wq = quat.mul(bq, jnp.broadcast_to(cq, bq.shape))
    wp = bp + quat.rotate(bq, jnp.broadcast_to(cp, bp.shape))
    return wp, quat.to_mat3(wq)


def step_physics(state: PhysicsState, t: PhysicsTemplate, dt) -> PhysicsState:
    """One physics step (PhysicsWorld::update, physics/mod.rs:1151):
    broadphase + narrowphase once, then the TGS substepped solve/integrate
    (solver.solve_tgs) and rapier-convention damping."""
    w = state.position.shape[0]
    dtype = state.position.dtype
    dyn = (jnp.asarray(t.body_type) == DYNAMIC)[None, :, None]
    inv_mass = jnp.broadcast_to(jnp.asarray(t.inv_mass)[None].astype(dtype),
                                state.position.shape[:2])

    # ---- external acceleration (gravity + user forces), torques once ----
    g = jnp.asarray(t.gravity, dtype)
    gscale = jnp.asarray(t.gravity_scale)[None, :, None]
    accel = jnp.where(dyn, g * gscale + state.force * inv_mass[..., None], 0.0)
    rmat = quat.to_mat3(state.rotation)
    ii_world = quat.sandwich_inv_inertia(rmat, jnp.asarray(t.inv_inertia_local))
    angvel = state.angvel + dt * jnp.where(
        dyn, quat.mv(ii_world, state.torque), 0.0)

    if t.grid is not None:
        from fyrox_tpu.physics.broadphase import SlabConfig
        if isinstance(t.grid, SlabConfig):
            import os
            from fyrox_tpu.physics import slab2
            if slab2.supports(t) and not os.environ.get("FYROX_SLAB_V1"):
                return slab2.step_slab2(state, t, dt, accel, angvel, inv_mass)
            st = _step_physics_slab(state, t, dt, accel, angvel, inv_mass)
            # preserve pytree structure when a cached-broadphase state is
            # routed through the v1 path (e.g. FYROX_SLAB_V1 mid-session)
            return st._replace(bp_cache=state.bp_cache, bp_age=state.bp_age)
        st = _step_physics_grid(state, t, dt, accel, angvel, inv_mass)
        return st._replace(bp_cache=state.bp_cache, bp_age=state.bp_age)

    # ---- broadphase + narrowphase (once per step, rapier-style) ----
    contacts = None
    if t.num_pairs > 0:
        cpos, crot = _collider_world(state, t)
        ctype = jnp.asarray(t.col_shape)
        cparams = jnp.asarray(t.col_params)
        # fat AABBs; the same margin is the speculative-contact activation
        # distance: a contact that will close within the step must already
        # be active so the solver's sep/h bias can absorb the approach
        # (high-speed impacts otherwise punch 0.1-0.2 into the ground in
        # one step and dense piles never recover)
        margin = t.allowed_linear_error + SPECULATIVE_MARGIN
        he = sh.shape_aabb_half_extents(ctype[None], cparams[None], crot) + margin
        amin, amax = cpos - he, cpos + he
        # ---- CCD (speculative-contact model, rapier max_ccd_substeps
        # semantics physics/mod.rs:905): sweep the fat AABB along the
        # body's motion so fast movers still broad-phase against what
        # they will hit this step; the per-pair prediction distance below
        # then activates the contact early and the solver's sep/h bias
        # clamps approach to exactly close the gap (no tunneling, no
        # separate TOI solve — the TGS substeps are the CCD substeps) ----
        cb_all = jnp.asarray(t.col_body)
        v_sweep = state.linvel[:, cb_all] * dt
        amin = amin + jnp.minimum(v_sweep, 0.0)
        amax = amax + jnp.maximum(v_sweep, 0.0)
        # halfspace AABB = its actual half-volume (see _step_physics_grid)
        is_hs = (ctype == sh.HALFSPACE)[None, :, None]
        n_hs = crot[..., :, 1]
        amax = jnp.where(is_hs, cpos + sh._HUGE * (1.0 - n_hs) + margin, amax)
        amin = jnp.where(is_hs, cpos - sh._HUGE * (1.0 + n_hs) - margin, amin)

        pa = jnp.asarray(t.pair_a)
        pb = jnp.asarray(t.pair_b)
        overlap = jnp.all((amin[:, pa] <= amax[:, pb]) &
                          (amax[:, pa] >= amin[:, pb]), axis=-1)     # [W,P]

        cap = min(t.max_active_pairs or t.num_pairs, t.num_pairs)
        if cap < t.num_pairs:
            score = jnp.where(overlap, jnp.arange(t.num_pairs, dtype=jnp.int32), -1)
            _, sel = jax.lax.top_k(score, cap)                        # [W,cap]
            sel_valid = jnp.take_along_axis(score, sel, axis=1) >= 0
            ia_c = pa[sel]
            ib_c = pb[sel]
        else:
            sel = jnp.broadcast_to(jnp.arange(t.num_pairs, dtype=jnp.int32)[None],
                                   (w, t.num_pairs))
            # tie to the state so the value stays device-varying under
            # shard_map (keeps lax.scan carry types consistent)
            tie = (state.position[:, 0, 0] * 0).astype(jnp.int32)
            sel = sel + tie[:, None]
            sel_valid = overlap
            ia_c = jnp.broadcast_to(pa[None], sel.shape)
            ib_c = jnp.broadcast_to(pb[None], sel.shape)

        def gat2(arr, idx):  # arr [W,C,...], idx [W,K]
            return jnp.take_along_axis(
                arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1)

        dense_mode = cap >= t.num_pairs and t.pair_kind_ranges is not None
        if dense_mode:
            # dense static pair list: kind-grouped narrowphase emitting the
            # COMPACT contact layout (per-kind manifold sizes).
            # prediction distance grows with the pair's relative speed so
            # CCD-swept candidates activate before impact (see sweep above)
            pa_s, pb_s = t.pair_a, t.pair_b
            pred_p = margin + jnp.linalg.norm(
                v_sweep[:, pa_s] - v_sweep[:, pb_s], axis=-1)
            hull_ctx = (None if t.hulls is None else
                        (t.hulls, t.col_hull, t.pair_a, t.pair_b))
            scenery_ctx = None
            if t.col_hf is not None or t.col_tm is not None:
                scenery_ctx = (t.hf_heights, t.hf_size, t.col_hf,
                               t.tm_tris, t.tm_mask, t.col_tm,
                               t.pair_a, t.pair_b)
            flat = np_mod.generate_contacts_flat(
                t.pair_kind_ranges,
                cparams[jnp.asarray(pa_s)][None], cpos[:, pa_s], crot[:, pa_s],
                cparams[jnp.asarray(pb_s)][None], cpos[:, pb_s], crot[:, pb_s],
                pred=pred_p.astype(dtype), hull_ctx=hull_ctx,
                scenery_ctx=scenery_ctx)
        else:
            pred_p = margin + jnp.linalg.norm(
                gat2(v_sweep, ia_c) - gat2(v_sweep, ib_c), axis=-1)
            man = np_mod.generate_contacts(
                ctype[ia_c], cparams[ia_c], gat2(cpos, ia_c), gat2(crot, ia_c),
                ctype[ib_c], cparams[ib_c], gat2(cpos, ib_c), gat2(crot, ib_c),
                pred=pred_p.astype(dtype))

        cb = jnp.asarray(t.col_body)
        if dense_mode:
            pair_idx, kk = t.flat_layout()
            inc_a, inc_b = t.incidence()
            body_a = t.col_body[t.pair_a[pair_idx]]    # static numpy
            body_b = t.col_body[t.pair_b[pair_idx]]
            fric_p = np.sqrt(t.col_friction[t.pair_a] * t.col_friction[t.pair_b])
            rest_p = np.maximum(t.col_restitution[t.pair_a],
                                t.col_restitution[t.pair_b])
            contacts = solver_mod.ContactBatch(
                body_a=body_a, body_b=body_b,
                normal=flat["normal"],
                point=flat["point"],
                depth=flat["depth"],
                friction=jnp.asarray(fric_p[pair_idx]),
                restitution=jnp.asarray(rest_p[pair_idx]),
                active=flat["active"] & sel_valid[:, pair_idx],
                inc_a=inc_a, inc_b=inc_b,
                own_pts=np.bincount(pair_idx)[pair_idx].astype(np.float32),
            )
        else:
            kk = sel.shape[1] * 4
            fric = jnp.sqrt(jnp.asarray(t.col_friction)[ia_c] *
                            jnp.asarray(t.col_friction)[ib_c])
            rest = jnp.maximum(jnp.asarray(t.col_restitution)[ia_c],
                               jnp.asarray(t.col_restitution)[ib_c])
            contacts = solver_mod.ContactBatch(
                body_a=jnp.repeat(cb[ia_c], 4, axis=1),
                body_b=jnp.repeat(cb[ib_c], 4, axis=1),
                normal=jnp.repeat(man.normal, 4, axis=1),
                point=man.points.reshape(w, kk, 3),
                depth=man.depth.reshape(w, kk),
                friction=jnp.repeat(fric, 4, axis=1),
                restitution=jnp.repeat(rest, 4, axis=1),
                active=(man.active.reshape(w, kk)
                        & jnp.repeat(sel_valid, 4, axis=1)),
            )

    sp = solver_mod.SolverParams(
        dt=jnp.asarray(dt, dtype), erp=t.erp,
        allowed_linear_error=t.allowed_linear_error,
        max_corrective_velocity=t.max_corrective_velocity,
        restitution_threshold=t.restitution_threshold,
        n_substeps=t.n_substeps, n_pgs=t.n_pgs,
        n_stabilization=t.n_stabilization,
        warmstart_coefficient=t.warmstart_coefficient,
        mass_split_pow=t.mass_split_pow)

    warm = None
    if contacts is not None and state.warm_n is not None:
        # slot-matched warmstart: only slots still holding the same pair
        same = (state.warm_pair == sel)
        if contacts.inc_a is not None:
            pair_idx, _ = t.flat_layout()
            same_k = same[:, pair_idx]
        else:
            same_k = jnp.repeat(same, 4, axis=1)
        warm = (state.warm_n * same_k, state.warm_t1 * same_k,
                state.warm_t2 * same_k)

    position, rotation, linvel, angvel, lam_out = solver_mod.solve_tgs(
        state.position, state.rotation, state.linvel, angvel,
        jnp.asarray(t.com_local), inv_mass, jnp.asarray(t.inv_inertia_local),
        accel, contacts, sp, warm=warm, joints=t.joints)

    # ---- axis locks (2D mode / locked DOFs) ----
    if t.lin_lock is not None:
        linvel = linvel * jnp.asarray(t.lin_lock)[None]
        angvel = angvel * jnp.asarray(t.ang_lock)[None]
        # project positions back onto the locked plane (z drift from the
        # substep integration before the lock was applied)
        keep = jnp.asarray(t.lin_lock)[None]
        position = position * keep + state.position * (1.0 - keep)

    # ---- damping (rapier: v *= 1/(1+dt*d)) ----
    ld = jnp.asarray(t.lin_damping)[None, :, None]
    ad = jnp.asarray(t.ang_damping)[None, :, None]
    linvel = linvel / (1.0 + dt * ld)
    angvel = angvel / (1.0 + dt * ad)

    if contacts is not None and lam_out is not None:
        warm_n, warm_t1, warm_t2 = lam_out
        warm_pair = sel
    else:
        warm_n, warm_t1, warm_t2 = state.warm_n, state.warm_t1, state.warm_t2
        warm_pair = state.warm_pair
    return PhysicsState(position=position, rotation=rotation,
                        linvel=linvel, angvel=angvel,
                        force=jnp.zeros_like(state.force),
                        torque=jnp.zeros_like(state.torque),
                        warm_n=warm_n, warm_t1=warm_t1, warm_t2=warm_t2,
                        warm_pair=warm_pair)


def _apply_locks_damping(state, t, dt, position, rotation, linvel, angvel):
    """Shared post-solve: axis locks (2D mode / locked DOFs) then rapier
    damping v *= 1/(1+dt*d)."""
    if t.lin_lock is not None:
        linvel = linvel * jnp.asarray(t.lin_lock)[None]
        angvel = angvel * jnp.asarray(t.ang_lock)[None]
        keep = jnp.asarray(t.lin_lock)[None]
        position = position * keep + state.position * (1.0 - keep)
    ld = jnp.asarray(t.lin_damping)[None, :, None]
    ad = jnp.asarray(t.ang_damping)[None, :, None]
    linvel = linvel / (1.0 + dt * ld)
    angvel = angvel / (1.0 + dt * ad)
    return position, rotation, linvel, angvel


def _step_physics_slab(state, t: PhysicsTemplate, dt, accel, angvel, inv_mass):
    """Slab-broadphase step: static per-collider candidate windows →
    full-dispatch narrowphase on canonically-swapped slot data →
    solve_tgs_directed with slab (broadcast/MXU-gather/reshape-sum) ops.

    This is the TPU production path for large collider counts: it has NO
    take_along_axis / searchsorted on wide tensors (both lower to
    near-scalar code on TPU — measured ~58 ms for one [32,24k,6] gather
    on v5e, vs ~1 ms for the pallas one-hot MXU formulation)."""
    if t.col_hf is not None or t.col_tm is not None:
        raise NotImplementedError(
            "scenery (heightfield/trimesh) in slab mode requires the v2 "
            "plane path (physics/slab2.py); this legacy path would "
            "silently drop terrain contacts. Remove FYROX_SLAB_V1 / the "
            "convex colliders that forced the fallback, or use "
            "broadphase='dense'.")
    from fyrox_tpu.physics import broadphase as bp_mod
    from fyrox_tpu.physics.pallas_ops import gather_rows

    w = state.position.shape[0]
    dtype = state.position.dtype
    b = t.num_bodies
    c = t.num_colliders
    sc = t.grid
    cg = int(sc.grid_cols.size)

    # collider world pose via static one-hot matmuls (no body→collider
    # gather): inc_cb [C,B]
    # EXACT static body→collider gather: the one-hot einsum form runs
    # at default matmul precision (bf16 on TPU) and quantizes poses
    # (see pallas_ops.perm_take)
    cb_idx = jnp.asarray(np.asarray(t.col_body, np.int32))
    bq = jnp.take(state.rotation, cb_idx, axis=1)
    bp_ = jnp.take(state.position, cb_idx, axis=1)
    cq = jnp.asarray(t.col_rot)[None]
    cp = jnp.asarray(t.col_pos)[None]
    wq = quat.mul(bq, jnp.broadcast_to(cq, bq.shape))
    cpos = bp_ + quat.rotate(bq, jnp.broadcast_to(cp, bp_.shape))
    crot = quat.to_mat3(wq)

    ctype = jnp.asarray(t.col_shape)
    cparams = jnp.asarray(t.col_params)
    margin = t.allowed_linear_error + SPECULATIVE_MARGIN
    he = sh.shape_aabb_half_extents(ctype[None], cparams[None], crot) + margin
    amin, amax = cpos - he, cpos + he
    # CCD sweep (speculative-contact model; see step_physics dense path).
    # The slab walk requires AABB extents <= cell, so sweeps clamp to the
    # per-collider cap — CCD coverage up to ~cell/dt closing speed.
    v_col = jnp.take(state.linvel, cb_idx, axis=1)
    v_sweep = v_col * dt
    cap3 = jnp.asarray(sc.sweep_cap)[None, :, None]
    swc = jnp.clip(v_sweep, -cap3, cap3)
    amin = amin + jnp.minimum(swc, 0.0)
    amax = amax + jnp.maximum(swc, 0.0)
    is_hs = (ctype == sh.HALFSPACE)[None, :, None]
    n_hs = crot[..., :, 1]
    amax = jnp.where(is_hs, cpos + sh._HUGE * (1.0 - n_hs) + margin, amax)
    amin = jnp.where(is_hs, cpos - sh._HUGE * (1.0 + n_hs) - margin, amin)

    col_body_np = np.asarray(t.col_body)
    dyn_col = (np.asarray(t.body_type)[col_body_np] == DYNAMIC)
    cands = bp_mod.slab_candidates(sc, col_body_np, dyn_col, amin, amax)

    # per-collider attribute planes (dynamic pose 12 | params 6 | type |
    # friction | restitution = 21) built once; each class gathers its
    # partner rows with ONE MXU one-hot gather and broadcasts its static
    # scanning side
    planes = jnp.concatenate(
        [cpos, crot.reshape(w, c, 9),
         jnp.broadcast_to(jnp.concatenate(
             [cparams, ctype[:, None].astype(dtype),
              jnp.asarray(t.col_friction)[:, None],
              jnp.asarray(t.col_restitution)[:, None]], -1)[None],
             (w, c, 9)), v_sweep], -1)                          # [W,C,24]
    from fyrox_tpu.physics.pallas_ops import perm_take
    iplane_col = perm_take(sc.inc_gc,
                           jnp.concatenate([planes[..., :12],
                                            v_sweep], -1),
                           axis=1)                              # [W,Cg,15]

    # runtime convex-hull tables (only when the scene has convex
    # colliders): dense per-collider padded hulls, flattened so the
    # j-side fetch is ONE extra MXU gather per class
    hull_flat = None
    if t.hulls is not None and np.any(t.col_shape == sh.CONVEX):
        from fyrox_tpu.physics.convex import MAX_HULL_FACES, MAX_HULL_VERTS
        hv = np.zeros((c, MAX_HULL_VERTS, 3), np.float32)
        hvm = np.zeros((c, MAX_HULL_VERTS), np.float32)
        hn = np.zeros((c, MAX_HULL_FACES, 3), np.float32)
        hn[..., 1] = 1.0
        hnm = np.zeros((c, MAX_HULL_FACES), np.float32)
        has = t.col_hull >= 0
        hi = np.maximum(t.col_hull, 0)
        hv[has] = t.hulls.verts[hi[has]]
        hvm[has] = t.hulls.vmask[hi[has]]
        hn[has] = t.hulls.normals[hi[has]]
        hnm[has] = t.hulls.nmask[hi[has]]
        hull_flat = np.concatenate(
            [hv.reshape(c, -1), hvm, hn.reshape(c, -1), hnm], -1)  # [C,256]
        _hv_n = MAX_HULL_VERTS
        _hf_n = MAX_HULL_FACES

    segs, warm_in, seg_npts = [], [], []
    koff = 0
    poff = 0
    pid_parts = []
    for cls_idx, cand in enumerate(cands):
        kp_c = cand.j_real.shape[1]
        if kp_c == 0:
            continue
        nslot_c = sc.nslot(cls_idx)
        npts = bp_mod.CLASS_NPTS[cls_idx]
        i_static = np.repeat(sc.grid_cols, nslot_c)

        jdat = gather_rows(planes, cand.j_real)                 # [W,K_c,24]
        j_pos, j_rot = jdat[..., :3], jdat[..., 3:12].reshape(w, kp_c, 3, 3)
        j_params, j_type = jdat[..., 12:18], jdat[..., 18].astype(jnp.int32)
        j_fric, j_rest = jdat[..., 19], jdat[..., 20]
        j_vs = jdat[..., 21:24]

        idyn = jnp.broadcast_to(iplane_col[:, :, None, :],
                                (w, cg, nslot_c, 15)).reshape(w, kp_c, 15)
        i_pos, i_rot = idyn[..., :3], idyn[..., 3:12].reshape(w, kp_c, 3, 3)
        pred_c = (margin + jnp.linalg.norm(idyn[..., 12:15] - j_vs, axis=-1)
                  ).astype(dtype)
        i_type = jnp.asarray(t.col_shape[i_static])[None]
        i_params = jnp.asarray(t.col_params[i_static])[None]
        i_fric = jnp.asarray(t.col_friction[i_static])[None]
        i_rest = jnp.asarray(t.col_restitution[i_static])[None]

        sw1 = cand.swap
        sw3 = sw1[..., None]
        sw33 = sw1[..., None, None]
        type_a = jnp.where(sw1, j_type, i_type)
        type_b = jnp.where(sw1, i_type, j_type)
        params_a = jnp.where(sw3, j_params, i_params)
        params_b = jnp.where(sw3, i_params, j_params)
        pos_a = jnp.where(sw3, j_pos, i_pos)
        pos_b = jnp.where(sw3, i_pos, j_pos)
        rot_a = jnp.where(sw33, j_rot, i_rot)
        rot_b = jnp.where(sw33, i_rot, j_rot)

        hull_a = hull_b = None
        if hull_flat is not None:
            nv3 = _hv_n * 3
            jh = gather_rows(jnp.broadcast_to(
                jnp.asarray(hull_flat)[None], (w, c, hull_flat.shape[1])),
                cand.j_real)                                   # [W,K_c,256]
            ih = jnp.asarray(hull_flat[i_static])[None]        # static [1,K,256]
            ih = jnp.broadcast_to(ih, jh.shape)

            def unpack(h):
                v = h[..., :nv3].reshape(h.shape[:-1] + (_hv_n, 3))
                vm = h[..., nv3:nv3 + _hv_n] > 0.5
                n_ = h[..., nv3 + _hv_n:nv3 + _hv_n + _hf_n * 3].reshape(
                    h.shape[:-1] + (_hf_n, 3))
                nm = h[..., nv3 + _hv_n + _hf_n * 3:] > 0.5
                return v, vm, n_, nm

            ah = jnp.where(sw3, jh, ih)
            bh = jnp.where(sw3, ih, jh)
            hull_a = unpack(ah)
            hull_b = unpack(bh)
        man = np_mod.generate_contacts_class(
            cls_idx, type_a, params_a, pos_a, rot_a,
            type_b, params_b, pos_b, rot_b, pred=pred_c,
            hull_a=hull_a, hull_b=hull_b)

        body_i = jnp.asarray(col_body_np[i_static])[None]
        body_a = jnp.where(sw1, cand.body_j, body_i)
        body_b = jnp.where(sw1, body_i, cand.body_j)
        segs.append(solver_mod.DirectedSeg(
            body_a=body_a, body_b=body_b,
            sigma=jnp.where(sw1, -1.0, 1.0).astype(dtype),
            body_self=body_a, bounds=None,
            normal=man.normal, point=man.points, depth=man.depth,
            active=man.active & cand.valid[:, :, None],
            friction=jnp.sqrt(i_fric * j_fric),
            restitution=jnp.maximum(i_rest, j_rest),
            window=0,
            slab_swap=cand.swap, slab_body_j=cand.body_j,
            slab_inc_gb=sc.inc_gb, slab_s=nslot_c))
        seg_npts.append(npts)
        pid_parts.append(cand.pid)

        if state.warm_n is not None:
            kk_c = kp_c * npts
            same = ((state.warm_pair[:, poff:poff + kp_c] == cand.pid)
                    & cand.valid)
            warm_in.append(tuple(
                (arr[:, koff:koff + kk_c] * jnp.repeat(same, npts, axis=1)
                 ).reshape(w, kp_c, npts)
                for arr in (state.warm_n, state.warm_t1, state.warm_t2)))
        koff += kp_c * npts
        poff += kp_c

    sp = solver_mod.SolverParams(
        dt=jnp.asarray(dt, dtype), erp=t.erp,
        allowed_linear_error=t.allowed_linear_error,
        max_corrective_velocity=t.max_corrective_velocity,
        restitution_threshold=t.restitution_threshold,
        n_substeps=t.n_substeps, n_pgs=t.n_pgs,
        n_stabilization=t.n_stabilization,
        warmstart_coefficient=t.warmstart_coefficient,
        mass_split_pow=t.mass_split_pow)

    position, rotation, linvel, angvel, lam_out = solver_mod.solve_tgs_directed(
        state.position, state.rotation, state.linvel, angvel,
        jnp.asarray(t.com_local), inv_mass, jnp.asarray(t.inv_inertia_local),
        accel, segs, sp, warm=(warm_in if warm_in else None),
        joints=t.joints)

    position, rotation, linvel, angvel = _apply_locks_damping(
        state, t, dt, position, rotation, linvel, angvel)

    if state.warm_n is not None and lam_out:
        warm_n = jnp.concatenate(
            [lam[0].reshape(w, -1) for lam in lam_out], axis=1)
        warm_t1 = jnp.concatenate(
            [lam[1].reshape(w, -1) for lam in lam_out], axis=1)
        warm_t2 = jnp.concatenate(
            [lam[2].reshape(w, -1) for lam in lam_out], axis=1)
        warm_pair = jnp.concatenate(pid_parts, axis=1)
    else:
        warm_n, warm_t1, warm_t2 = state.warm_n, state.warm_t1, state.warm_t2
        warm_pair = state.warm_pair
    return PhysicsState(position=position, rotation=rotation,
                        linvel=linvel, angvel=angvel,
                        force=jnp.zeros_like(state.force),
                        torque=jnp.zeros_like(state.torque),
                        warm_n=warm_n, warm_t1=warm_t1, warm_t2=warm_t2,
                        warm_pair=warm_pair)


def _step_physics_grid(state, t: PhysicsTemplate, dt, accel, angvel, inv_mass):
    """Grid-broadphase step: directed candidate sets per manifold class →
    per-class narrowphase (canonical ordering shared by twin slots) →
    solve_tgs_directed (windowed segment-sum scatters)."""
    from fyrox_tpu.physics import broadphase as bp_mod

    w = state.position.shape[0]
    dtype = state.position.dtype
    b = t.num_bodies
    gb = t.grid

    cpos, crot = _collider_world(state, t)
    ctype = jnp.asarray(t.col_shape)
    cparams = jnp.asarray(t.col_params)
    margin = t.allowed_linear_error + SPECULATIVE_MARGIN
    he = sh.shape_aabb_half_extents(ctype[None], cparams[None], crot) + margin
    amin, amax = cpos - he, cpos + he
    # halfspace AABB = its actual half-volume (clip along the plane normal,
    # exact for axis-aligned planes, conservative otherwise): an airborne
    # body then stops being a ground candidate until it is near the plane
    is_hs = (ctype == sh.HALFSPACE)[None, :, None]
    n_hs = crot[..., :, 1]
    amax = jnp.where(is_hs, cpos + sh._HUGE * (1.0 - n_hs) + margin, amax)
    amin = jnp.where(is_hs, cpos - sh._HUGE * (1.0 + n_hs) - margin, amin)

    col_body_np = np.asarray(t.col_body)
    dyn_col = (np.asarray(t.body_type)[col_body_np] == DYNAMIC)
    sets = bp_mod.grid_candidates(gb, col_body_np, dyn_col, amin, amax)

    kinds = jnp.asarray(gb._kinds)
    cb = jnp.asarray(t.col_body)
    fric = jnp.asarray(t.col_friction)
    rest = jnp.asarray(t.col_restitution)
    pred = jnp.asarray(margin, dtype)

    def gat2(arr, idx):  # arr [W,C,...], idx [W,P]
        return jnp.take_along_axis(
            arr, idx.reshape(idx.shape + (1,) * (arr.ndim - 2)), axis=1)

    segs = []            # aligned with classes having cap > 0
    seg_cls = []
    warm_in = []
    # slice the stored warm arrays per class (flat layout: per-class
    # [P_c * n_c] points and [P_c] pair ids, concatenated)
    koff, poff = 0, 0
    for cls, cs in enumerate(sets):
        cap = cs.ia.shape[1]
        if cap == 0:
            continue
        npts = bp_mod.CLASS_NPTS[cls]
        ia, ib, valid = cs.ia, cs.ib, cs.valid
        ek_a = kinds[ia]
        ek_b = kinds[ib]
        swap = (ek_a > ek_b) | ((ek_a == ek_b) & (ia > ib))
        iA = jnp.where(swap, ib, ia)
        iB = jnp.where(swap, ia, ib)
        m = np_mod.generate_contacts_class(
            cls, ctype[iA], cparams[iA], gat2(cpos, iA), gat2(crot, iA),
            ctype[iB], cparams[iB], gat2(cpos, iB), gat2(crot, iB), pred)
        body_self = cb[ia]
        seg = solver_mod.DirectedSeg(
            body_a=cb[iA], body_b=cb[iB],
            sigma=jnp.where(swap, -1.0, 1.0).astype(dtype),
            body_self=body_self,
            bounds=solver_mod.segment_bounds(body_self, b),
            normal=m.normal, point=m.points, depth=m.depth,
            active=m.active & valid[:, :, None],
            friction=jnp.sqrt(fric[ia] * fric[ib]),
            restitution=jnp.maximum(rest[ia], rest[ib]),
            window=gb.windows_body[cls])
        segs.append(seg)
        seg_cls.append(cls)

        if state.warm_n is not None:
            kk = cap * npts
            same = (state.warm_pair[:, poff:poff + cap] == cs.pid) & valid
            same_k = jnp.repeat(same, npts, axis=1)
            warm_in.append(tuple(
                (arr[:, koff:koff + kk] * same_k).reshape(w, cap, npts)
                for arr in (state.warm_n, state.warm_t1, state.warm_t2)))
        koff += cap * npts
        poff += cap

    sp = solver_mod.SolverParams(
        dt=jnp.asarray(dt, dtype), erp=t.erp,
        allowed_linear_error=t.allowed_linear_error,
        max_corrective_velocity=t.max_corrective_velocity,
        restitution_threshold=t.restitution_threshold,
        n_substeps=t.n_substeps, n_pgs=t.n_pgs,
        n_stabilization=t.n_stabilization,
        warmstart_coefficient=t.warmstart_coefficient,
        mass_split_pow=t.mass_split_pow)

    position, rotation, linvel, angvel, lam_out = solver_mod.solve_tgs_directed(
        state.position, state.rotation, state.linvel, angvel,
        jnp.asarray(t.com_local), inv_mass, jnp.asarray(t.inv_inertia_local),
        accel, segs, sp, warm=(warm_in if warm_in else None), joints=t.joints)

    position, rotation, linvel, angvel = _apply_locks_damping(
        state, t, dt, position, rotation, linvel, angvel)

    # warm bookkeeping back to the flat layout
    if state.warm_n is not None and lam_out:
        warm_n = jnp.concatenate(
            [lam[0].reshape(w, -1) for lam in lam_out], axis=1)
        warm_t1 = jnp.concatenate(
            [lam[1].reshape(w, -1) for lam in lam_out], axis=1)
        warm_t2 = jnp.concatenate(
            [lam[2].reshape(w, -1) for lam in lam_out], axis=1)
        warm_pair = jnp.concatenate(
            [cs.pid for cs in sets if cs.ia.shape[1] > 0], axis=1)
    else:
        warm_n, warm_t1, warm_t2 = state.warm_n, state.warm_t1, state.warm_t2
        warm_pair = state.warm_pair

    return PhysicsState(position=position, rotation=rotation,
                        linvel=linvel, angvel=angvel,
                        force=jnp.zeros_like(state.force),
                        torque=jnp.zeros_like(state.torque),
                        warm_n=warm_n, warm_t1=warm_t1, warm_t2=warm_t2,
                        warm_pair=warm_pair)
