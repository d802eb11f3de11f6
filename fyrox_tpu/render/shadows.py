"""Cascaded shadow maps for directional lights.

Equivalent of the reference's CsmRenderer (fyrox-impl/src/renderer/shadow/
csm.rs:90): 3 cascades (light/directional.rs:55 CSM_NUM_CASCADES), camera
frustum sliced at fractional far planes, a per-cascade orthographic
projection fit to the slice's corners in light space (csm.rs:194-253), a
depth-only rasterization per cascade, and PCF depth-compare at shading time.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.render import raster as raster_mod
from fyrox_tpu.scene import camera as camera_mod

__all__ = ["CsmConfig", "fit_cascades", "render_cascade_depths", "csm_visibility"]

NUM_CASCADES = 3  # directional.rs:55


class CsmConfig(NamedTuple):
    splits: tuple = (0.05, 0.2, 1.0)  # fractional far planes per cascade
    map_size: int = 256
    bias: float = 2.5e-3
    pcf: bool = True


def _frustum_slice_corners(inv_view, fov_y, aspect, z0, z1):
    """8 world-space corners of the camera frustum slice [z0, z1]."""
    ty = jnp.tan(0.5 * fov_y)
    tx = ty * aspect
    corners = []
    for z in (z0, z1):
        for sy in (-1.0, 1.0):
            for sx in (-1.0, 1.0):
                # camera space (RH, looking -Z in view space)
                corners.append(jnp.stack([sx * tx * z, sy * ty * z, -z]))
    c = jnp.stack(corners)                                   # [8,3]
    ch = jnp.concatenate([c, jnp.ones((8, 1), c.dtype)], -1)
    world = jnp.einsum("...ij,kj->...ki", inv_view, ch, precision="highest")
    return world[..., :3]


def fit_cascades(view, fov_y, aspect, z_near, z_far, light_dir,
                 config: CsmConfig = CsmConfig()):
    """Per-cascade light view-projection matrices [..., NUM_CASCADES, 4, 4].

    Mirrors CsmRenderer::render (csm.rs:194-253): build a light-space view
    looking along the light direction, transform the slice corners, fit an
    ortho box around them (padded along the light axis so casters behind
    the slice still shadow it).
    """
    from fyrox_tpu.core import transform as tfm
    inv_view = tfm.invert_affine(view)
    ld = light_dir / jnp.maximum(jnp.linalg.norm(light_dir, axis=-1,
                                                 keepdims=True), 1e-8)
    up = jnp.where(jnp.abs(ld[..., 1:2]) > 0.99,
                   jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    vps = []
    prev = z_near
    for ci in range(NUM_CASCADES):
        z1 = z_far * config.splits[ci]
        corners = _frustum_slice_corners(inv_view, fov_y, aspect, prev, z1)
        center = jnp.mean(corners, axis=-2)
        lview = camera_mod.look_at_rh(center - ld * 1.0, center, up)
        ch = jnp.concatenate([corners, jnp.ones(corners.shape[:-1] + (1,),
                                                corners.dtype)], -1)
        lc = jnp.einsum("...ij,...kj->...ki", lview, ch,
                        precision="highest")[..., :3]
        mins = jnp.min(lc, axis=-2)
        maxs = jnp.max(lc, axis=-2)
        # pad the near side along the light axis to catch casters behind
        depth_pad = 50.0
        l, r = mins[..., 0], maxs[..., 0]
        b, t = mins[..., 1], maxs[..., 1]
        # view space looks down -Z: visible z in [-maxdist, -mindist]
        zn = -maxs[..., 2] - depth_pad
        zf = -mins[..., 2] + 1.0
        proj = _ortho_offcenter(l, r, b, t, zn, zf)
        vps.append(jnp.einsum("...ij,...jk->...ik", proj, lview,
                              precision="highest"))
        prev = z1
    return jnp.stack(vps, axis=-3)


def _ortho_offcenter(l, r, b, t, zn, zf):
    shape = jnp.broadcast_shapes(jnp.shape(l), jnp.shape(r))
    m = jnp.zeros(shape + (4, 4), jnp.float32)
    m = m.at[..., 0, 0].set(2.0 / (r - l))
    m = m.at[..., 0, 3].set(-(r + l) / (r - l))
    m = m.at[..., 1, 1].set(2.0 / (t - b))
    m = m.at[..., 1, 3].set(-(t + b) / (t - b))
    m = m.at[..., 2, 2].set(-2.0 / (zf - zn))
    m = m.at[..., 2, 3].set(-(zf + zn) / (zf - zn))
    m = m.at[..., 3, 3].set(1.0)
    return m


def render_cascade_depths(world_tri_positions, cascade_vps, map_size,
                          tri_valid=None, chunk=64, use_pallas=False,
                          k_per_tile=512, pallas_interpret=False,
                          tri_budget=0.0, bin_mode="topk",
                          edge_mode="vpu"):
    """Depth-only passes. world_tri_positions [T,3,3]; cascade_vps
    [NUM_CASCADES,4,4] → depth maps [NUM_CASCADES, S, S] (NDC z).

    tri_budget > 0 enables per-cascade triangle PRE-CULL (csm.rs culls
    casters per cascade volume): triangles whose ortho-NDC bbox misses
    the cascade's [-1,1]² footprint compact away into a static
    ceil(T*tri_budget) budget before feature prep/binning — each cascade
    then pays feature+binning+top_k on the reduced set. In-volume
    triangles beyond the budget drop SMALLEST-PROJECTED-AREA first
    (minimal shadow-darkness loss); size budgets from the scene's
    per-cascade occupancy.

    tri_budget may be a scalar (shared budget, cascades vmapped) or a
    per-cascade sequence (e.g. (0.05, 1.0, 0.7)): near cascades usually
    see a tiny slice of the scene, far cascades most of it, so honest
    per-cascade budgets make the cull lossless where occupancy is known.
    Entries >= 1 keep the full set for that cascade."""
    t_total = world_tri_positions.shape[0]

    def _budget_of(frac, skip_full=False):
        if frac and t_total > 16 and not (skip_full and frac >= 1.0):
            return min(-(-int(t_total * frac) // 8) * 8,   # chunk-aligned
                       t_total)
        return 0

    def one(vp, budget):
        clip = raster_mod.transform_clip(world_tri_positions, vp[None])
        valid = (jnp.ones(t_total, bool) if tri_valid is None
                 else tri_valid)
        if budget:
            # ortho projection: w == 1, NDC == clip.xyz. In-footprint iff
            # the triangle bbox intersects [-1,1]² (z covered by the
            # fit's depth padding)
            ndc = clip[..., :2]                              # [T,3,2]
            inside = (jnp.all(jnp.min(ndc, axis=1) <= 1.0, -1)
                      & jnp.all(jnp.max(ndc, axis=1) >= -1.0, -1)
                      & valid)
            # overflow priority: keep the largest projected areas (depth
            # test makes order irrelevant, so any permutation of the
            # kept set renders identically)
            e1 = ndc[:, 1] - ndc[:, 0]
            e2 = ndc[:, 2] - ndc[:, 0]
            area = jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
            score = jnp.where(inside, area, -1.0)
            topv, topi = jax.lax.top_k(score, budget)
            clip_c = clip[topi]
            valid_c = topv >= 0.0
        else:
            clip_c, valid_c = clip, valid
        if use_pallas:
            from fyrox_tpu.render.pallas_raster import rasterize_pallas
            return rasterize_pallas(clip_c, {}, map_size, map_size,
                                    tri_valid=valid_c,
                                    k_per_tile=min(k_per_tile,
                                                   clip_c.shape[0]),
                                    interpret=pallas_interpret,
                                    depth_only=True, backface_cull=False,
                                    bin_mode=bin_mode,
                                    edge_mode=edge_mode)
        d3 = jnp.zeros(clip_c.shape[:2] + (3,), jnp.float32)
        d2 = jnp.zeros(clip_c.shape[:2] + (2,), jnp.float32)
        attrs = dict(albedo=d3, normal=d3, position=d3, material=d2,
                     emission=d3)
        g = raster_mod.rasterize(clip_c, attrs, map_size, map_size,
                                 tri_valid=valid_c, chunk=chunk,
                                 backface_cull=False)
        return g.depth

    n_casc = cascade_vps.shape[0]
    import os as _os
    from fyrox_tpu.render import pallas_raster as _pr
    # While a bin-demand trace is active the per-pass occupancy scalars
    # are recorded from inside `one`; vmapping over cascades would trap
    # them inside the inner trace scope (UnexpectedTracerError at the
    # caller), so unroll the cascade loop in that case — identical math,
    # one binned-pass demand entry per cascade.
    unroll = _pr._DEMAND_TRACE is not None
    if isinstance(tri_budget, (tuple, list)) or unroll:
        fracs = (list(tri_budget) if isinstance(tri_budget, (tuple, list))
                 else [tri_budget] * n_casc)
        fracs += [fracs[-1]] * max(0, n_casc - len(fracs))
        budgets = [_budget_of(fracs[ci], skip_full=True)
                   for ci in range(n_casc)]
        one_launch = (use_pallas and not unroll
                      and _os.environ.get("FYROX_CSM_LAUNCH", "batched")
                      == "batched")
        if not one_launch:
            return jnp.stack([one(cascade_vps[ci], budgets[ci])
                              for ci in range(n_casc)])
        # ---- batched single-launch cascades: per-cascade budget cull
        # first, PAD each cascade's kept set to the common max, then ONE
        # vmapped depth raster (the Pallas grid extends over the cascade
        # axis) instead of n_casc separate kernel dispatches ----
        n_max = max(b if b else t_total for b in budgets)

        def cull(vp, budget):
            clip = raster_mod.transform_clip(world_tri_positions, vp[None])
            valid = (jnp.ones(t_total, bool) if tri_valid is None
                     else tri_valid)
            if budget:
                ndc = clip[..., :2]
                inside = (jnp.all(jnp.min(ndc, axis=1) <= 1.0, -1)
                          & jnp.all(jnp.max(ndc, axis=1) >= -1.0, -1)
                          & valid)
                e1 = ndc[:, 1] - ndc[:, 0]
                e2 = ndc[:, 2] - ndc[:, 0]
                area = jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
                score = jnp.where(inside, area, -1.0)
                topv, topi = jax.lax.top_k(score, budget)
                clip, valid = clip[topi], topv >= 0.0
            if clip.shape[0] < n_max:
                pad = n_max - clip.shape[0]
                clip = jnp.concatenate(
                    [clip, jnp.zeros((pad,) + clip.shape[1:], clip.dtype)])
                valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
            return clip, valid

        clips, valids = zip(*[cull(cascade_vps[ci], budgets[ci])
                              for ci in range(n_casc)])
        from fyrox_tpu.render.pallas_raster import rasterize_pallas
        return jax.vmap(lambda cc, vv: rasterize_pallas(
            cc, {}, map_size, map_size, tri_valid=vv,
            k_per_tile=min(k_per_tile, n_max), interpret=pallas_interpret,
            depth_only=True, backface_cull=False, bin_mode=bin_mode,
            edge_mode=edge_mode))(jnp.stack(clips), jnp.stack(valids))
    budget = _budget_of(tri_budget)
    return jax.vmap(lambda vp: one(vp, budget))(cascade_vps)


def csm_visibility(world_pos, view, cascade_vps, depth_maps,
                   z_far, config: CsmConfig = CsmConfig()):
    """Shadow visibility [H,W] ∈ [0,1] for a directional light.

    Cascade selected by camera-space depth against the split distances;
    3x3 PCF over the selected cascade's depth map.
    """
    s = depth_maps.shape[-1]
    # camera-space depth of each pixel
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    cam_z = -jnp.einsum("ij,...j->...i", view, ph,
                        precision="highest")[..., 2]
    split_d = jnp.asarray([z_far * f for f in config.splits], jnp.float32)
    cascade = jnp.sum((cam_z[..., None] > split_d[None, None]).astype(jnp.int32),
                      axis=-1)
    cascade = jnp.clip(cascade, 0, NUM_CASCADES - 1)

    # project into ALL cascades (cheap elementwise math), then SELECT the
    # active cascade's coordinates before sampling — so the expensive
    # depth-map gathers run once, not once per cascade
    lc = jnp.einsum("cij,...j->...ci", cascade_vps, ph,
                    precision="highest")                      # [...,C,4]
    ndc = lc[..., :3] / jnp.maximum(jnp.abs(lc[..., 3:4]), 1e-8) \
        * jnp.sign(lc[..., 3:4])
    sel = cascade[..., None, None]                             # [...,1,1]
    ndc_sel = jnp.take_along_axis(ndc, jnp.broadcast_to(sel, ndc.shape[:-2] + (1, 3)),
                                  axis=-2)[..., 0, :]
    u = (ndc_sel[..., 0] * 0.5 + 0.5) * s
    v_ = (0.5 - ndc_sel[..., 1] * 0.5) * s
    z_ref = ndc_sel[..., 2] - config.bias
    inside = ((u >= 0) & (u < s) & (v_ >= 0) & (v_ < s)
              & (jnp.abs(ndc_sel[..., 2]) <= 1.0))

    def sample(du, dv):
        ui = jnp.clip(u.astype(jnp.int32) + du, 0, s - 1)
        vi = jnp.clip(v_.astype(jnp.int32) + dv, 0, s - 1)
        occ = depth_maps[cascade, vi, ui]
        return (z_ref <= occ).astype(jnp.float32)

    if config.pcf:
        vis = sum(sample(du, dv)
                  for du in (-1, 0, 1) for dv in (-1, 0, 1)) / 9.0
    else:
        vis = sample(0, 0)
    return jnp.where(inside, vis, 1.0)


# --------------------------------------------------------------------------
# spot + point shadow maps (renderer/shadow/spot.rs:49, point.rs:50)
# --------------------------------------------------------------------------

def _perspective_from(fov_y, z_near, z_far):
    f = 1.0 / jnp.tan(jnp.asarray(fov_y) * 0.5)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((z_far + z_near) / (z_near - z_far))
    m = m.at[2, 3].set(2.0 * z_far * z_near / (z_near - z_far))
    m = m.at[3, 2].set(-1.0)
    return m


def _look_at(eye, fwd, up):
    z = -fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-8)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-8)
    y = jnp.cross(z, x)
    r = jnp.stack([x, y, z], 0)                       # rows
    t = -r @ eye
    m = jnp.zeros((4, 4), jnp.float32).at[:3, :3].set(r).at[:3, 3].set(t)
    return m.at[3, 3].set(1.0)


def spot_vp(light_pos, light_dir, cos_falloff, z_near=0.05, z_far=100.0):
    """View-projection for a spot light's shadow map (SpotShadowMapRenderer,
    shadow/spot.rs:49): perspective frustum matching the outer cone."""
    fov = 2.0 * jnp.arccos(jnp.clip(cos_falloff, -1.0, 1.0)) + 0.1
    up = jnp.where(jnp.abs(light_dir[1]) > 0.99,
                   jnp.asarray([1.0, 0.0, 0.0]),
                   jnp.asarray([0.0, 1.0, 0.0]))
    view = _look_at(light_pos, light_dir, up)
    proj = _perspective_from(fov, z_near, z_far)
    return proj @ view


def render_map_depth(world_tri_positions, vp, map_size, tri_valid=None,
                     chunk=64, use_pallas=False, k_per_tile=512,
                     pallas_interpret=False):
    """One depth-only pass for an arbitrary light view-projection."""
    return render_cascade_depths(world_tri_positions, vp[None], map_size,
                                 tri_valid=tri_valid, chunk=chunk,
                                 use_pallas=use_pallas, k_per_tile=k_per_tile,
                                 pallas_interpret=pallas_interpret)[0]


def map_visibility(world_pos, vp, depth_map, bias=2e-3, pcf=True):
    """Generic projected-shadow-map test ([*,3] world → [*] ∈ [0,1])."""
    s = depth_map.shape[-1]
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    lc = jnp.einsum("ij,...j->...i", vp, ph, precision="highest")
    behind = lc[..., 3] <= 1e-6
    ndc = lc[..., :3] / jnp.maximum(jnp.abs(lc[..., 3:4]), 1e-8) \
        * jnp.sign(lc[..., 3:4])
    u = (ndc[..., 0] * 0.5 + 0.5) * s
    v_ = (0.5 - ndc[..., 1] * 0.5) * s
    z_ref = ndc[..., 2] - bias
    inside = (~behind & (u >= 0) & (u < s) & (v_ >= 0) & (v_ < s)
              & (jnp.abs(ndc[..., 2]) <= 1.0))

    def sample(du, dv):
        ui = jnp.clip(u.astype(jnp.int32) + du, 0, s - 1)
        vi = jnp.clip(v_.astype(jnp.int32) + dv, 0, s - 1)
        return (z_ref <= depth_map[vi, ui]).astype(jnp.float32)

    if pcf:
        vis = sum(sample(du, dv)
                  for du in (-1, 0, 1) for dv in (-1, 0, 1)) / 9.0
    else:
        vis = sample(0, 0)
    return jnp.where(inside, vis, 1.0)


# the six cube faces: forward axis + up vector (PointShadowMapRenderer,
# shadow/point.rs:50 renders a cube map; here six 90° perspective maps
# selected by the dominant axis of the light→fragment vector)
_CUBE_FACES = (
    ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
    ((-1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
    ((0.0, 1.0, 0.0), (0.0, 0.0, 1.0)),
    ((0.0, -1.0, 0.0), (0.0, 0.0, 1.0)),
    ((0.0, 0.0, 1.0), (0.0, 1.0, 0.0)),
    ((0.0, 0.0, -1.0), (0.0, 1.0, 0.0)),
)


def point_vps(light_pos, z_near=0.05, z_far=100.0):
    """[6,4,4] cube-face view-projections for a point light."""
    proj = _perspective_from(jnp.pi / 2 + 0.2, z_near, z_far)
    vps = []
    for fwd, up in _CUBE_FACES:
        view = _look_at(light_pos, jnp.asarray(fwd), jnp.asarray(up))
        vps.append(proj @ view)
    return jnp.stack(vps, 0)


def render_point_depths(world_tri_positions, light_pos, map_size,
                        tri_valid=None, chunk=64, z_far=100.0,
                        use_pallas=False, k_per_tile=512,
                        pallas_interpret=False):
    """[6, S, S] cube-face depth maps."""
    vps = point_vps(light_pos, z_far=z_far)
    return vps, render_cascade_depths(
        world_tri_positions, vps, map_size, tri_valid=tri_valid, chunk=chunk,
        use_pallas=use_pallas, k_per_tile=k_per_tile,
        pallas_interpret=pallas_interpret)


def point_visibility(world_pos, light_pos, vps, depth_maps, bias=3e-3):
    """Cube-map shadow test: pick the face by the dominant axis of the
    light→fragment direction, then a projected depth compare on that face."""
    d = world_pos - light_pos
    ax = jnp.abs(d)
    dom = jnp.argmax(ax, axis=-1)                     # [*]
    face = jnp.where(dom == 0, jnp.where(d[..., 0] >= 0, 0, 1),
            jnp.where(dom == 1, jnp.where(d[..., 1] >= 0, 2, 3),
                      jnp.where(d[..., 2] >= 0, 4, 5)))
    s = depth_maps.shape[-1]
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    # project into all six faces, select before the map gather (cheap
    # elementwise math vs 6x the gather traffic — same trick as the CSM)
    lc = jnp.einsum("fij,...j->...fi", vps, ph, precision="highest")
    ndc = lc[..., :3] / jnp.maximum(jnp.abs(lc[..., 3:4]), 1e-8) \
        * jnp.sign(lc[..., 3:4])
    sel = face[..., None, None]
    nsel = jnp.take_along_axis(ndc, jnp.broadcast_to(
        sel, ndc.shape[:-2] + (1, 3)), axis=-2)[..., 0, :]
    u = jnp.clip(((nsel[..., 0] * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    v_ = jnp.clip(((0.5 - nsel[..., 1] * 0.5) * s).astype(jnp.int32), 0, s - 1)
    occ = depth_maps[face, v_, u]
    vis = (nsel[..., 2] - bias <= occ).astype(jnp.float32)
    return jnp.where(jnp.abs(nsel[..., 2]) <= 1.0, vis, 1.0)
