"""Frame rendering pipeline: cull → G-buffer → shadows → deferred shade.

Equivalent of the reference's Renderer::render_frame chain
(fyrox-impl/src/renderer/mod.rs:1384 → bundle collection + frustum culling
bundle.rs:873-929 → GBuffer::fill gbuffer.rs:57 → DeferredLightRenderer
light.rs:254 → CSM shadow passes csm.rs). One RenderTemplate is built per
scene (static triangle/instance tables); render_frame is a pure function of
the batched WorldState, vmapped over worlds.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.core import frustum as frustum_mod
from fyrox_tpu.core import transform as tfm
from fyrox_tpu.render import lighting as lighting_mod
from fyrox_tpu.render import raster as raster_mod
from fyrox_tpu.render import shadows as shadows_mod
from fyrox_tpu.scene import camera as camera_mod
from fyrox_tpu.scene.template import NodeType, SceneTemplate

__all__ = ["RenderTemplate", "build_render_template", "render_frame",
           "render_frames_chunked", "RenderConfig"]


class RenderConfig(NamedTuple):
    width: int = 256
    height: int = 256
    sky_zenith: tuple = (0.0, 0.0, 0.0)    # skybox.rs stand-in: vertical
    sky_horizon: tuple = (0.0, 0.0, 0.0)   # gradient behind geometry
    shadows: bool = True
    csm: shadows_mod.CsmConfig = shadows_mod.CsmConfig()
    chunk: int = 64
    ambient: tuple = (0.05, 0.05, 0.05)
    use_pallas: bool = False      # tiled/binned Pallas visibility kernel
    k_per_tile: int = 512         # Pallas: max binned triangles per tile
    pallas_interpret: bool = False
    # per-light shadow maps (renderer/shadow/{spot,point}.rs) — opt-in,
    # each enabled light adds a depth pass (6 for point cubes)
    spot_shadows: bool = False
    point_shadows: bool = False
    spot_shadow_size: int = 128
    point_shadow_size: int = 64
    # HZB occlusion culling (renderer/occlusion/mod.rs equivalent):
    # quarter-ish-res depth prepass + max-mip AABB tests. The prepass
    # rasterizes only BIG occluders: nodes whose local-bbox volume is in
    # the top (1 - occluder_quantile) of mesh nodes (0.0 = everything)
    occlusion: bool = False
    occlusion_size: int = 64
    occluder_quantile: float = 0.75
    # volumetric light shafts (renderer/light_volume.rs equivalent)
    light_shafts: bool = False
    # cube-textured skybox (scene/skybox.rs): a render.skybox.SkyBox;
    # overrides the sky_zenith/sky_horizon gradient when set
    skybox: Optional[object] = None
    # Pallas visibility mode: "homogeneous" (2DH, clip-free — default) or
    # "clipped" (exact Sutherland-Hodgman near clipping, 2x binned tris)
    raster_mode: str = "homogeneous"
    # per-cascade triangle pre-cull (csm.rs caster culling): fraction of T
    # kept per cascade after footprint compaction; 0 = off. A scalar
    # shares one budget across vmapped cascades; a per-cascade tuple
    # (e.g. (0.05, 1.0, 0.7)) sizes each cascade to its occupancy —
    # lossless when sized honestly (see shadows.render_cascade_depths)
    cascade_tri_budget: object = 0.0
    # tile binning strategy: "cumsum" (physics-broadphase counting-rank
    # compaction — measured 21.64 vs 22.19 ms/frame/world against
    # "topk" on the render bench, TPU_SESSION4_r4.json) or "topk"
    bin_mode: str = "cumsum"
    # edge-function evaluation in the tile kernel: "vpu" (broadcast
    # chains) or "mxu" (one [F*chunk,3]@[3,px] dot per chunk — A/B)
    edge_mode: str = "vpu"
    # per-tile bin capacity for the CSM depth passes (0 = k_per_tile).
    # Shadow views concentrate the whole caster set into few tiles, so
    # their true demand can far exceed the camera pass's (the r5 audit
    # measured 801 vs <424 on the bench scene) — size them separately
    csm_k_per_tile: int = 0


@dataclass
class RenderTemplate:
    """Static packed geometry for one scene: every MESH node's triangles
    concatenated, with per-vertex owning node for instancing."""
    positions: np.ndarray    # [V,3] mesh-local
    normals: np.ndarray      # [V,3]
    triangles: np.ndarray    # [T,3] into the packed vertex arrays
    vert_node: np.ndarray    # [V] owning scene node
    tri_node: np.ndarray     # [T]
    albedo: np.ndarray       # [V,3]
    material: np.ndarray     # [V,2] metallic, roughness
    emission: np.ndarray     # [V,3]
    camera_node: int = -1
    fov_y: float = np.deg2rad(75.0)
    z_near: float = 0.025
    z_far: float = 2048.0
    # Projection::Orthographic (camera.rs:196): vertical half-size drives
    # an ortho projection instead of the perspective one
    cam_ortho: bool = False
    cam_vertical_size: float = 5.0
    # lights (static parts; positions/directions come from node globals)
    light_node: np.ndarray = None   # [L]
    light_kind: np.ndarray = None   # [L]
    light_color: np.ndarray = None  # [L,3]
    light_intensity: np.ndarray = None
    light_radius: np.ndarray = None
    light_cos_hotspot: np.ndarray = None
    light_cos_falloff: np.ndarray = None
    # sprites (billboards, sprite.rs)
    sprite_node: np.ndarray = None   # [S]
    sprite_size: np.ndarray = None   # [S]
    sprite_color: np.ndarray = None  # [S,3]
    # LOD groups (scene/base.rs:61 LevelOfDetail): flattened per-object
    # entries — object node, [begin, end] normalized-distance range
    lod_obj: np.ndarray = None       # [Lo] int32
    lod_begin: np.ndarray = None     # [Lo] f32
    lod_end: np.ndarray = None       # [Lo] f32
    # transparent (forward-pass) triangle subset: static indices into
    # `triangles` + per-triangle opacity (meshes with alpha < 1)
    tr_tri: np.ndarray = None        # [Tt] int32
    tr_alpha: np.ndarray = None      # [Tt] f32
    # decals (scene/decal.rs): node + color + strength
    decal_node: np.ndarray = None    # [D] int32
    decal_color: np.ndarray = None   # [D,3]
    decal_strength: np.ndarray = None  # [D]
    # texture-mapped materials (gbuffer.rs:57 / bundle.rs:484-495): all
    # scene textures packed into ONE array (normalized resolution); per-
    # triangle layer ids ride the G-buffer's uvt channel and the deferred
    # pass samples at shade time
    uvs: np.ndarray = None           # [V,2]
    tex_array: np.ndarray = None     # [NT,R,R,4] or None
    tri_tex: np.ndarray = None       # [T] int32 albedo layer (-1 = none)
    tri_mr: np.ndarray = None        # [T] int32 metallic-roughness layer

    @property
    def num_triangles(self):
        return int(self.triangles.shape[0])


def build_render_template(template: SceneTemplate,
                          camera_index: int = 0) -> RenderTemplate:
    """Pack all MESH payloads of a SceneTemplate + its lights/camera."""
    pos, nrm, tris, vnode, tnode, alb, mat, emi = [], [], [], [], [], [], [], []
    tri_alpha, uvs, tri_tex, tri_mr = [], [], [], []
    textures: list = []         # registered scene textures (dedup by id)
    tex_ids: dict = {}
    voff = 0

    def _register(tex):
        if tex is None:
            return -1
        key = id(tex)
        if key not in tex_ids:
            # Texture objects carry their data in .base; raw numpy
            # arrays ALSO have a .base attribute (None or a view
            # parent), so they must not take that branch
            arr = (tex.base if hasattr(tex, "base")
                   and not isinstance(tex, np.ndarray) else np.asarray(tex))
            tex_ids[key] = len(textures)
            textures.append(np.asarray(arr, np.float32))
        return tex_ids[key]

    def _mesh_tex(mesh, attr, mat_key):
        t = getattr(mesh, attr, None)
        m = getattr(mesh, "material", None)
        if t is None and m is not None and getattr(m, "textures", None):
            t = m.textures.get(mat_key)     # .shader standard names
        return t

    for node_idx in range(template.num_nodes):
        if template.node_type[node_idx] != NodeType.MESH:
            continue
        mesh = template.meshes[template.payload[node_idx]]
        v = mesh.positions.shape[0]
        nt = mesh.triangles.shape[0]
        pos.append(mesh.positions)
        nrm.append(mesh.normals)
        tris.append(mesh.triangles + voff)
        vnode.append(np.full(v, node_idx, np.int32))
        tnode.append(np.full(nt, node_idx, np.int32))
        alb.append(np.tile(np.asarray(mesh.albedo, np.float32), (v, 1)))
        mat.append(np.tile(np.asarray([mesh.metallic, mesh.roughness],
                                      np.float32), (v, 1)))
        emi.append(np.tile(np.asarray(mesh.emission, np.float32), (v, 1)))
        tri_alpha.append(np.full(nt, getattr(mesh, "alpha", 1.0), np.float32))
        muv = getattr(mesh, "uvs", None)
        uvs.append(np.asarray(muv, np.float32) if muv is not None
                   and len(np.shape(muv)) == 2 else np.zeros((v, 2), np.float32))
        tri_tex.append(np.full(nt, _register(
            _mesh_tex(mesh, "albedo_texture", "diffuseTexture")), np.int32))
        tri_mr.append(np.full(nt, _register(
            _mesh_tex(mesh, "mr_texture", "metallicRoughnessTexture")),
            np.int32))
        voff += v
    # ---- Rectangle 2D nodes (dim2/rectangle.rs): unit quad in the
    # node's local XY plane, double-sided (both windings), emissive so
    # it reads unlit like the reference's 2D forward path; uv_rect
    # selects the texture sub-region ----
    rects = template.rectangles if getattr(template, "rectangles", None) else {}
    for ri, node_idx in enumerate(rects.get("node", [])):
        node_idx = int(node_idx)
        col = np.asarray(rects["color"][ri], np.float32)
        u0, v0, u1, v1 = (float(x) for x in rects["uv_rect"][ri])
        quad = np.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                           [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]], np.float32)
        quv = np.asarray([[u0, v1], [u1, v1], [u1, v0], [u0, v0]],
                         np.float32)
        tri2 = np.asarray([[0, 1, 2], [0, 2, 3],        # front (+Z)
                           [0, 2, 1], [0, 3, 2]], np.int32)  # back
        pos.append(quad)
        nrm.append(np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1)))
        tris.append(tri2 + voff)
        vnode.append(np.full(4, node_idx, np.int32))
        tnode.append(np.full(4, node_idx, np.int32))
        alb.append(np.tile(col, (4, 1)))
        mat.append(np.zeros((4, 2), np.float32))
        emi.append(np.tile(col, (4, 1)))
        tri_alpha.append(np.ones(4, np.float32))
        uvs.append(quv)
        ti = int(rects["texture"][ri])
        tex = (template.rect_textures[ti] if ti >= 0 else None)
        tri_tex.append(np.full(4, _register(tex), np.int32))
        tri_mr.append(np.full(4, -1, np.int32))
        voff += 4

    n_sprites = len((template.sprites or {}).get("node", []))
    if not pos and not n_sprites:
        raise ValueError("scene has no MESH, RECTANGLE or SPRITE nodes "
                         "to render")
    if not pos:
        pos = [np.zeros((3, 3), np.float32)]
        nrm = [np.tile(np.asarray([[0, 1, 0]], np.float32), (3, 1))]
        tris = [np.zeros((0, 3), np.int32)]
        vnode = [np.zeros(3, np.int32)]
        tnode = [np.zeros(0, np.int32)]
        alb = [np.zeros((3, 3), np.float32)]
        mat = [np.zeros((3, 2), np.float32)]
        emi = [np.zeros((3, 3), np.float32)]
        tri_alpha = [np.zeros(0, np.float32)]
        uvs = [np.zeros((3, 2), np.float32)]
        tri_tex = [np.zeros(0, np.int32)]
        tri_mr = [np.zeros(0, np.int32)]

    tex_array = None
    if textures:
        from fyrox_tpu.render.texture import resize_bilinear
        r = min(max(max(t.shape[0], t.shape[1]) for t in textures), 512)
        packed = []
        for t in textures:
            if t.ndim == 2:
                t = np.repeat(t[..., None], 4, -1)
            if t.shape[-1] == 3:
                t = np.concatenate([t, np.ones_like(t[..., :1])], -1)
            packed.append(resize_bilinear(t, r))
        tex_array = np.stack(packed).astype(np.float32)

    sp = template.sprites if template.sprites else {}
    ns = len(sp.get("node", []))
    cams = template.cameras
    cam_node = int(cams["node"][camera_index]) if len(cams["node"]) else -1
    li = template.lights
    nl = len(li["node"]) if li and len(li.get("node", [])) else 0
    return RenderTemplate(
        positions=np.concatenate(pos).astype(np.float32),
        normals=np.concatenate(nrm).astype(np.float32),
        triangles=np.concatenate(tris).astype(np.int32),
        vert_node=np.concatenate(vnode),
        tri_node=np.concatenate(tnode),
        albedo=np.concatenate(alb),
        material=np.concatenate(mat),
        emission=np.concatenate(emi),
        camera_node=cam_node,
        fov_y=float(cams["fov"][camera_index]) if cam_node >= 0 else np.deg2rad(75.0),
        z_near=float(cams["z_near"][camera_index]) if cam_node >= 0 else 0.025,
        z_far=float(cams["z_far"][camera_index]) if cam_node >= 0 else 2048.0,
        cam_ortho=bool(cams["ortho"][camera_index]) if cam_node >= 0 else False,
        cam_vertical_size=(float(cams["vertical_size"][camera_index])
                           if cam_node >= 0 else 5.0),
        light_node=np.asarray(li["node"], np.int32) if nl else np.zeros(0, np.int32),
        light_kind=np.asarray(li["kind"], np.int32) if nl else np.zeros(0, np.int32),
        light_color=(np.stack(li["color"]).astype(np.float32) if nl
                     else np.zeros((0, 3), np.float32)),
        light_intensity=np.asarray(li["intensity"], np.float32) if nl else np.zeros(0),
        light_radius=np.asarray(li["radius"], np.float32) if nl else np.zeros(0),
        light_cos_hotspot=(np.cos(np.asarray(li["hotspot"], np.float32) * 0.5)
                           if nl else np.zeros(0)),
        light_cos_falloff=(np.cos(np.asarray(li["hotspot"], np.float32) * 0.5
                                  + np.asarray(li["falloff_delta"], np.float32))
                           if nl else np.zeros(0)),
        sprite_node=(np.asarray(sp["node"], np.int32) if ns
                     else np.zeros(0, np.int32)),
        sprite_size=(np.asarray(sp["size"], np.float32) if ns
                     else np.zeros(0, np.float32)),
        sprite_color=(np.stack(sp["color"]).astype(np.float32) if ns
                      else np.zeros((0, 3), np.float32)),
        uvs=np.concatenate(uvs).astype(np.float32),
        tex_array=tex_array,
        tri_tex=np.concatenate(tri_tex) if tri_tex else None,
        tri_mr=np.concatenate(tri_mr) if tri_mr else None,
        tr_tri=np.flatnonzero(np.concatenate(tri_alpha) < 0.999
                              ).astype(np.int32),
        tr_alpha=np.concatenate(tri_alpha)[
            np.concatenate(tri_alpha) < 0.999].astype(np.float32),
        decal_node=(np.asarray(template.decals["node"], np.int32)
                    if getattr(template, "decals", None)
                    and len(template.decals.get("node", [])) else None),
        decal_color=(np.stack(template.decals["color"]).astype(np.float32)
                     if getattr(template, "decals", None)
                     and len(template.decals.get("node", [])) else None),
        decal_strength=(np.asarray(template.decals["strength"], np.float32)
                        if getattr(template, "decals", None)
                        and len(template.decals.get("node", [])) else None),
        **_flatten_lod(template),
    )


def _flatten_lod(template):
    """Flatten builder-attached LOD groups (LodGroup, scene/base.rs:129)
    into per-object (node, begin, end) arrays for the culling pass."""
    obj, beg, end = [], [], []
    for levels in template.extras.get("lod_groups", []):
        for b, e, objects in levels:
            b, e = sorted((float(np.clip(b, 0, 1)), float(np.clip(e, 0, 1))))
            for o in objects:
                obj.append(int(o))
                beg.append(b)
                end.append(e)
    return dict(lod_obj=np.asarray(obj, np.int32),
                lod_begin=np.asarray(beg, np.float32),
                lod_end=np.asarray(end, np.float32))


def _frame_one_world(globals_, gvis, rt: RenderTemplate, scene_template,
                     config: RenderConfig):
    """Render one world (vmapped by render_frame)."""
    aspect = config.width / config.height
    cam_g = globals_[rt.camera_node]
    view = camera_mod.view_matrix(cam_g)
    if rt.cam_ortho:
        proj = camera_mod.orthographic(
            jnp.asarray(rt.cam_vertical_size), jnp.asarray(aspect),
            jnp.asarray(rt.z_near), jnp.asarray(rt.z_far))
    else:
        proj = camera_mod.perspective(
            jnp.asarray(rt.fov_y), jnp.asarray(aspect),
            jnp.asarray(rt.z_near), jnp.asarray(rt.z_far))
    vp = jnp.einsum("ij,jk->ik", proj, view, precision="highest")

    # instance transforms → world-space vertices/normals
    vg = globals_[jnp.asarray(rt.vert_node)]          # [V,4,4]
    wpos = tfm.transform_point(vg, jnp.asarray(rt.positions))
    wn = tfm.transform_vector(vg, jnp.asarray(rt.normals))
    wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-8)

    tri = jnp.asarray(rt.triangles)
    tri_pos = wpos[tri]                                # [T,3,3]
    clip = raster_mod.transform_clip(wpos, vp[None])[0]
    tri_clip = clip[tri]                               # [T,3,4]

    # per-node culling: frustum test on world AABBs + visibility flags
    planes = frustum_mod.from_view_projection(vp)
    if scene_template.local_bbox_min is not None:
        from fyrox_tpu.core import aabb as aabb_mod
        bmin = jnp.asarray(scene_template.local_bbox_min)
        bmax = jnp.asarray(scene_template.local_bbox_max)
        wmin, wmax = aabb_mod.transform(bmin, bmax, globals_)
        node_vis = frustum_mod.intersects_aabb(planes[None], wmin, wmax)
    else:
        node_vis = jnp.ones(globals_.shape[0], bool)
    node_vis = node_vis & gvis

    # LOD filter (renderer/bundle.rs:898): objects listed in a LOD level are
    # visible only when their normalized camera distance lies in the level's
    # range; the filter hides whole subtrees (bundle.rs:994), propagated here
    # with the template's pointer-doubling ancestor tables.
    if rt.lod_obj is not None and rt.lod_obj.shape[0]:
        cam_pos = cam_g[:3, 3]
        obj = jnp.asarray(rt.lod_obj)
        opos = globals_[obj][:, :3, 3]
        dist = jnp.linalg.norm(opos - cam_pos[None], axis=-1)
        nd = (dist - rt.z_near) / jnp.maximum(rt.z_far - rt.z_near, 1e-6)
        in_range = (nd >= jnp.asarray(rt.lod_begin)) & (nd <= jnp.asarray(rt.lod_end))
        lod_vis = jnp.ones(globals_.shape[0] + 1, bool).at[obj].set(in_range)
        for p_r in scene_template.doubling_pointers():
            lod_vis = lod_vis & lod_vis[jnp.asarray(p_r)]
        node_vis = node_vis & lod_vis[:-1]

    # ---- HZB occlusion culling (renderer/occlusion/mod.rs:60) ----
    if config.occlusion and scene_template.local_bbox_min is not None:
        from fyrox_tpu.render import occlusion as occ_mod
        os_ = config.occlusion_size
        pre_valid = node_vis[jnp.asarray(rt.tri_node)]
        if config.occluder_quantile > 0.0:
            # static big-occluder mask: tiny props occlude almost nothing
            # but made the prepass re-rasterize the whole scene (r3 weak
            # #4); keep only large-volume nodes as depth casters
            vol = np.prod(np.maximum(
                np.asarray(scene_template.local_bbox_max)
                - np.asarray(scene_template.local_bbox_min), 0.0), axis=1)
            mesh_nodes = np.unique(rt.tri_node)
            thresh = np.quantile(vol[mesh_nodes],
                                 min(max(config.occluder_quantile, 0.0),
                                     1.0))
            occluder_tri = jnp.asarray(vol[rt.tri_node] >= thresh)
            pre_valid = pre_valid & occluder_tri
        if config.use_pallas:
            from fyrox_tpu.render.pallas_raster import rasterize_pallas
            pre_depth = rasterize_pallas(
                tri_clip, {}, os_, os_, tri_valid=pre_valid,
                k_per_tile=config.k_per_tile, depth_only=True,
                interpret=config.pallas_interpret,
                mode=config.raster_mode, bin_mode=config.bin_mode)
        else:
            dummy3 = jnp.zeros(tri_clip.shape[:2] + (3,), jnp.float32)
            dummy2 = jnp.zeros(tri_clip.shape[:2] + (2,), jnp.float32)
            pre_depth = raster_mod.rasterize(
                tri_clip, dict(albedo=dummy3, normal=dummy3, position=dummy3,
                               material=dummy2, emission=dummy3),
                os_, os_, tri_valid=pre_valid, chunk=config.chunk).depth
        hzb = occ_mod.build_hzb(pre_depth)
        occ_vis = occ_mod.occlusion_visible(wmin, wmax, vp, hzb, os_, os_)
        node_vis = node_vis & occ_vis

    tri_valid = node_vis[jnp.asarray(rt.tri_node)]
    # transparent triangles skip the deferred pass (RenderPath::Forward,
    # renderer/mod.rs:1066): they composite after shading, below
    has_transparent = rt.tr_tri is not None and rt.tr_tri.shape[0] > 0
    if has_transparent:
        opq = np.ones(rt.triangles.shape[0], bool)
        opq[rt.tr_tri] = False
        tri_valid = tri_valid & jnp.asarray(opq)

    attrs = dict(
        albedo=jnp.asarray(rt.albedo)[tri],
        normal=wn[tri],
        position=tri_pos,
        material=jnp.asarray(rt.material)[tri],
        emission=jnp.asarray(rt.emission)[tri],
    )
    textured = rt.tex_array is not None
    if textured:
        # (u, v, albedo_layer, mr_layer) per vertex: the layer ids are
        # per-triangle constants, so barycentric interpolation returns
        # them exactly; the deferred pass samples the texture array at
        # shade time (gbuffer.rs:57 material texture sets)
        uv_tri = jnp.asarray(rt.uvs)[tri]                       # [T,3,2]
        tshape = uv_tri.shape[:2] + (1,)
        tid_a = jnp.broadcast_to(
            jnp.asarray(rt.tri_tex, jnp.float32)[:, None, None], tshape)
        tid_m = jnp.broadcast_to(
            jnp.asarray(rt.tri_mr, jnp.float32)[:, None, None], tshape)
        attrs["uvt"] = jnp.concatenate([uv_tri, tid_a, tid_m], -1)

    # ---- sprites: camera-facing billboards (sprite.rs) ----
    n_sprites = rt.sprite_node.shape[0] if rt.sprite_node is not None else 0
    if n_sprites:
        centers = globals_[jnp.asarray(rt.sprite_node)][:, :3, 3]   # [S,3]
        right = view[0, :3]
        up = view[1, :3]
        fwd = -view[2, :3]
        size = jnp.asarray(rt.sprite_size)[:, None]
        c00 = centers - right * size - up * size
        c10 = centers + right * size - up * size
        c11 = centers + right * size + up * size
        c01 = centers - right * size + up * size
        # two triangles per sprite, wound front-facing toward the camera
        quad = jnp.stack([jnp.stack([c00, c10, c11], 1),
                          jnp.stack([c00, c11, c01], 1)], 1)        # [S,2,3,3]
        sp_pos = quad.reshape(-1, 3, 3)                              # [2S,3,3]
        sp_clip = raster_mod.transform_clip(sp_pos.reshape(-1, 3),
                                            vp[None])[0].reshape(-1, 3, 4)
        col = jnp.repeat(jnp.asarray(rt.sprite_color), 2, axis=0)
        sp_attrs = dict(
            albedo=jnp.broadcast_to(col[:, None], sp_pos.shape),
            normal=jnp.broadcast_to(-fwd, sp_pos.shape),
            position=sp_pos,
            material=jnp.zeros(sp_pos.shape[:2] + (2,), jnp.float32),
            # sprites are emissive so they read as unlit billboards
            emission=jnp.broadcast_to(col[:, None], sp_pos.shape),
        )
        if textured:
            sp_attrs["uvt"] = jnp.concatenate(
                [jnp.zeros(sp_pos.shape[:2] + (2,), jnp.float32),
                 jnp.full(sp_pos.shape[:2] + (2,), -1.0, jnp.float32)], -1)
        sp_valid = jnp.repeat(node_vis[jnp.asarray(rt.sprite_node)], 2)
        tri_clip = jnp.concatenate([tri_clip, sp_clip], 0)
        attrs = {k: jnp.concatenate([attrs[k], sp_attrs[k]], 0) for k in attrs}
        tri_valid = jnp.concatenate([tri_valid, sp_valid], 0)
        tri_pos = jnp.concatenate([tri_pos, sp_pos], 0)
    if config.use_pallas:
        from fyrox_tpu.render.pallas_raster import rasterize_pallas
        gbuf = rasterize_pallas(tri_clip, attrs, config.height, config.width,
                                tri_valid=tri_valid,
                                k_per_tile=config.k_per_tile,
                                interpret=config.pallas_interpret,
                                mode=config.raster_mode,
                                bin_mode=config.bin_mode,
                                edge_mode=config.edge_mode)
    else:
        gbuf = raster_mod.rasterize(tri_clip, attrs, config.height,
                                    config.width, tri_valid=tri_valid,
                                    chunk=config.chunk)

    # ---- texture-mapped materials: sample the scene texture array at
    # the interpolated uv + per-pixel layer id (gbuffer.rs:57 fill binds
    # the full material texture set; bundle.rs:484-495 material blocks).
    # Albedo maps multiply the vertex/material color; MR maps' RG multiply
    # metallic/roughness ----
    if textured and gbuf.uvt is not None:
        from fyrox_tpu.render.texture import sample_array_bilinear
        uv_px = gbuf.uvt[..., :2]
        tid_a = jnp.round(gbuf.uvt[..., 2]).astype(jnp.int32)
        tid_m = jnp.round(gbuf.uvt[..., 3]).astype(jnp.int32)
        tex = jnp.asarray(rt.tex_array)
        sa = sample_array_bilinear(tex, jnp.maximum(tid_a, 0), uv_px)
        sm = sample_array_bilinear(tex, jnp.maximum(tid_m, 0), uv_px)
        has_a = ((tid_a >= 0) & gbuf.mask)[..., None]
        has_m = ((tid_m >= 0) & gbuf.mask)[..., None]
        gbuf = gbuf._replace(
            albedo=jnp.where(has_a, gbuf.albedo * sa[..., :3], gbuf.albedo),
            material=jnp.where(has_m, gbuf.material * sm[..., :2],
                               gbuf.material))

    # ---- decals (renderer/decal.rs): project color into the G-buffer
    # inside each decal node's unit-cube volume, before lighting ----
    if rt.decal_node is not None:
        inv = tfm.invert_affine(globals_[jnp.asarray(rt.decal_node)])  # [D,4,4]
        for di in range(rt.decal_node.shape[0]):
            pl = tfm.transform_point(inv[di][None, None], gbuf.position)
            inside = (jnp.all(jnp.abs(pl) <= 0.5, axis=-1)
                      & gbuf.mask
                      & node_vis[int(rt.decal_node[di])])
            w_d = inside.astype(jnp.float32) * float(rt.decal_strength[di])
            col = jnp.asarray(rt.decal_color[di])
            gbuf = gbuf._replace(albedo=gbuf.albedo * (1 - w_d[..., None])
                                 + col * w_d[..., None])

    # lights from node globals
    nl = rt.light_node.shape[0]
    if nl:
        lg = globals_[jnp.asarray(rt.light_node)]
        lpos = lg[..., :3, 3]
        ldir = lg[..., :3, 2]   # light "look" = +Z basis, like cameras
        ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-8)
        lights = lighting_mod.LightSet(
            kind=rt.light_kind,  # static numpy: shade() unrolls on kind
            position=lpos, direction=ldir,
            color=jnp.asarray(rt.light_color),
            intensity=jnp.asarray(rt.light_intensity),
            radius=jnp.asarray(rt.light_radius),
            cos_hotspot=jnp.asarray(rt.light_cos_hotspot),
            cos_falloff=jnp.asarray(rt.light_cos_falloff),
            enabled=node_vis[jnp.asarray(rt.light_node)] |
                    (jnp.asarray(rt.light_kind) == lighting_mod.DIRECTIONAL),
        )

        shadow_fn = None
        di = -1
        cascade_vps = depth_maps = None
        spot_maps = {}
        point_maps = {}
        if config.shadows and np.any(rt.light_kind == lighting_mod.DIRECTIONAL):
            di = int(np.nonzero(rt.light_kind == lighting_mod.DIRECTIONAL)[0][0])
            sdir = ldir[di]
            cascade_vps = shadows_mod.fit_cascades(
                view, rt.fov_y, aspect, rt.z_near,
                min(rt.z_far, 100.0), sdir, config.csm)
            depth_maps = shadows_mod.render_cascade_depths(
                tri_pos, cascade_vps, config.csm.map_size,
                tri_valid=tri_valid, chunk=config.chunk,
                use_pallas=config.use_pallas,
                k_per_tile=config.csm_k_per_tile or config.k_per_tile,
                pallas_interpret=config.pallas_interpret,
                tri_budget=config.cascade_tri_budget,
                bin_mode=config.bin_mode, edge_mode=config.edge_mode)
        if config.shadows and config.spot_shadows:
            for si in np.nonzero(rt.light_kind == lighting_mod.SPOT)[0]:
                si = int(si)
                svp = shadows_mod.spot_vp(lpos[si], ldir[si],
                                          jnp.asarray(rt.light_cos_falloff)[si],
                                          z_far=float(rt.light_radius[si])
                                          if rt.light_radius[si] > 0 else 100.0)
                smap = shadows_mod.render_map_depth(
                    tri_pos, svp, config.spot_shadow_size,
                    tri_valid=tri_valid, chunk=config.chunk,
                    use_pallas=config.use_pallas,
                    k_per_tile=config.k_per_tile,
                    pallas_interpret=config.pallas_interpret)
                spot_maps[si] = (svp, smap)
        if config.shadows and config.point_shadows:
            for pi in np.nonzero(rt.light_kind == lighting_mod.POINT)[0]:
                pi = int(pi)
                zf = float(rt.light_radius[pi]) if rt.light_radius[pi] > 0 else 100.0
                pvps, pmaps = shadows_mod.render_point_depths(
                    tri_pos, lpos[pi], config.point_shadow_size,
                    tri_valid=tri_valid, chunk=config.chunk, z_far=zf,
                    use_pallas=config.use_pallas,
                    k_per_tile=config.k_per_tile,
                    pallas_interpret=config.pallas_interpret)
                point_maps[pi] = (pvps, pmaps)
        if di >= 0 or spot_maps or point_maps:
            def shadow_fn(li_, world_pos):
                if li_ == di:
                    return shadows_mod.csm_visibility(
                        world_pos, view, cascade_vps, depth_maps,
                        min(rt.z_far, 100.0), config.csm)
                if li_ in spot_maps:
                    svp, smap = spot_maps[li_]
                    return shadows_mod.map_visibility(world_pos, svp, smap)
                if li_ in point_maps:
                    pvps, pmaps = point_maps[li_]
                    return shadows_mod.point_visibility(
                        world_pos, lpos[li_], pvps, pmaps)
                return None

        cam_pos = cam_g[:3, 3]
        color = lighting_mod.shade(gbuf, lights, cam_pos,
                                   ambient=config.ambient, shadow_fn=shadow_fn)
    else:
        color = gbuf.albedo * gbuf.mask[..., None]

    # ---- volumetric light shafts (light_volume.rs equivalent) ----
    if config.light_shafts and nl:
        from fyrox_tpu.render import volumetric as vol_mod
        for li in range(nl):
            lp4 = jnp.concatenate([lpos[li], jnp.ones(1)], 0)
            lclip = jnp.sum(vp * lp4[None, :], -1)
            color = vol_mod.light_shafts(
                color, gbuf.mask, lclip,
                jnp.asarray(rt.light_color)[li]
                * jnp.asarray(rt.light_intensity)[li] * 0.25)

    # ---- sky background (skybox.rs: cube faces sampled by view ray;
    # gradient fallback) ----
    if config.skybox is not None:
        from fyrox_tpu.render import skybox as skybox_mod
        color = skybox_mod.apply_skybox(color, gbuf.mask, config.skybox,
                                        cam_g, rt.fov_y, aspect)
    elif any(v > 0 for v in config.sky_zenith) or any(v > 0 for v in config.sky_horizon):
        ys = jnp.linspace(0.0, 1.0, config.height)[:, None, None]
        sky = (jnp.asarray(config.sky_zenith) * (1 - ys)
               + jnp.asarray(config.sky_horizon) * ys)
        color = jnp.where(gbuf.mask[..., None], color,
                          jnp.broadcast_to(sky, color.shape))

    # ---- forward/transparent pass (renderer/mod.rs:1066-1115) ----
    if has_transparent:
        from fyrox_tpu.render import transparent as transp_mod
        tri_t = rt.triangles[rt.tr_tri]                      # static numpy
        t_attrs = dict(albedo=jnp.asarray(rt.albedo)[jnp.asarray(tri_t)],
                       normal=wn[jnp.asarray(tri_t)],
                       position=wpos[jnp.asarray(tri_t)])
        t_valid = node_vis[jnp.asarray(rt.tri_node[rt.tr_tri])]
        color = transp_mod.composite_transparent(
            color, gbuf.depth, gbuf.mask,
            clip[jnp.asarray(tri_t)], t_attrs, jnp.asarray(rt.tr_alpha),
            config.height, config.width,
            lights=(lights if nl else None), cam_pos=cam_g[:3, 3],
            ambient=config.ambient, tri_valid=t_valid, chunk=config.chunk)
    return color, gbuf


def render_frame(scene_state, scene_template: SceneTemplate,
                 rt: RenderTemplate, config: RenderConfig = RenderConfig()):
    """Render every world: [W, H, Wd, 3] color + GBuffer batch."""
    fn = lambda g, v: _frame_one_world(g, v, rt, scene_template, config)
    return jax.vmap(fn)(scene_state.globals_, scene_state.global_visibility)


def render_frame_demand(scene_state, scene_template: SceneTemplate,
                        rt: RenderTemplate,
                        config: RenderConfig = RenderConfig()):
    """render_frame + per-pass bin-demand audit (Pallas path only).

    Returns (color [W,H,Wd,3], demand [W, n_passes] int32, caps
    [n_passes] static list). `demand[w, p]` is pass p's TRUE max
    per-tile triangle overlap in world w, BEFORE the k_per_tile clamp;
    `caps[p]` is the clamp that pass binned with. Any demand >= cap
    means the binned raster silently dropped triangles and the frame
    (and any timing of it) is invalid — benchmarks must check this
    (bench_render.py does). On the non-Pallas path there is no binning
    and demand comes back empty."""
    from fyrox_tpu.render import pallas_raster
    caps_out = []

    def fn(g, v):
        pallas_raster.demand_trace_start()
        try:
            color, _ = _frame_one_world(g, v, rt, scene_template, config)
        finally:
            trace = pallas_raster.demand_trace_stop()
        caps_out[:] = [k for _, k in trace]
        occ = (jnp.stack([m for m, _ in trace])
               if trace else jnp.zeros((0,), jnp.int32))
        return color, occ

    color, demand = jax.vmap(fn)(scene_state.globals_,
                                 scene_state.global_visibility)
    return color, demand, list(caps_out)


def render_frames_chunked(scene_state, scene_template: SceneTemplate,
                          rt: RenderTemplate,
                          config: RenderConfig = RenderConfig(),
                          world_chunk: int = 16):
    """render_frame with the world batch processed in lax.map groups of
    `world_chunk`: same output, bounded memory. The per-world binning /
    shadow temporaries scale linearly with the vmapped world count and
    OOM HBM near W=64 at 256²; chunking trades a little dispatch
    parallelism for a flat footprint. W must divide by world_chunk."""
    w = scene_state.globals_.shape[0]
    if w <= world_chunk:
        return render_frame(scene_state, scene_template, rt, config)
    assert w % world_chunk == 0, (w, world_chunk)
    g = w // world_chunk
    fn = lambda gl, v: _frame_one_world(gl, v, rt, scene_template, config)

    def group(args):
        gl, vis = args
        return jax.vmap(fn)(gl, vis)

    gl = scene_state.globals_.reshape((g, world_chunk)
                                      + scene_state.globals_.shape[1:])
    vis = scene_state.global_visibility.reshape(
        (g, world_chunk) + scene_state.global_visibility.shape[1:])
    color, gbuf = jax.lax.map(group, (gl, vis))
    unflat = lambda x: x.reshape((w,) + x.shape[2:])
    return unflat(color), jax.tree_util.tree_map(unflat, gbuf)
