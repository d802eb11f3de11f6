"""Scene templates: the static (host-side) half of a scene.

The reference stores scenes in a generational `Pool<Node>` with per-node
hierarchy links (fyrox-core/src/pool/mod.rs:69; fyrox-impl/src/scene/graph).
In the TPU rebuild a scene is split in two:

  * `SceneTemplate` — everything identical across the world batch and static
    under jit: topology (parent indices), node types, payload routing (which
    mesh/light/camera record a node refers to), depth-levelized index lists
    for the transform-propagation kernel, local bounding boxes.
  * `WorldState` (state.py) — everything that varies per world / per step:
    local transforms, visibility/enabled flags, lifetimes, physics state...

A template is built once with `SceneBuilder` (builder.py) or loaded from a
.rgs file (fyrox_tpu.io.rgs) and then compiled into padded numpy arrays.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

__all__ = ["NodeType", "SceneTemplate"]


class NodeType(enum.IntEnum):
    """Scene node kinds — payload tags mirroring the reference's
    `NodeTrait` impls (fyrox-impl/src/scene/node/mod.rs) plus 2D twins.
    A tag here means builder/payload routing exists; per-kind runtime
    behavior lives in its subsystem (render/, physics/, sound/scene.py,
    scene/particles.py, ...) — see PARITY.md for the behavior matrix."""
    PIVOT = 0
    CAMERA = 1
    MESH = 2
    SPRITE = 3
    POINT_LIGHT = 4
    SPOT_LIGHT = 5
    DIRECTIONAL_LIGHT = 6
    RIGID_BODY = 7
    COLLIDER = 8
    JOINT = 9
    ANIMATION_PLAYER = 10
    ABSM = 11
    PARTICLE_SYSTEM = 12
    SOUND = 13
    LISTENER = 14
    DECAL = 15
    TERRAIN = 16
    NAVMESH = 17
    RECTANGLE = 18          # dim2 sprite rect
    RIGID_BODY_2D = 19
    COLLIDER_2D = 20
    JOINT_2D = 21
    TILE_MAP = 22
    RAGDOLL = 23
    REFLECTION_PROBE = 24
    SKYBOX = 25


@dataclass
class SceneTemplate:
    """Static scene description shared by all worlds in a batch.

    All arrays are host numpy; the template is captured as a static closure
    by jitted step functions (its contents become compile-time constants or
    device constants, never traced shapes).
    """
    # hierarchy
    parent: np.ndarray                 # [N] int32, -1 for roots
    node_type: np.ndarray              # [N] int32 (NodeType)
    names: List[str]
    # depth-levelized topology for the propagation kernel:
    # levels[d] = int32 array of node indices at depth d (roots at d=0)
    levels: List[np.ndarray]
    depth: np.ndarray                  # [N] int32
    # payload routing: index into the per-type payload table, -1 if none
    payload: np.ndarray                # [N] int32
    # initial local transforms (copied into WorldState.init)
    init_position: np.ndarray          # [N,3] f32
    init_rotation: np.ndarray          # [N,4] f32 quat xyzw
    init_scale: np.ndarray             # [N,3] f32
    init_visibility: np.ndarray        # [N] bool
    init_enabled: np.ndarray           # [N] bool
    init_lifetime: np.ndarray          # [N] f32 (+inf = unlimited)
    # optional full-transform extras (pivots/offsets); None if unused anywhere
    init_pre_rotation: Optional[np.ndarray] = None    # [N,4]
    init_post_rotation: Optional[np.ndarray] = None   # [N,4]
    init_rotation_offset: Optional[np.ndarray] = None
    init_rotation_pivot: Optional[np.ndarray] = None
    init_scaling_offset: Optional[np.ndarray] = None
    init_scaling_pivot: Optional[np.ndarray] = None
    # per-node local-space bounding boxes (for culling); zero box if none
    local_bbox_min: Optional[np.ndarray] = None       # [N,3]
    local_bbox_max: Optional[np.ndarray] = None       # [N,3]
    # payload tables, filled by the builder
    cameras: dict = field(default_factory=dict)       # SoA dict of camera params
    lights: dict = field(default_factory=dict)        # SoA dict of light params
    meshes: list = field(default_factory=list)        # list of MeshData
    sprites: dict = field(default_factory=dict)       # SoA dict of sprite params
    decals: dict = field(default_factory=dict)        # SoA dict of decal params
    # sound sources + listeners (fyrox-impl/src/scene/sound/mod.rs,
    # listener.rs): per-source static params; positions come from node
    # globals each block (sound/scene.py glue)
    sounds: dict = field(default_factory=dict)        # SoA dict of source params
    listeners: dict = field(default_factory=dict)     # SoA dict (node)
    sound_buffers: list = field(default_factory=list)  # list of mono f32 arrays
    # Rectangle 2D nodes (dim2/rectangle.rs): colored/textured unit quad
    # in the node's local XY plane, routed through the render pipeline
    rectangles: dict = field(default_factory=dict)    # SoA (node,color,uv_rect,texture)
    rect_textures: list = field(default_factory=list)
    # NavigationalMesh nodes (scene/navmesh.rs:81): per-node navmesh
    # geometry; pathfinding/steering in utils/navmesh.py + utils/navagent.py
    navmeshes: dict = field(default_factory=dict)     # SoA (node, data index)
    navmesh_data: list = field(default_factory=list)  # list of (verts, tris)
    # physics template (fyrox_tpu.physics), animation template, etc. are
    # attached by their subsystem builders:
    extras: dict = field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return int(self.parent.shape[0])

    @property
    def max_depth(self) -> int:
        return len(self.levels)

    def children_of(self, idx: int) -> np.ndarray:
        return np.nonzero(self.parent == idx)[0]

    def find_by_name(self, name: str) -> int:
        return self.names.index(name)

    def doubling_pointers(self):
        """Pointer-doubling ancestor tables for the propagation kernel.

        Returns a list of int32 arrays p_r of shape [N+1]: p_r[i] is node
        i's ancestor at distance 2^r, with the virtual identity slot N used
        once the chain is exhausted (p_r[N] == N). Cached on first use.
        """
        if getattr(self, "_doubling", None) is None:
            n = self.num_nodes
            ident = n
            p = np.where(self.parent >= 0, self.parent, ident).astype(np.int32)
            p = np.append(p, ident).astype(np.int32)
            rounds = max(int(np.ceil(np.log2(max(self.max_depth, 1) + 1))), 1)
            tables = []
            for _ in range(rounds):
                tables.append(p.copy())
                p = p[p]
            self._doubling = tables
        return self._doubling

    def validate(self):
        """Integrity check (Graph::restore_integrity equivalent, tested at
        scene/graph/mod.rs:2504): verifies parent indices, acyclicity,
        payload-table bounds. Returns a list of problem strings (empty =
        healthy); callers may Log and continue per the reference's
        log-and-continue philosophy."""
        problems = []
        n = self.num_nodes
        if (self.parent >= n).any():
            problems.append("parent index out of range")
        else:
            try:
                SceneTemplate.compute_levels(self.parent)
            except ValueError:
                problems.append("cycle in hierarchy")
        for table, name, kinds in ((self.cameras, "camera", (NodeType.CAMERA,)),
                                   (self.lights, "light",
                                    (NodeType.POINT_LIGHT, NodeType.SPOT_LIGHT,
                                     NodeType.DIRECTIONAL_LIGHT))):
            for node in table.get("node", []):
                if not (0 <= node < n):
                    problems.append(f"{name} payload points at missing node {node}")
                elif self.node_type[node] not in [int(k) for k in kinds]:
                    problems.append(f"{name} payload on non-{name} node {node}")
        for i in range(n):
            if self.node_type[i] == NodeType.MESH:
                if not (0 <= self.payload[i] < len(self.meshes)):
                    problems.append(f"mesh node {i} payload out of range")
        return problems

    @staticmethod
    def compute_levels(parent: np.ndarray):
        """Group node indices by hierarchy depth (host-side, build time).

        Replaces the reference's recursive `update_global_transform_recursively`
        (graph/mod.rs:1199) with data the batched kernel can consume: one
        gather+compose per depth level.
        """
        n = parent.shape[0]
        depth = np.zeros(n, np.int32)
        for i in range(n):
            d, p = 0, parent[i]
            while p >= 0:
                d += 1
                p = parent[p]
                if d > n:
                    raise ValueError("cycle in scene hierarchy")
            depth[i] = d
        levels = [np.nonzero(depth == d)[0].astype(np.int32)
                  for d in range(int(depth.max()) + 1 if n else 0)]
        return levels, depth
