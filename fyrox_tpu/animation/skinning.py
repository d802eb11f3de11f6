"""Skeletal skinning, batched over worlds.

Equivalent of the reference's render-time skinning: per-bone matrices
`bone.global_transform() * bone.inv_bind_pose_transform()`
(fyrox-impl/src/scene/mesh/mod.rs:781-792) and 4-bone weighted vertex
skinning in the vertex shader (BoneIndices u8x4 + BoneWeight f32x4,
mesh/mod.rs:509-519).

Two equivalent kernels:
  * `skin_positions_gather` — classic per-vertex gather of 4 bone matrices.
  * `skin_positions_dense`  — TPU-idiomatic: the sparse [V,4] weights become
    a static dense [V,B] matrix, and skinning is one big MXU matmul
    [V,B] @ [W,B,12] → [W,V,12] (blended affines), then an elementwise
    apply. For B≈100 bones this is the speed-of-light formulation: the MXU
    does V·B·12 MACs/world and the weights matrix is reused across worlds.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

__all__ = ["SkinTemplate", "bone_matrices", "skin_positions_gather",
           "skin_positions_dense"]


@dataclass
class SkinTemplate:
    bones: np.ndarray         # [B] scene node index of each bone
    inv_bind: np.ndarray      # [B,4,4] f32 inverse bind-pose matrices
    vertices: np.ndarray      # [V,3] f32 bind-pose positions
    bone_indices: np.ndarray  # [V,4] int32
    bone_weights: np.ndarray  # [V,4] f32 (normalized)

    _dense_weights: np.ndarray = None  # [V,B] cached

    @property
    def num_bones(self):
        return int(self.bones.shape[0])

    @property
    def num_vertices(self):
        return int(self.vertices.shape[0])

    def dense_weights(self) -> np.ndarray:
        if self._dense_weights is None:
            v, b = self.num_vertices, self.num_bones
            dw = np.zeros((v, b), np.float32)
            rows = np.repeat(np.arange(v), 4)
            # np.add.at: duplicate (vertex, bone) pairs must accumulate
            np.add.at(dw, (rows, self.bone_indices.reshape(-1)),
                      self.bone_weights.reshape(-1))
            self._dense_weights = dw
        return self._dense_weights


def apply_blend_shapes(vertices, shape_deltas, weights):
    """Morph targets (the reference's blend shapes, mesh/mod.rs:357-360:
    per-shape weights mixed into base vertices before skinning).

    vertices [V,3] base; shape_deltas [S,V,3]; weights [W,S] in [0,100]
    (the reference uses percentage weights). Returns [W,V,3] — one MXU
    matmul over the shape axis.
    """
    w = jnp.asarray(weights) / 100.0
    deltas = jnp.asarray(shape_deltas).reshape(shape_deltas.shape[0], -1)
    morphed = jnp.einsum("ws,sv->wv", w, deltas, precision="highest")
    return jnp.asarray(vertices)[None] + morphed.reshape(
        w.shape[0], -1, 3)


def bone_matrices(globals_, skin: SkinTemplate):
    """[W,B,4,4] skinning matrices = bone_global @ inv_bind
    (mesh/mod.rs:781-792)."""
    bg = globals_[:, jnp.asarray(skin.bones)]
    ib = jnp.asarray(skin.inv_bind)[None]
    ibb = jnp.broadcast_to(ib, bg.shape)
    return jnp.sum(bg[..., :, :, None] * ibb[..., None, :, :], -2)


def skin_positions_gather(bone_mats, skin: SkinTemplate):
    """Per-vertex gather path: v' = Σ_k w_k (M[i_k] @ v).  [W,V,3]"""
    idx = jnp.asarray(skin.bone_indices)          # [V,4]
    wts = jnp.asarray(skin.bone_weights)          # [V,4]
    verts = jnp.asarray(skin.vertices)            # [V,3]
    m = bone_mats[:, idx]                         # [W,V,4,4,4]
    blended = jnp.sum(m * wts[None, :, :, None, None], axis=2)  # [W,V,4,4]
    return (jnp.sum(blended[..., :3, :3] * verts[None, :, None, :], -1)
            + blended[..., :3, 3])


def skin_positions_dense(bone_mats, skin: SkinTemplate, precision="highest"):
    """MXU path: dense weights matmul. [W,V,3]

    bf16-safe: pass precision="default" to let the MXU run at full speed
    when skinning for rendering (visual tolerance), keep "highest" for
    physics-coupled uses.
    """
    w = bone_mats.shape[0]
    affine = bone_mats[:, :, :3, :].reshape(w, -1, 12)      # [W,B,12]
    dw = jnp.asarray(skin.dense_weights())                   # [V,B]
    blended = jnp.einsum("vb,wbc->wvc", dw, affine, precision=precision)
    blended = blended.reshape(w, -1, 3, 4)                   # [W,V,3,4] affine rows
    lin = blended[..., :3]
    trans = blended[..., 3]
    verts = jnp.asarray(skin.vertices)
    return jnp.sum(lin * verts[None, :, None, :], -1) + trans
