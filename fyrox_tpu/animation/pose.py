"""Animation poses: per-node bound values + blending + application.

Equivalent of fyrox-animation/src/pose.rs and the scene-side apply glue
(fyrox-impl/src/scene/animation/mod.rs:117 `AnimationPoseExt::apply`).

A pose here is dense: arrays [W, A, N, ·] of candidate local transform values
per animation clip, plus static masks [A, N] saying which clip animates which
node/binding. Consumers either
  * overwrite-apply them in clip order (AnimationPlayer semantics — each
    enabled animation's pose is applied on top, so the last enabled clip
    with a track wins), or
  * weighted-blend them (ABSM semantics: lerp for vectors, nlerp for
    rotations, per TrackValue::blend_with in value.rs).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import quat
from fyrox_tpu.animation.track import AnimationSet

__all__ = ["PoseSet", "build_poses", "apply_overwrite", "select_anim_pose",
           "blend_pose", "apply_pose"]


class PoseSet(NamedTuple):
    """Dense candidate poses per clip.

    position/scale: [W, A, N, 3]; rotation: [W, A, N, 4].
    *_mask: [A, N] static — clip a animates node n's binding.
    """
    position: jnp.ndarray
    rotation: jnp.ndarray
    scale: jnp.ndarray
    pos_mask: jnp.ndarray
    rot_mask: jnp.ndarray
    scl_mask: jnp.ndarray


def _dense_masks(aset: AnimationSet, n_nodes: int):
    a = aset.num_animations

    def mk(nodes, anims):
        m = np.zeros((a, n_nodes), bool)
        if nodes is not None and nodes.size:
            m[anims, nodes] = True
        return m

    return (mk(aset.pos_node, aset.pos_anim),
            mk(aset.rot_node, aset.rot_anim),
            mk(aset.scl_node, aset.scl_anim))


def build_poses(aset: AnimationSet, sampled: dict, n_nodes: int) -> PoseSet:
    """Scatter sampled track values into dense [W, A, N, ·] pose arrays."""
    # infer W from any sampled binding
    any_vals = next(iter(sampled.values()))[2]
    w = any_vals.shape[0]
    a = aset.num_animations
    pos = jnp.zeros((w, a, n_nodes, 3), jnp.float32)
    rot = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1], jnp.float32),
                           (w, a, n_nodes, 4))
    scl = jnp.ones((w, a, n_nodes, 3), jnp.float32)
    if "position" in sampled:
        nodes, anims, vals = sampled["position"]
        pos = pos.at[:, anims, nodes].set(vals)
    if "rotation" in sampled:
        nodes, anims, vals = sampled["rotation"]
        rot = rot.at[:, anims, nodes].set(vals)
    if "scale" in sampled:
        nodes, anims, vals = sampled["scale"]
        scl = scl.at[:, anims, nodes].set(vals)
    pm, rm, sm = _dense_masks(aset, n_nodes)
    return PoseSet(pos, rot, scl, jnp.asarray(pm), jnp.asarray(rm), jnp.asarray(sm))


def apply_overwrite(poses: PoseSet, enabled, position, rotation, scale):
    """AnimationPlayer application: enabled clips apply their pose in clip
    order, later clips overwriting earlier ones per node/binding
    (AnimationContainer::update + AnimationPoseExt::apply).

    enabled: [W, A] bool. position/rotation/scale: current local transforms
    [W, N, ·]; returns updated copies.
    """
    a = poses.position.shape[1]
    prio = jnp.arange(1, a + 1, dtype=jnp.int32)[None, :, None]  # [1,A,1]

    def overwrite(vals, mask, cur):
        p = jnp.where(enabled[..., None] & mask[None], prio, 0)  # [W,A,N]
        win = jnp.argmax(p, axis=1)                              # [W,N] winning clip
        has = jnp.max(p, axis=1) > 0                             # [W,N]
        # one-hot contraction over the (small) clip axis — tiny-axis
        # take_along_axis gathers are slow on TPU (see core/curve.py)
        oh = (win[:, None] == jnp.arange(vals.shape[1])[None, :, None])
        chosen = jnp.einsum("wan,wand->wnd", oh.astype(vals.dtype), vals)
        return jnp.where(has[..., None], chosen, cur)

    return (overwrite(poses.position, poses.pos_mask, position),
            overwrite(poses.rotation, poses.rot_mask, rotation),
            overwrite(poses.scale, poses.scl_mask, scale))


def select_anim_pose(poses: PoseSet, anim_idx):
    """Gather one clip's pose per world: anim_idx [W] → ([W,N,3],[W,N,4],[W,N,3],
    masks [W,N] ×3)."""
    # one-hot contraction over the clip axis (not take_along_axis: slow)
    def sel(vals):
        oh = (anim_idx[:, None] == jnp.arange(vals.shape[1])).astype(vals.dtype)
        return jnp.einsum("wa,wand->wnd", oh, vals)

    def selm(mask):
        return mask[anim_idx]  # [W,N]

    return (sel(poses.position), sel(poses.rotation), sel(poses.scale),
            selm(poses.pos_mask), selm(poses.rot_mask), selm(poses.scl_mask))


def blend_pose(pa, pb, weight):
    """NodePose::blend_with (pose.rs:41): lerp positions/scales, nlerp
    rotations. pa/pb are (pos, rot, scl, pm, rm, sm) tuples; weight [W] or
    scalar is the weight of pb. Where only one pose has a value, that value
    is taken (pose.rs:44-46)."""
    (ap, ar, asl, apm, arm, asm_) = pa
    (bp, br, bsl, bpm, brm, bsm) = pb
    w = jnp.asarray(weight)
    while w.ndim < ap.ndim - 1:
        w = w[..., None]

    def mix(a, b, am, bm, is_rot=False):
        both = (am & bm)[..., None]
        only_a = (am & ~bm)[..., None]
        blended = quat.nlerp(a, b, w[..., None]) if is_rot else a + (b - a) * w[..., None]
        return jnp.where(both, blended, jnp.where(only_a, a, b))

    return (mix(ap, bp, apm, bpm), mix(ar, br, arm, brm, True),
            mix(asl, bsl, asm_, bsm), apm | bpm, arm | brm, asm_ | bsm)


def apply_pose(pose, position, rotation, scale):
    """Write a pose's values into local transforms where masked
    (BoundValueCollection::apply, scene/animation/mod.rs:148)."""
    (pp, pr, ps, pm, rm, sm) = pose
    return (jnp.where(pm[..., None], pp, position),
            jnp.where(rm[..., None], pr, rotation),
            jnp.where(sm[..., None], ps, scale))
