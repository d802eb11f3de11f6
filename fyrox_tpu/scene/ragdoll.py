"""Ragdoll: physics capsules + joints mapped onto skeleton bones.

Equivalent of the reference's `Ragdoll` node (fyrox-impl/src/scene/
ragdoll.rs:94): each limb owns a rigid body (capsule) bound to a bone;
when the ragdoll is ACTIVE the bodies drive the bones (the engine's
standard body→node sync does this — limb bodies carry `node=bone`), and
when INACTIVE the animated bones drive the bodies kinematically.

TPU-first mapping: the reference toggles rapier body types at runtime;
body type is template-static here, so activity is a per-world mask —
`drive_kinematic` overwrites inactive worlds' limb body states from the
animated bone globals each step (a masked where(), no recompile).

Typical use::

    rb = RagdollBuilder(pb)
    spine = rb.add_limb(bone_nodes[0], head=(0,1,0), tail=(0,1.5,0))
    arm   = rb.add_limb(bone_nodes[5], head=(0,1.5,0), tail=(0.5,1.5,0),
                        parent=spine)
    rd = rb.build()
    ...
    phys = drive_kinematic(phys, scene, rd, active=active_mask)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import quat

__all__ = ["RagdollTemplate", "RagdollBuilder", "drive_kinematic"]


class RagdollTemplate(NamedTuple):
    bodies: np.ndarray        # [L] physics body index per limb
    bones: np.ndarray         # [L] scene node index per limb
    # bind-pose offset of the body frame relative to the bone's global
    # frame (body = bone_global ∘ offset) so kinematic drive reproduces
    # the builder's capsule placement for any animated pose
    off_pos: np.ndarray       # [L,3]
    off_rot: np.ndarray       # [L,4]


def _quat_between(a, b):
    """Unit quat rotating direction a → b (host side)."""
    a = a / max(np.linalg.norm(a), 1e-9)
    b = b / max(np.linalg.norm(b), 1e-9)
    c = np.cross(a, b)
    d = float(np.dot(a, b))
    if d < -1.0 + 1e-8:                       # opposite: 180° about any ⊥
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, [0.0, 0.0, 1.0])
        axis /= np.linalg.norm(axis)
        return np.asarray([axis[0], axis[1], axis[2], 0.0], np.float32)
    s = np.sqrt((1.0 + d) * 2.0)
    q = np.asarray([c[0] / s, c[1] / s, c[2] / s, s * 0.5], np.float32)
    return q / np.linalg.norm(q)


class RagdollBuilder:
    """Assembles capsule bodies + ball joints over an existing skeleton.

    `pb`: the scene's PhysicsBuilder. Limb capsules span head→tail in
    bind-pose world space (capsule local +Y along the limb,
    scene/collider.rs capsule convention); consecutive limbs connect with
    a ball joint at the shared head point (ragdoll.rs joint wiring).
    """

    def __init__(self, pb, bone_bind_globals=None):
        self.pb = pb
        self._limbs = []
        self._bind = bone_bind_globals   # optional {node: (pos3)} lookup

    def add_limb(self, bone_node, head, tail, radius=0.08, parent=None,
                 density=1.0, friction=0.6, joint="ball",
                 bind_pos=None, bind_rot=None) -> int:
        """head/tail: bind-pose WORLD endpoints of the limb. parent: limb
        index to connect to with a joint at `head`. bind_pos/bind_rot:
        the bone's bind-pose global (defaults: head point / identity) for
        the body↔bone offset bookkeeping."""
        from fyrox_tpu.physics import CAPSULE, joints as joints_mod
        head = np.asarray(head, np.float32)
        tail = np.asarray(tail, np.float32)
        seg = tail - head
        length = float(np.linalg.norm(seg))
        hh = max(length * 0.5 - radius, 0.01)
        mid = 0.5 * (head + tail)
        rot = _quat_between(np.asarray([0.0, 1.0, 0.0]), seg)
        body = self.pb.add_body(node=bone_node, position=mid, rotation=rot)
        self.pb.add_collider(body, CAPSULE, [hh, radius], density=density,
                             friction=friction)
        if parent is not None:
            pb_body = self._limbs[parent]["body"]
            # joint anchors: the shared head point in each body's local frame
            p_mid = self._limbs[parent]["mid"]
            p_rot = self._limbs[parent]["rot"]
            a_par = _rot_inv_apply(p_rot, head - p_mid)
            a_own = _rot_inv_apply(rot, head - mid)
            kind = {"ball": joints_mod.JointKind.BALL,
                    "fixed": joints_mod.JointKind.FIXED,
                    "revolute": joints_mod.JointKind.REVOLUTE}[joint]
            self.pb.add_joint(kind, pb_body, body, anchor_a=a_par,
                              anchor_b=a_own)
        bp = np.asarray(bind_pos if bind_pos is not None else head, np.float32)
        br = np.asarray(bind_rot if bind_rot is not None
                        else [0, 0, 0, 1], np.float32)
        self._limbs.append(dict(body=body, bone=bone_node, mid=mid, rot=rot,
                                bind_pos=bp, bind_rot=br))
        return len(self._limbs) - 1

    def build(self) -> RagdollTemplate:
        l = self._limbs
        off_pos = np.zeros((len(l), 3), np.float32)
        off_rot = np.zeros((len(l), 4), np.float32)
        for i, limb in enumerate(l):
            # body = bone_global ∘ offset ⇒ offset = bind⁻¹ ∘ body_bind
            inv_r = limb["bind_rot"] * np.asarray([-1, -1, -1, 1], np.float32)
            off_pos[i] = _rot_apply(inv_r, limb["mid"] - limb["bind_pos"])
            off_rot[i] = np.asarray(
                quat.mul(jnp.asarray(inv_r), jnp.asarray(limb["rot"])))
        return RagdollTemplate(
            bodies=np.asarray([x["body"] for x in l], np.int32),
            bones=np.asarray([x["bone"] for x in l], np.int32),
            off_pos=off_pos, off_rot=off_rot)


def _rot_apply(q, v):
    return np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))


def _rot_inv_apply(q, v):
    qi = np.asarray(q, np.float32) * np.asarray([-1, -1, -1, 1], np.float32)
    return _rot_apply(qi, v)


def drive_kinematic(phys_state, scene_state, rd: RagdollTemplate, active):
    """For worlds where `active` is False, overwrite limb body states from
    the animated bone globals (ragdoll.rs kinematic mode). active: [W]
    bool. Returns the updated PhysicsState."""
    from fyrox_tpu.core import transform as tfm
    g = scene_state.globals_[:, rd.bones]                    # [W,L,4,4]
    bpos, brot, _ = tfm.decompose_mat4(g)
    pos = bpos + quat.rotate(brot, jnp.broadcast_to(
        jnp.asarray(rd.off_pos)[None], bpos.shape))
    rot = quat.mul(brot, jnp.broadcast_to(
        jnp.asarray(rd.off_rot)[None], brot.shape))
    drive = (~jnp.asarray(active))[:, None, None]
    bidx = jnp.asarray(rd.bodies)
    new_pos = jnp.where(drive, pos, phys_state.position[:, bidx])
    new_rot = jnp.where(drive, rot, phys_state.rotation[:, bidx])
    zero = jnp.zeros_like(pos)
    new_lv = jnp.where(drive, zero, phys_state.linvel[:, bidx])
    new_av = jnp.where(drive, zero, phys_state.angvel[:, bidx])
    return phys_state._replace(
        position=phys_state.position.at[:, bidx].set(new_pos),
        rotation=phys_state.rotation.at[:, bidx].set(new_rot),
        linvel=phys_state.linvel.at[:, bidx].set(new_lv),
        angvel=phys_state.angvel.at[:, bidx].set(new_av))
