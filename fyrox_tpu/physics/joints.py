"""Joint constraints, batched.

Equivalent of the reference's joint wrappers (fyrox-impl/src/scene/
joint.rs:775 over rapier's ImpulseJointSet: ball/revolute/prismatic/fixed).
Round-1 set: BALL (point-to-point), FIXED (point + full angular lock),
REVOLUTE (point + angular lock of the two off-axis directions), PRISMATIC
(slider: full angular lock + point constraint projected off the slide
axis).

Solved as velocity constraints with soft positional bias inside the same
TGS substep loop as contacts (solver.solve_tgs calls joint passes per
substep). Joint anchors are body-local; effective masses use the same
mass-splitting convention (each body's inverse mass scaled by its joint +
contact count would be ideal; joints are few, so a fixed split of 2 is
used per joint side).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import quat

__all__ = ["JointKind", "JointSet", "solve_joints_velocity", "joint_position_pass"]

BALL, FIXED, REVOLUTE, PRISMATIC = 0, 1, 2, 3


class JointKind:
    BALL, FIXED, REVOLUTE, PRISMATIC = BALL, FIXED, REVOLUTE, PRISMATIC


@dataclass
class JointSet:
    """Static joint table (host-built)."""
    kind: np.ndarray          # [J]
    body_a: np.ndarray        # [J]
    body_b: np.ndarray        # [J]
    anchor_a: np.ndarray      # [J,3] body-local
    anchor_b: np.ndarray      # [J,3]
    axis_a: np.ndarray        # [J,3] local hinge axis (revolute)
    # rapier joints store local reference frames (local_frame1/2): the
    # relative orientation a FIXED/REVOLUTE/PRISMATIC joint holds is the one
    # at creation time, not identity. ref_rot = qa0^-1 * qb0 (xyzw).
    ref_rot: np.ndarray = None  # [J,4]
    # COM offsets of the two bodies (body-local), so lever arms are measured
    # from the COM (impulses change COM velocity, not origin velocity).
    com_a: np.ndarray = None   # [J,3]
    com_b: np.ndarray = None   # [J,3]

    def __post_init__(self):
        j = self.kind.shape[0]
        if self.ref_rot is None:
            self.ref_rot = np.tile(np.array([0, 0, 0, 1], np.float32), (j, 1))
        if self.com_a is None:
            self.com_a = np.zeros((j, 3), np.float32)
        if self.com_b is None:
            self.com_b = np.zeros((j, 3), np.float32)

    @property
    def num_joints(self):
        return int(self.kind.shape[0])


class JointBuilder:
    def __init__(self):
        self._j = []

    def add(self, kind, body_a, body_b, anchor_a=(0, 0, 0), anchor_b=(0, 0, 0),
            axis=(0, 0, 1), ref_rot=(0, 0, 0, 1)):
        self._j.append((kind, body_a, body_b,
                        np.asarray(anchor_a, np.float32),
                        np.asarray(anchor_b, np.float32),
                        np.asarray(axis, np.float32),
                        np.asarray(ref_rot, np.float32)))
        return len(self._j) - 1

    def build(self, com_local=None) -> JointSet:
        """com_local: optional [B,3] body COM table to resolve per-joint
        COM offsets (lever arms are measured from the COM)."""
        j = self._j
        ba = np.asarray([x[1] for x in j], np.int32)
        bb = np.asarray([x[2] for x in j], np.int32)
        if com_local is not None and len(j):
            com_a = np.asarray(com_local, np.float32)[ba]
            com_b = np.asarray(com_local, np.float32)[bb]
        else:
            com_a = com_b = np.zeros((len(j), 3), np.float32)
        return JointSet(
            kind=np.asarray([x[0] for x in j], np.int32),
            body_a=ba,
            body_b=bb,
            anchor_a=np.stack([x[3] for x in j]) if j else np.zeros((0, 3), np.float32),
            anchor_b=np.stack([x[4] for x in j]) if j else np.zeros((0, 3), np.float32),
            axis_a=np.stack([x[5] for x in j]) if j else np.zeros((0, 3), np.float32),
            ref_rot=np.stack([x[6] for x in j]) if j else np.zeros((0, 4), np.float32),
            com_a=com_a,
            com_b=com_b,
        )


def _gather(arr, idx):
    return arr[:, idx]


def _scatter_add(arr, idx, val):
    return arr.at[:, idx].add(val, mode="drop")


def solve_joints_velocity(pos, rot, lv, av, inv_mass, ii_world, joints: JointSet,
                          h, erp=0.2):
    """One velocity pass over all joints (Jacobi). Returns (lv, av).

    Point constraint: relative anchor velocity → 0, with positional bias
    erp/h * C (anchor separation). Angular locks: relative angular velocity
    projected on the locked axes → 0 with orientation bias.
    """
    if joints.num_joints == 0:
        return lv, av
    ia = joints.body_a
    ib = joints.body_b
    qa = _gather(rot, ia)
    qb = _gather(rot, ib)
    # lever arms from the COM: anchor_world - com_world = R @ (anchor - com)
    ra = quat.rotate(qa, jnp.asarray(joints.anchor_a - joints.com_a)[None])
    rb = quat.rotate(qb, jnp.asarray(joints.anchor_b - joints.com_b)[None])
    pa = _gather(pos, ia) + quat.rotate(qa, jnp.asarray(joints.anchor_a)[None])
    pb = _gather(pos, ib) + quat.rotate(qb, jnp.asarray(joints.anchor_b)[None])

    im_a = _gather(inv_mass[..., None], ia)[..., 0]
    im_b = _gather(inv_mass[..., None], ib)[..., 0]
    ii_a = _gather(ii_world, ia)
    ii_b = _gather(ii_world, ib)

    # --- point-to-point: exact 3x3 effective-mass solve ---
    # K = (im_a+im_b) E + [ra]x I⁻¹_a [ra]xᵀ + [rb]x I⁻¹_b [rb]xᵀ
    def skew(v):
        z = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)

    va = _gather(lv, ia) + jnp.cross(_gather(av, ia), ra)
    vb = _gather(lv, ib) + jnp.cross(_gather(av, ib), rb)
    c = pb - pa                                            # positional error
    kinds_ = jnp.asarray(joints.kind)[None]
    axis_w0 = quat.rotate(qa, jnp.asarray(joints.axis_a)[None])
    is_prism = (kinds_ == PRISMATIC)[..., None]
    c = jnp.where(is_prism,
                  c - jnp.sum(c * axis_w0, -1, keepdims=True) * axis_w0, c)
    vel_err = vb - va + (erp / h) * c
    vel_err = jnp.where(
        is_prism,
        vel_err - jnp.sum(vel_err * axis_w0, -1, keepdims=True) * axis_w0,
        vel_err)
    eye = jnp.eye(3, dtype=lv.dtype)
    sa = skew(ra)
    sb = skew(rb)
    k_mat = ((im_a + im_b)[..., None, None] * eye
             + jnp.einsum("wjab,wjbc,wjdc->wjad", sa, ii_a, sa,
                          precision="highest")
             + jnp.einsum("wjab,wjbc,wjdc->wjad", sb, ii_b, sb,
                          precision="highest"))
    k_mat = k_mat + 1e-9 * eye
    imp = -jnp.linalg.solve(k_mat, vel_err[..., None])[..., 0]
    lv = _scatter_add(lv, ia, -imp * im_a[..., None])
    lv = _scatter_add(lv, ib, imp * im_b[..., None])
    av = _scatter_add(av, ia, jnp.einsum("wjik,wjk->wji", ii_a,
                                         jnp.cross(ra, -imp), precision="highest"))
    av = _scatter_add(av, ib, jnp.einsum("wjik,wjk->wji", ii_b,
                                         jnp.cross(rb, imp), precision="highest"))

    # --- angular locks ---
    kinds = jnp.asarray(joints.kind)[None]
    wa = _gather(av, ia)
    wb = _gather(av, ib)
    rel_w = wb - wa
    # orientation drift bias for FIXED: relative rotation log (small angle)
    # measured against the creation-time reference frame q_ref = qa0^-1 qb0
    # (rapier's local_frame1/2 semantics) — NOT against identity.
    q_rel = quat.mul(quat.conjugate(qa), qb)
    q_err = quat.mul(quat.conjugate(jnp.asarray(joints.ref_rot)[None]), q_rel)
    # q_err lives in A's local frame; the impulse is applied with world-frame
    # inertia, so rotate the small-angle error vector into world space.
    ang_err = quat.rotate(qa, 2.0 * q_err[..., :3] * jnp.sign(q_err[..., 3:4]))
    target = rel_w + (erp / h) * ang_err
    # revolute: remove the hinge-axis component (free DOF)
    axis_w = quat.rotate(qa, jnp.asarray(joints.axis_a)[None])
    t_rev = target - jnp.sum(target * axis_w, -1, keepdims=True) * axis_w
    ang_target = jnp.where(((kinds == FIXED) | (kinds == PRISMATIC))[..., None],
                  target,
                  jnp.where((kinds == REVOLUTE)[..., None], t_rev,
                            jnp.zeros_like(target)))
    k_ang_mat = ii_a + ii_b + 1e-9 * eye
    ang_imp = -jnp.linalg.solve(k_ang_mat, ang_target[..., None])[..., 0]
    av = _scatter_add(av, ia, jnp.einsum("wjik,wjk->wji", ii_a, -ang_imp,
                                         precision="highest"))
    av = _scatter_add(av, ib, jnp.einsum("wjik,wjk->wji", ii_b, ang_imp,
                                         precision="highest"))
    return lv, av


def joint_position_pass(pos, rot, inv_mass, joints: JointSet, erp=0.5):
    """NGS positional correction for anchor separation (translation only)."""
    if joints.num_joints == 0:
        return pos
    ia = joints.body_a
    ib = joints.body_b
    ra = quat.rotate(_gather(rot, ia), jnp.asarray(joints.anchor_a)[None])
    rb = quat.rotate(_gather(rot, ib), jnp.asarray(joints.anchor_b)[None])
    c = (_gather(pos, ib) + rb) - (_gather(pos, ia) + ra)
    axis_w = quat.rotate(_gather(rot, ia), jnp.asarray(joints.axis_a)[None])
    is_prism = (jnp.asarray(joints.kind)[None] == PRISMATIC)[..., None]
    c = jnp.where(is_prism,
                  c - jnp.sum(c * axis_w, -1, keepdims=True) * axis_w, c)
    im_a = _gather(inv_mass[..., None], ia)[..., 0][..., None]
    im_b = _gather(inv_mass[..., None], ib)[..., 0][..., None]
    denom = jnp.maximum(im_a + im_b, 1e-9)
    corr = erp * c
    pos = _scatter_add(pos, ia, corr * im_a / denom)
    pos = _scatter_add(pos, ib, -corr * im_b / denom)
    return pos
