"""Animation clips + packed tracks.

Equivalent of fyrox-animation/src/{lib,track,container}.rs. An
`AnimationSet` packs every track of every clip into component-wise padded
CurveSets so the whole set samples in a handful of vectorized gathers:

  * position / scale tracks: 3 curves each (TrackValueKind::Vector3)
  * rotation tracks: 3 Euler curves each (TrackValueKind::UnitQuaternionEuler,
    container.rs:58) converted via quat_from_euler XYZ = qz*qy*qx
    (fyrox-math/src/lib.rs:733)

Per-clip playback state (time position, speed, looping) matches
Animation::tick semantics (fyrox-animation/src/lib.rs:471): the pose is
sampled at the *current* time, then time advances by dt*speed and wraps into
the clip's time slice when looping (set_time_position, lib.rs:432-437).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import curve as curve_mod
from fyrox_tpu.core import quat

__all__ = ["AnimationSet", "AnimationSetBuilder", "AnimationState",
           "init_animation_state", "tick_times", "sample_tracks"]

BIND_POSITION, BIND_ROTATION, BIND_SCALE = 0, 1, 2


@dataclass
class AnimationSet:
    """Static (host-side) packed animation data for one scene template."""
    # per-clip
    length: np.ndarray          # [A] f32 (time_slice end; slice start == 0)
    speed: np.ndarray           # [A] f32
    looping: np.ndarray         # [A] bool
    names: List[str] = field(default_factory=list)
    # per-track (component-packed): 3 curve rows per track
    pos_curves: Optional[curve_mod.CurveSet] = None   # rows = 3*Tp (x,y,z interleaved by track)
    pos_node: np.ndarray = None      # [Tp] target node index
    pos_anim: np.ndarray = None      # [Tp] owning clip
    rot_curves: Optional[curve_mod.CurveSet] = None   # rows = 3*Tr euler XYZ
    rot_node: np.ndarray = None
    rot_anim: np.ndarray = None
    scl_curves: Optional[curve_mod.CurveSet] = None
    scl_node: np.ndarray = None
    scl_anim: np.ndarray = None

    @property
    def num_animations(self):
        return int(self.length.shape[0])


class AnimationSetBuilder:
    """Host-side builder: add clips, add tracks with keyframes, pack."""

    def __init__(self):
        self._clips = []

    def add_clip(self, name="clip", length=1.0, speed=1.0, looping=True) -> int:
        self._clips.append(dict(name=name, length=float(length), speed=float(speed),
                                looping=bool(looping), pos=[], rot=[], scl=[]))
        return len(self._clips) - 1

    def add_position_track(self, clip: int, node: int, keys_xyz):
        """keys_xyz: list of 3 key-lists (see core.curve.pack_curves)."""
        self._clips[clip]["pos"].append((node, keys_xyz))

    def add_rotation_track(self, clip: int, node: int, keys_euler_xyz):
        self._clips[clip]["rot"].append((node, keys_euler_xyz))

    def add_scale_track(self, clip: int, node: int, keys_xyz):
        self._clips[clip]["scl"].append((node, keys_xyz))

    def build(self) -> AnimationSet:
        def pack(kind):
            nodes, anims, curves = [], [], []
            for a, clip in enumerate(self._clips):
                for node, keys3 in clip[kind]:
                    nodes.append(node)
                    anims.append(a)
                    assert len(keys3) == 3
                    curves.extend(keys3)
            if not nodes:
                return None, np.zeros(0, np.int32), np.zeros(0, np.int32)
            return (curve_mod.pack_curves(curves),
                    np.asarray(nodes, np.int32), np.asarray(anims, np.int32))

        pc, pn, pa = pack("pos")
        rc, rn, ra = pack("rot")
        sc, sn, sa = pack("scl")
        return AnimationSet(
            length=np.asarray([c["length"] for c in self._clips], np.float32),
            speed=np.asarray([c["speed"] for c in self._clips], np.float32),
            looping=np.asarray([c["looping"] for c in self._clips], bool),
            names=[c["name"] for c in self._clips],
            pos_curves=pc, pos_node=pn, pos_anim=pa,
            rot_curves=rc, rot_node=rn, rot_anim=ra,
            scl_curves=sc, scl_node=sn, scl_anim=sa,
        )


class AnimationState(NamedTuple):
    """Per-world playback state [W, A]."""
    time: jnp.ndarray      # [W,A] f32 — Animation::time_position
    enabled: jnp.ndarray   # [W,A] bool — Animation::enabled


def init_animation_state(aset: AnimationSet, num_worlds: int,
                         enabled: Optional[np.ndarray] = None) -> AnimationState:
    a = aset.num_animations
    en = np.ones(a, bool) if enabled is None else np.asarray(enabled, bool)
    return AnimationState(
        time=jnp.zeros((num_worlds, a), jnp.float32),
        enabled=jnp.broadcast_to(jnp.asarray(en), (num_worlds, a)),
    )


def _wrapf(t, start, end):
    """wrapf (fyrox-math lib.rs): wrap t into [start, end)."""
    span = jnp.maximum(end - start, 1e-12)
    return start + jnp.mod(t - start, span)


def tick_times(aset: AnimationSet, anim: AnimationState, dt) -> AnimationState:
    """Advance playback clocks (Animation::tick time handling, lib.rs:471-493)."""
    speed = jnp.asarray(aset.speed)[None]
    length = jnp.asarray(aset.length)[None]
    looping = jnp.asarray(aset.looping)[None]
    new_t = anim.time + dt * speed * anim.enabled.astype(anim.time.dtype)
    wrapped = jnp.where(looping, _wrapf(new_t, 0.0, length),
                        jnp.clip(new_t, 0.0, length))
    return anim._replace(time=wrapped)


def sample_tracks(aset: AnimationSet, anim: AnimationState):
    """Sample every track of every clip at its clip's current time.

    Returns a dict with, per binding kind, (node_idx [T], anim_idx [T],
    values [W,T,3 or 4]). Rotation eulers are converted to quaternions here.
    """
    out = {}
    if aset.pos_curves is not None and aset.pos_node.size:
        t = anim.time[:, aset.pos_anim]                  # [W,Tp]
        t3 = jnp.repeat(t, 3, axis=-1)                    # rows are x,y,z interleaved
        v = curve_mod.sample(aset.pos_curves, t3)         # [W,3*Tp]
        out["position"] = (aset.pos_node, aset.pos_anim,
                           v.reshape(v.shape[0], -1, 3))
    if aset.rot_curves is not None and aset.rot_node.size:
        t = anim.time[:, aset.rot_anim]
        t3 = jnp.repeat(t, 3, axis=-1)
        e = curve_mod.sample(aset.rot_curves, t3).reshape(t.shape[0], -1, 3)
        # quat_from_euler XYZ == qz * qy * qx == from_euler(roll=x,pitch=y,yaw=z)
        q = quat.from_euler(e[..., 0], e[..., 1], e[..., 2])
        out["rotation"] = (aset.rot_node, aset.rot_anim, q)
    if aset.scl_curves is not None and aset.scl_node.size:
        t = anim.time[:, aset.scl_anim]
        t3 = jnp.repeat(t, 3, axis=-1)
        v = curve_mod.sample(aset.scl_curves, t3)
        out["scale"] = (aset.scl_node, aset.scl_anim,
                        v.reshape(v.shape[0], -1, 3))
    return out
