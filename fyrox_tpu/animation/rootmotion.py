"""Root motion extraction, batched.

Equivalent of fyrox-animation/src/lib.rs:307 (`RootMotionSettings`),
:325 (`RootMotion`) and `Animation::update_root_motion` (lib.rs:498): the
root bone's animated translation/rotation is removed from the pose (the
root is pinned to its cycle-start value) and exported as a per-tick delta
that gameplay code applies to the character's rigid body instead — so the
capsule moves exactly as the artist animated.

Matching the reference's ordering: poses are sampled at the *pre-advance*
time (Animation::tick, lib.rs:471 calls update_pose before advancing the
clock), so `extract_root_motion` takes the clip times before and after
`tick_times` and the `sampled` dict from that same frame. Loop wrap
handling follows lib.rs:541-556: on the frame whose advance wrapped, the
leftover motion from the sampled pose to the cycle end is stashed as a
remainder and consumed on the next frame, so no motion is lost or doubled
across the seam.

TPU design notes: the cycle start/end pose fetches
(`fetch_position_at_time(tracks, cycle_start_time)`, lib.rs:505) happen at
*fixed* times, so they are precomputed at build time into host constants —
the jitted step does only gathers, quaternion algebra and `where` masks,
all [W, A]-batched.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.core import curve as curve_mod
from fyrox_tpu.core import quat
from fyrox_tpu.animation.track import AnimationSet

__all__ = ["RootMotionSettings", "RootMotionData", "RootMotionState",
           "build_root_motion", "init_root_motion_state",
           "extract_root_motion", "blend_root_motion"]


@dataclass
class RootMotionSettings:
    """RootMotionSettings (lib.rs:307): which node is the motion root and
    which channels to leave on the pose instead of extracting."""
    node: int
    ignore_x: bool = False
    ignore_y: bool = True    # usual setup: vertical bob stays on the pose
    ignore_z: bool = False
    ignore_rotations: bool = True


@dataclass
class RootMotionData:
    """Host-side precompute for one AnimationSet + settings."""
    settings: RootMotionSettings
    pos_track: np.ndarray       # [A] int32 index into aset position tracks, -1 = none
    rot_track: np.ndarray       # [A] int32
    pos_cycle_start: np.ndarray  # [A,3] root position at the cycle start time
    pos_cycle_end: np.ndarray    # [A,3]  (start/end swapped for speed<0, lib.rs:546)
    rot_cycle_start: np.ndarray  # [A,4]
    rot_cycle_end: np.ndarray    # [A,4]
    pos_slice_start: np.ndarray  # [A,3] value at time_slice.start — pose pin value
    rot_slice_start: np.ndarray  # [A,4]


class RootMotionState(NamedTuple):
    """Per-world, per-clip running state (RootMotion, lib.rs:325)."""
    prev_position: jnp.ndarray   # [W,A,3]
    pos_remainder: jnp.ndarray   # [W,A,3] — zero except the frame after a wrap
    prev_rotation: jnp.ndarray   # [W,A,4]
    rot_remainder: jnp.ndarray   # [W,A,4] — identity except after a wrap


def _track_value_at(curves, track_idx: int, t: float) -> np.ndarray:
    """Sample one packed 3-component track at a host-known time."""
    rows = np.asarray([3 * track_idx, 3 * track_idx + 1, 3 * track_idx + 2])
    tt = jnp.full((curves.times.shape[0],), np.float32(t))
    v = np.asarray(curve_mod.sample(curves, tt))
    return v[rows]


def build_root_motion(aset: AnimationSet, settings: RootMotionSettings) -> RootMotionData:
    a = aset.num_animations
    pos_track = np.full(a, -1, np.int32)
    rot_track = np.full(a, -1, np.int32)
    if aset.pos_node is not None:
        for i in range(aset.pos_node.shape[0]):
            if aset.pos_node[i] == settings.node and pos_track[aset.pos_anim[i]] < 0:
                pos_track[aset.pos_anim[i]] = i
    if aset.rot_node is not None:
        for i in range(aset.rot_node.shape[0]):
            if aset.rot_node[i] == settings.node and rot_track[aset.rot_anim[i]] < 0:
                rot_track[aset.rot_anim[i]] = i

    pos_s = np.zeros((a, 3), np.float32)
    pos_e = np.zeros((a, 3), np.float32)
    rot_s = np.tile(np.asarray([0, 0, 0, 1], np.float32), (a, 1))
    rot_e = rot_s.copy()
    for c in range(a):
        if pos_track[c] >= 0:
            pos_s[c] = _track_value_at(aset.pos_curves, pos_track[c], 0.0)
            pos_e[c] = _track_value_at(aset.pos_curves, pos_track[c], aset.length[c])
        if rot_track[c] >= 0:
            es = _track_value_at(aset.rot_curves, rot_track[c], 0.0)
            ee = _track_value_at(aset.rot_curves, rot_track[c], aset.length[c])
            rot_s[c] = np.asarray(quat.from_euler(es[0], es[1], es[2]))
            rot_e[c] = np.asarray(quat.from_euler(ee[0], ee[1], ee[2]))
    # cycle start/end swap for reversed clips (lib.rs:544-555)
    rev = np.asarray(aset.speed) < 0
    cyc_ps = np.where(rev[:, None], pos_e, pos_s)
    cyc_pe = np.where(rev[:, None], pos_s, pos_e)
    cyc_rs = np.where(rev[:, None], rot_e, rot_s)
    cyc_re = np.where(rev[:, None], rot_s, rot_e)
    return RootMotionData(settings=settings, pos_track=pos_track,
                          rot_track=rot_track,
                          pos_cycle_start=cyc_ps, pos_cycle_end=cyc_pe,
                          rot_cycle_start=cyc_rs, rot_cycle_end=cyc_re,
                          pos_slice_start=pos_s, rot_slice_start=rot_s)


def init_root_motion_state(rmd: RootMotionData, num_worlds: int) -> RootMotionState:
    """Start with prev = pose(t=0) so the first frame's delta is zero (the
    reference starts from Default zeros, which makes the very first tick's
    delta equal the absolute root position — here the clean choice is a
    zero first delta)."""
    w = num_worlds
    a = rmd.pos_track.shape[0]
    return RootMotionState(
        prev_position=jnp.broadcast_to(jnp.asarray(rmd.pos_slice_start), (w, a, 3)),
        pos_remainder=jnp.zeros((w, a, 3), jnp.float32),
        prev_rotation=jnp.broadcast_to(jnp.asarray(rmd.rot_slice_start), (w, a, 4)),
        rot_remainder=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1], jnp.float32),
                                       (w, a, 4)),
    )


def _gather_tracks(vals, track_idx):
    """vals [W,T,·], track_idx [A] (−1→0, masked later) → [W,A,·]."""
    safe = np.maximum(track_idx, 0)
    return vals[:, safe]


def extract_root_motion(rmd: RootMotionData, aset: AnimationSet, sampled: dict,
                        time_old, time_new, state: RootMotionState):
    """One update_root_motion tick (lib.rs:498), batched over [W, A].

    sampled: the dict from `sample_tracks` at `time_old` (pre-advance pose).
    time_old/time_new: AnimationState.time before/after `tick_times`.
    Returns (new_state, delta_position [W,A,3], delta_rotation [W,A,4],
    sampled') where sampled' has the root's channels pinned to the cycle
    start so the pose no longer translates/rotates the root (lib.rs:601-636).
    """
    st = rmd.settings
    looping = jnp.asarray(aset.looping)[None]
    fwd = (jnp.asarray(aset.speed) >= 0)[None]
    wrapped = looping & jnp.where(fwd, time_new < time_old, time_new > time_old)

    w = time_old.shape[0]
    a = rmd.pos_track.shape[0]
    delta_p = jnp.zeros((w, a, 3), jnp.float32)
    delta_r = jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1], jnp.float32), (w, a, 4))
    new_state = state
    sampled = dict(sampled)

    has_p = jnp.asarray(rmd.pos_track >= 0)[None, :, None]
    if "position" in sampled and (rmd.pos_track >= 0).any():
        nodes, anims, vals = sampled["position"]
        pose_p = _gather_tracks(vals, rmd.pos_track)                 # [W,A,3]
        cyc_s = jnp.asarray(rmd.pos_cycle_start)[None]
        cyc_e = jnp.asarray(rmd.pos_cycle_end)[None]
        wr = wrapped[..., None]
        prev_position = jnp.where(wr, cyc_s, pose_p)
        pos_remainder = jnp.where(wr, cyc_e - pose_p, 0.0)
        delta = pose_p - state.prev_position + state.pos_remainder
        keep = jnp.asarray([st.ignore_x, st.ignore_y, st.ignore_z])
        delta_p = jnp.where(keep[None, None], 0.0, delta) * has_p
        new_state = new_state._replace(
            prev_position=jnp.where(has_p, prev_position, state.prev_position),
            pos_remainder=jnp.where(has_p, pos_remainder, state.pos_remainder))
        # pin the pose's root position to the slice start on extracted axes
        pin = jnp.where(keep[None, None], pose_p,
                        jnp.asarray(rmd.pos_slice_start)[None])
        rows = np.nonzero(rmd.pos_track >= 0)[0]
        vals = vals.at[:, rmd.pos_track[rows]].set(
            jnp.where(has_p[:, rows], pin[:, rows], vals[:, rmd.pos_track[rows]]))
        sampled["position"] = (nodes, anims, vals)

    has_r = jnp.asarray(rmd.rot_track >= 0)[None, :, None]
    if (not st.ignore_rotations) and "rotation" in sampled and (rmd.rot_track >= 0).any():
        nodes, anims, vals = sampled["rotation"]
        pose_r = _gather_tracks(vals, rmd.rot_track)                 # [W,A,4]
        cyc_s = jnp.asarray(rmd.rot_cycle_start)[None]
        cyc_e = jnp.asarray(rmd.rot_cycle_end)[None]
        wr = wrapped[..., None]
        prev_rotation = jnp.where(wr, cyc_s, pose_r)
        rot_remainder = jnp.where(
            wr, quat.mul(quat.inverse(jnp.broadcast_to(cyc_e, pose_r.shape)), pose_r),
            jnp.asarray([0.0, 0, 0, 1], jnp.float32))
        current_rel = quat.mul(quat.inverse(state.prev_rotation), pose_r)
        delta_r = jnp.where(has_r, quat.mul(state.rot_remainder, current_rel),
                            delta_r)
        new_state = new_state._replace(
            prev_rotation=jnp.where(has_r, prev_rotation, state.prev_rotation),
            rot_remainder=jnp.where(has_r, rot_remainder, state.rot_remainder))
        rows = np.nonzero(rmd.rot_track >= 0)[0]
        pin = jnp.broadcast_to(jnp.asarray(rmd.rot_slice_start)[None], pose_r.shape)
        vals = vals.at[:, rmd.rot_track[rows]].set(pin[:, rows])
        sampled["rotation"] = (nodes, anims, vals)

    return new_state, delta_p, delta_r, sampled


def blend_root_motion(delta_a, delta_b, weight):
    """RootMotion::blend_with (lib.rs:340): lerp positions, nlerp rotations.
    delta_* are (delta_position, delta_rotation) pairs; weight is pb's."""
    pa, ra = delta_a
    pb, rb = delta_b
    w = jnp.asarray(weight)
    while w.ndim < pa.ndim:
        w = w[..., None]
    return (pa + (pb - pa) * w, quat.nlerp(ra, rb, w))
