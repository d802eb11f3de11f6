"""Animation Blending State Machine (ABSM), batched.

Equivalent of fyrox-animation/src/machine/ (Machine :195, evaluate_pose
:347, State, Transition with blend time). Round-1 scope: one layer, states
whose pose source is a single clip (PlayAnimation pose node), boolean
transition rules. Blend spaces / N-way blend pose nodes use
pose.blend_pose and land in a later pass.

The machine is split into:
  * `MachineTemplate` — static tables (host numpy): state→clip mapping and
    the transition table (from, to, param, invert, duration).
  * `MachineState` — per-world arrays: current/source state, blend factor,
    active transition duration.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple

import numpy as np
import jax.numpy as jnp

from fyrox_tpu.animation import pose as pose_mod

__all__ = ["MachineTemplate", "MachineBuilder", "MachineState",
           "init_machine_state", "update_machine", "evaluate_pose",
           "Parameters", "make_parameters", "LayerSpec", "LayeredMachine",
           "init_layered_state", "update_layers", "evaluate_layers"]


@dataclass
class MachineTemplate:
    state_anim: np.ndarray    # [S] first clip of each state (back-compat)
    state_names: List[str]
    entry_state: int
    t_from: np.ndarray        # [T] int32
    t_to: np.ndarray          # [T] int32
    t_param: np.ndarray       # [T] int32 index into the bool parameter vector
    t_invert: np.ndarray      # [T] bool — fire when parameter is False
    t_duration: np.ndarray    # [T] f32 blend time (seconds)
    param_names: List[str] = field(default_factory=list)
    # N-way BlendAnimations pose sources (machine/node/blend.rs:92):
    # padded [S, M] clip ids + normalized weights (weight 0 = unused slot)
    state_clips: np.ndarray = None     # [S, M] int32
    state_weights: np.ndarray = None   # [S, M] f32
    # BlendSpace pose sources (machine/node/blendspace.rs): sparse list of
    # (state index, BlendSpaceTemplate); states listed here sample their
    # pose from the 2D blend space instead of the clip list
    state_spaces: list = field(default_factory=list)

    @property
    def num_states(self):
        return int(self.state_anim.shape[0])

    @property
    def num_transitions(self):
        return int(self.t_from.shape[0])


class MachineBuilder:
    def __init__(self):
        self._states = []
        self._transitions = []
        self._params = []
        self._entry = 0

    def add_parameter(self, name: str) -> int:
        self._params.append(name)
        return len(self._params) - 1

    def add_state(self, name: str, clip: int = None, clips=None,
                  blendspace=None) -> int:
        """A state's pose source: a single clip (PlayAnimation), a weighted
        list [(clip, weight), ...] (BlendAnimations), or a
        `BlendSpaceTemplate` (machine/node/blendspace.rs) sampled with the
        [W,2] point passed to evaluate_pose."""
        if clips is None:
            clips = [(int(blendspace.clips[0]) if blendspace is not None
                      else int(clip), 1.0)]
        self._states.append((name, list(clips), blendspace))
        return len(self._states) - 1

    def set_entry_state(self, state: int):
        self._entry = int(state)

    def add_transition(self, src: int, dst: int, param: int,
                       duration: float = 0.3, invert: bool = False):
        self._transitions.append((src, dst, param, invert, duration))

    def build(self) -> MachineTemplate:
        tr = self._transitions
        m = max((len(s[1]) for s in self._states), default=1)
        clips = np.zeros((len(self._states), m), np.int32)
        weights = np.zeros((len(self._states), m), np.float32)
        for i, (_, cl, _bs) in enumerate(self._states):
            total = sum(w for _, w in cl) or 1.0
            for k, (c, w) in enumerate(cl):
                clips[i, k] = c
                weights[i, k] = w / total
        return MachineTemplate(
            state_anim=clips[:, 0].copy(),
            state_names=[s[0] for s in self._states],
            state_clips=clips,
            state_weights=weights,
            entry_state=self._entry,
            t_from=np.asarray([t[0] for t in tr], np.int32),
            t_to=np.asarray([t[1] for t in tr], np.int32),
            t_param=np.asarray([t[2] for t in tr], np.int32),
            t_invert=np.asarray([t[3] for t in tr], bool),
            t_duration=np.asarray([t[4] for t in tr], np.float32),
            param_names=list(self._params),
            state_spaces=[(i, s[2]) for i, s in enumerate(self._states)
                          if s[2] is not None],
        )


class MachineState(NamedTuple):
    current: jnp.ndarray    # [W] int32 — destination/active state
    source: jnp.ndarray     # [W] int32 — state being blended away from
    blend: jnp.ndarray      # [W] f32 in [0,1]; 1 == settled in `current`
    duration: jnp.ndarray   # [W] f32 — active transition blend time


def init_machine_state(mt: MachineTemplate, num_worlds: int) -> MachineState:
    e = jnp.full((num_worlds,), mt.entry_state, jnp.int32)
    return MachineState(current=e, source=e,
                        blend=jnp.ones((num_worlds,), jnp.float32),
                        duration=jnp.ones((num_worlds,), jnp.float32))


def update_machine(mt: MachineTemplate, ms: MachineState, params, dt) -> MachineState:
    """One machine tick (Machine::evaluate_pose transition handling,
    machine/layer.rs:590). params: [W, P] bool.

    A world not mid-transition fires the lowest-index enabled transition
    leaving its current state (the reference checks transitions in
    definition order). Mid-transition worlds just advance the blend clock.
    """
    if mt.num_transitions == 0:
        return ms
    w = ms.current.shape[0]
    t_from = jnp.asarray(mt.t_from)
    t_to = jnp.asarray(mt.t_to)
    t_param = jnp.asarray(mt.t_param)
    t_invert = jnp.asarray(mt.t_invert)
    t_duration = jnp.asarray(mt.t_duration)

    idle = ms.blend >= 1.0
    pvals = jnp.take_along_axis(params, jnp.broadcast_to(t_param[None], (w, mt.num_transitions)),
                                axis=1)                      # [W,T]
    fire = pvals ^ t_invert[None]
    match = idle[:, None] & fire & (ms.current[:, None] == t_from[None])
    any_match = jnp.any(match, axis=1)
    first = jnp.argmax(match, axis=1)                        # lowest index (argmax of bool)

    new_to = t_to[first]
    new_dur = jnp.maximum(t_duration[first], 1e-6)
    source = jnp.where(any_match, ms.current, ms.source)
    current = jnp.where(any_match, new_to, ms.current)
    duration = jnp.where(any_match, new_dur, ms.duration)
    blend = jnp.where(any_match, 0.0, ms.blend)

    # advance the blend clock for transitioning worlds
    blend = jnp.minimum(blend + dt / duration, 1.0)
    # settled worlds collapse source → current
    settled = blend >= 1.0
    source = jnp.where(settled, current, source)
    return MachineState(current=current, source=source, blend=blend,
                        duration=duration)


def _where_pose(sel, pa, pb):
    """Per-world select between two pose tuples. sel: [W] bool."""
    out = []
    for a, b in zip(pa, pb):
        s = sel
        while s.ndim < a.ndim:
            s = s[..., None]
        out.append(jnp.where(s, a, b))
    return tuple(out)


def _state_pose(mt: MachineTemplate, state_idx, poses: pose_mod.PoseSet,
                sampling=None):
    """Pose of a state: its weighted N-way clip blend (BlendAnimations,
    machine/node/blend.rs:92) — sequential normalized accumulation — or,
    for states with a blend space source, the triangulated 2D blend
    (machine/node/blendspace.rs:120) sampled at `sampling` [W,2]."""
    if mt.state_clips is None:
        acc = pose_mod.select_anim_pose(poses,
                                        jnp.asarray(mt.state_anim)[state_idx])
    else:
        clips = jnp.asarray(mt.state_clips)[state_idx]      # [W,M]
        weights = jnp.asarray(mt.state_weights)[state_idx]  # [W,M]
        m = clips.shape[-1]
        acc = pose_mod.select_anim_pose(poses, clips[:, 0])
        cum = weights[:, 0]
        for k in range(1, m):
            pk = pose_mod.select_anim_pose(poses, clips[:, k])
            new_cum = cum + weights[:, k]
            frac = jnp.where(new_cum > 1e-8, weights[:, k] / jnp.maximum(new_cum, 1e-8), 0.0)
            acc = pose_mod.blend_pose(acc, pk, frac)
            cum = new_cum
    if sampling is not None:
        from fyrox_tpu.animation import blendspace as bs_mod
        for s, bst in (mt.state_spaces or []):
            bs_pose = bs_mod.blendspace_pose(bst, sampling, poses)
            acc = _where_pose(state_idx == s, bs_pose, acc)
    return acc


def evaluate_pose(mt: MachineTemplate, ms: MachineState, poses: pose_mod.PoseSet,
                  sampling=None):
    """Final pose = blend(source_state_pose, current_state_pose, blend)
    (Transition::blend_factor drives State mixing, machine/mod.rs:347).
    Each state's own pose is its N-way clip blend or 2D blend space;
    `sampling` [W,2] is the blend-space sampling point parameter
    (Parameter::SamplingPoint, blendspace.rs:127)."""
    pa = _state_pose(mt, ms.source, poses, sampling)
    pb = _state_pose(mt, ms.current, poses, sampling)
    return pose_mod.blend_pose(pa, pb, ms.blend)


# --------------------------------------------------------------------------
# typed parameters + layered machines (machine/layer.rs:590, mask.rs:220,
# parameter.rs)
# --------------------------------------------------------------------------

class Parameters(NamedTuple):
    """The reference's Parameter enum (fyrox-animation/src/machine/
    parameter.rs) as batched typed arrays: Rule → bools, Weight → floats,
    SamplingPoint → points, Index → indices."""
    bools: jnp.ndarray      # [W, Pb] bool
    floats: jnp.ndarray     # [W, Pf] f32
    points: jnp.ndarray     # [W, Pp, 2] f32
    indices: jnp.ndarray    # [W, Pi] int32


def make_parameters(num_worlds, bools=0, floats=0, points=0, indices=0):
    w = num_worlds
    return Parameters(
        bools=jnp.zeros((w, max(bools, 1)), bool),
        floats=jnp.zeros((w, max(floats, 1)), jnp.float32),
        points=jnp.zeros((w, max(points, 1), 2), jnp.float32),
        indices=jnp.zeros((w, max(indices, 1)), jnp.int32))


@dataclass
class LayerSpec:
    """One machine layer (MachineLayer, machine/layer.rs:590): its own
    state graph, a blend weight (fixed or a float parameter), and a bone
    mask (LayerMask, machine/mask.rs:220 — nodes NOT in the mask keep the
    lower layers' pose)."""
    machine: MachineTemplate
    mask: np.ndarray = None          # [N_nodes] bool (None = all nodes)
    weight: float = 1.0
    weight_param: int = -1           # float-parameter index (-1 = fixed)
    sampling_param: int = -1         # point-parameter index for blendspaces


@dataclass
class LayeredMachine:
    layers: List[LayerSpec]


def init_layered_state(lm: LayeredMachine, num_worlds):
    return tuple(init_machine_state(l.machine, num_worlds)
                 for l in lm.layers)


def update_layers(lm: LayeredMachine, states, params: Parameters, dt):
    """Tick every layer's transition logic against the shared parameter
    set (Machine::evaluate_pose drives each layer, machine/mod.rs:347)."""
    return tuple(update_machine(l.machine, s, params.bools, dt)
                 for l, s in zip(lm.layers, states))


def evaluate_layers(lm: LayeredMachine, states, poses: pose_mod.PoseSet,
                    params: Parameters = None):
    """Final pose: layer 0's pose, then each upper layer blended on top
    with per-node weight = layer_weight * bone_mask (layer.rs blend over
    LayerMask). A masked-off node keeps the lower layers' value exactly."""
    out = None
    for li, (spec, ms) in enumerate(zip(lm.layers, states)):
        sampling = None
        if spec.sampling_param >= 0 and params is not None:
            sampling = params.points[:, spec.sampling_param]
        p = evaluate_pose(spec.machine, ms, poses, sampling)
        if out is None:
            out = p
            continue
        if spec.weight_param >= 0 and params is not None:
            wgt = params.floats[:, spec.weight_param]
        else:
            wgt = jnp.asarray(spec.weight, jnp.float32)
        wgt = jnp.broadcast_to(jnp.asarray(wgt)[..., None],
                               out[0].shape[:2])              # [W,N]
        if spec.mask is not None:
            wgt = wgt * jnp.asarray(spec.mask, jnp.float32)[None]
        # masked nodes must keep the lower layer even where the upper
        # pose carries a value: zero the upper pose's masks there
        if spec.mask is not None:
            mk = jnp.asarray(spec.mask, bool)[None]
            p = (p[0], p[1], p[2], p[3] & mk, p[4] & mk, p[5] & mk)
        out = pose_mod.blend_pose(out, p, wgt)
    return out
