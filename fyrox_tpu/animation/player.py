"""AnimationPlayer glue: tick clips, sample tracks, apply poses to the scene.

Equivalent of `AnimationPlayer::update` (fyrox-impl/src/scene/animation/
mod.rs:340): tick the AnimationContainer, apply the resulting pose to graph
node local transforms. Here it's one pure function over the batched state.
"""
from __future__ import annotations

import jax.numpy as jnp

from fyrox_tpu.animation import machine as machine_mod
from fyrox_tpu.animation import pose as pose_mod
from fyrox_tpu.animation import track as track_mod

__all__ = ["step_player", "step_absm", "step_absm_layered"]


def step_player(aset: track_mod.AnimationSet, anim: track_mod.AnimationState,
                position, rotation, scale, dt):
    """One AnimationPlayer tick.

    Samples the pose at the *current* clip times, applies it (enabled clips
    overwrite in order), then advances the clocks — matching the order in
    Animation::tick (lib.rs:471: update_pose first, then time advance).
    Returns (new_anim_state, position, rotation, scale).
    """
    n_nodes = position.shape[1]
    sampled = track_mod.sample_tracks(aset, anim)
    if sampled:
        poses = pose_mod.build_poses(aset, sampled, n_nodes)
        position, rotation, scale = pose_mod.apply_overwrite(
            poses, anim.enabled, position, rotation, scale)
    anim = track_mod.tick_times(aset, anim, dt)
    return anim, position, rotation, scale


def step_absm(aset: track_mod.AnimationSet, mt: machine_mod.MachineTemplate,
              anim: track_mod.AnimationState, ms: machine_mod.MachineState,
              params, position, rotation, scale, dt):
    """One AnimationBlendingStateMachine tick
    (scene/animation/absm.rs:311 → Machine::evaluate_pose machine/mod.rs:347).

    params: [W, P] bool rule values. All clips referenced by machine states
    keep ticking (the reference's machine reads clip times from the player).
    Returns (anim, machine_state, position, rotation, scale).
    """
    n_nodes = position.shape[1]
    sampled = track_mod.sample_tracks(aset, anim)
    ms = machine_mod.update_machine(mt, ms, params, dt)
    if sampled:
        poses = pose_mod.build_poses(aset, sampled, n_nodes)
        final = machine_mod.evaluate_pose(mt, ms, poses)
        position, rotation, scale = pose_mod.apply_pose(
            final, position, rotation, scale)
    anim = track_mod.tick_times(aset, anim, dt)
    return anim, ms, position, rotation, scale


def step_absm_layered(aset, lm: machine_mod.LayeredMachine, anim, states,
                      params: machine_mod.Parameters,
                      position, rotation, scale, dt):
    """Layered ABSM tick (Machine with multiple MachineLayers,
    machine/layer.rs:590): every layer's transitions advance against the
    shared typed Parameters, then the layer poses composite bottom-up with
    per-node bone-mask weights (mask.rs:220).

    Returns (anim, layer_states, position, rotation, scale)."""
    n_nodes = position.shape[1]
    sampled = track_mod.sample_tracks(aset, anim)
    states = machine_mod.update_layers(lm, states, params, dt)
    if sampled:
        poses = pose_mod.build_poses(aset, sampled, n_nodes)
        final = machine_mod.evaluate_layers(lm, states, poses, params)
        position, rotation, scale = pose_mod.apply_pose(
            final, position, rotation, scale)
    anim = track_mod.tick_times(aset, anim, dt)
    return anim, states, position, rotation, scale


def step_player_root_motion(aset, rmd, anim, rm_state,
                            position, rotation, scale, dt):
    """AnimationPlayer tick with root motion extraction (Animation::tick
    lib.rs:471 + update_root_motion :498): the root bone's channels are
    pinned to the cycle start in the applied pose and their per-frame
    deltas are returned for the engine to apply to the character body.

    Returns (anim, rm_state, position, rotation, scale,
    delta_position [W,3] — enabled-clip sum, in the root's local frame)."""
    from fyrox_tpu.animation import rootmotion as rm_mod
    n_nodes = position.shape[1]
    sampled = track_mod.sample_tracks(aset, anim)
    time_old = anim.time
    anim2 = track_mod.tick_times(aset, anim, dt)
    rm_state, dp, _dr, sampled = rm_mod.extract_root_motion(
        rmd, aset, sampled, time_old, anim2.time, rm_state)
    if sampled:
        poses = pose_mod.build_poses(aset, sampled, n_nodes)
        position, rotation, scale = pose_mod.apply_overwrite(
            poses, anim.enabled, position, rotation, scale)
    enabled = anim.enabled.astype(dp.dtype)
    delta = jnp.sum(dp * enabled[..., None], axis=1)       # [W,3]
    return anim2, rm_state, position, rotation, scale, delta
