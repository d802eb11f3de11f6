"""Scene↔mixer glue: Sound and Listener nodes drive the sound engine.

Equivalent of the reference's per-frame sound sync
(fyrox-impl/src/scene/sound/mod.rs — the Sound node writes its global
position/gain/state into the sound context each frame; listener.rs — the
Listener node's global pose becomes the context's listener). Here the sync
is a pure function: every rendered block gathers the CURRENT node globals
of all source/listener nodes in all worlds and mixes batched
[W, block, 2] stereo audio on-device (sound/engine.render_block vmapped
over the world axis).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.sound.engine import (DistanceModel, SoundBuffers, SourceState,
                                    init_sources, render_block)

__all__ = ["AudioTemplate", "build_audio_template", "init_audio_state",
           "render_scene_audio"]


class AudioTemplate(NamedTuple):
    """Static audio layout for one scene (host data)."""
    buffers: SoundBuffers
    src_node: np.ndarray       # [S] scene node per source
    listener_node: int         # scene node whose global is the ear pose
    base: SourceState          # [S] initial per-source mixer state


def build_audio_template(template) -> Optional[AudioTemplate]:
    """Pack a SceneTemplate's SOUND/LISTENER payloads. None if no sounds.

    Listener resolution mirrors the reference's single-active-listener
    rule: the first Listener node wins; scenes without one fall back to
    the first camera (logged), then node 0.
    """
    snd = getattr(template, "sounds", None) or {}
    nodes = np.asarray(snd.get("node", []), np.int32)
    if nodes.size == 0:
        return None
    buffers = SoundBuffers.pack([np.asarray(b, np.float32)
                                 for b in template.sound_buffers])
    listeners = getattr(template, "listeners", None) or {}
    lnodes = np.asarray(listeners.get("node", []), np.int32)
    if lnodes.size:
        listener = int(lnodes[0])
    else:
        cams = getattr(template, "cameras", None) or {}
        cnodes = np.asarray(cams.get("node", []), np.int32)
        from fyrox_tpu.core.log import Log
        Log.warn("scene has Sound nodes but no Listener; using the "
                 + ("camera node as ears" if cnodes.size else "root node"))
        listener = int(cnodes[0]) if cnodes.size else 0
    base = init_sources(
        buffer_idx=np.asarray(snd["buffer"], np.int32),
        positions=np.zeros((nodes.size, 3), np.float32),
        gain=1.0)
    base = base._replace(
        gain=jnp.asarray(snd["gain"], jnp.float32),
        pitch=jnp.asarray(snd["pitch"], jnp.float32),
        looping=jnp.asarray(snd["looping"], bool),
        playing=jnp.asarray(snd["playing"], bool),
        radius=jnp.asarray(snd["radius"], jnp.float32),
        max_distance=jnp.asarray(snd["max_distance"], jnp.float32),
        rolloff=jnp.asarray(snd["rolloff"], jnp.float32))
    return AudioTemplate(buffers=buffers, src_node=nodes,
                         listener_node=listener, base=base)


def init_audio_state(at: AudioTemplate, num_worlds: int) -> SourceState:
    """Batched [W,S,...] mixer state from the template's base sources."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (num_worlds,) + x.shape), at.base)


def render_scene_audio(at: AudioTemplate, audio: SourceState, globals_,
                       block_len: int = 513,
                       distance_model=DistanceModel.INVERSE):
    """Mix one stereo block per world from CURRENT node globals.

    globals_ [W,N,4,4] (scene.globals_). Source positions come from each
    Sound node's global translation; the listener's position and ear axis
    (+X basis column) come from the Listener node's global — the same
    per-frame sync the reference does in Sound::sync_native /
    Listener::sync_native. Returns (block [W, block_len, 2], new audio
    state with advanced playheads)."""
    # (take, not mixed advanced indexing — `g[:, idx, :3, 3]` would move
    # the advanced axes to the front and transpose W and S)
    src_pos = jnp.take(globals_, jnp.asarray(at.src_node),
                       axis=1)[..., :3, 3]                       # [W,S,3]
    audio = audio._replace(position=src_pos)
    lg = globals_[:, at.listener_node]                           # [W,4,4]
    lpos = lg[:, :3, 3]
    lright = lg[:, :3, 0]
    lright = lright / jnp.maximum(
        jnp.linalg.norm(lright, axis=-1, keepdims=True), 1e-8)

    def one(src, lp, lr):
        return render_block(at.buffers, src, lp, lr, block_len=block_len,
                            distance_model=distance_model)

    return jax.vmap(one)(audio, lpos, lright)
