"""Software sound mixer.

Equivalent of fyrox-sound: `SoundEngine`/`SoundContext::render`
(fyrox-sound/src/engine.rs:186 → context.rs:268) — 44.1 kHz stereo block
mixing with per-source distance gain + stereo panning (the reference's
"simple" path, context.rs:291; binaural HRTF is the 4-5x slower alternate
path and lands later). All sources mix in one vectorized pass; block
rendering is jittable, so audio can be produced on-device alongside the
simulation and streamed out per block.

Distance models per the reference's `DistanceModel` (context.rs:59):
None / Inverse / Linear / Exponent with rolloff factor.
"""
from __future__ import annotations

import wave
from dataclasses import dataclass
from typing import List, NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["SAMPLE_RATE", "DistanceModel", "SoundBuffers", "SourceState",
           "init_sources", "render_block", "load_wav"]

SAMPLE_RATE = 44_100  # engine.rs:54


class DistanceModel:
    NONE, INVERSE, LINEAR, EXPONENT = 0, 1, 2, 3


@dataclass
class SoundBuffers:
    """Padded mono sample storage [NB, Lmax]."""
    samples: np.ndarray
    lengths: np.ndarray

    @staticmethod
    def pack(buffers: List[np.ndarray]) -> "SoundBuffers":
        lmax = max((len(b) for b in buffers), default=1)
        out = np.zeros((max(len(buffers), 1), lmax), np.float32)
        lens = np.zeros(max(len(buffers), 1), np.int32)
        for i, b in enumerate(buffers):
            out[i, :len(b)] = b
            lens[i] = len(b)
        return SoundBuffers(out, lens)


class SourceState(NamedTuple):
    buffer: jnp.ndarray     # [S] int32
    playhead: jnp.ndarray   # [S] f32 sample position
    playing: jnp.ndarray    # [S] bool
    looping: jnp.ndarray    # [S] bool
    gain: jnp.ndarray       # [S]
    pitch: jnp.ndarray      # [S]
    position: jnp.ndarray   # [S,3] world
    radius: jnp.ndarray     # [S] reference distance
    max_distance: jnp.ndarray  # [S]
    rolloff: jnp.ndarray    # [S]


def init_sources(buffer_idx, positions, gain=1.0, pitch=1.0, looping=True,
                 radius=1.0, max_distance=25.0, rolloff=1.0) -> SourceState:
    s = len(buffer_idx)
    ones = jnp.ones(s, jnp.float32)
    return SourceState(
        buffer=jnp.asarray(buffer_idx, jnp.int32),
        playhead=jnp.zeros(s, jnp.float32),
        playing=jnp.ones(s, bool),
        looping=jnp.full(s, looping, bool),
        gain=ones * gain,
        pitch=ones * pitch,
        position=jnp.asarray(positions, jnp.float32),
        radius=ones * radius,
        max_distance=ones * max_distance,
        rolloff=ones * rolloff,
    )


def _distance_gain(dist, radius, max_d, rolloff, model):
    d = jnp.clip(dist, radius, max_d)
    if model == DistanceModel.NONE:
        return jnp.ones_like(dist)
    if model == DistanceModel.INVERSE:
        return radius / (radius + rolloff * (d - radius))
    if model == DistanceModel.LINEAR:
        return 1.0 - rolloff * (d - radius) / jnp.maximum(max_d - radius, 1e-6)
    return (d / radius) ** (-rolloff)   # EXPONENT


def render_block(buffers: SoundBuffers, src: SourceState, listener_pos,
                 listener_right, block_len=513,
                 distance_model=DistanceModel.INVERSE):
    """Mix one stereo block [block_len, 2] and advance playheads.

    listener_right: the listener's +X (ear axis) world vector. Panning per
    the reference's simple spatial path: constant-power pan from the
    direction·right projection, gain from the distance model.
    """
    samples = jnp.asarray(buffers.samples)
    lengths = jnp.asarray(buffers.lengths, jnp.float32)

    to_src = src.position - jnp.asarray(listener_pos)
    dist = jnp.linalg.norm(to_src, axis=-1)
    dirn = to_src / jnp.maximum(dist[..., None], 1e-6)
    pan = jnp.sum(dirn * jnp.asarray(listener_right), -1)  # [-1, 1]
    pan = jnp.clip(pan, -1.0, 1.0)
    ang = (pan + 1.0) * (np.pi / 4.0)
    gl, gr = jnp.cos(ang), jnp.sin(ang)                    # constant power
    dg = _distance_gain(dist, src.radius, src.max_distance, src.rolloff,
                        distance_model)
    amp = src.gain * dg * src.playing.astype(jnp.float32)

    # per-source sample positions for the block (linear pitch resampling)
    t = jnp.arange(block_len, dtype=jnp.float32)
    pos = src.playhead[:, None] + t[None, :] * src.pitch[:, None]  # [S,B]
    length = lengths[src.buffer][:, None]
    pos_wrapped = jnp.where(src.looping[:, None], jnp.mod(pos, length),
                            jnp.minimum(pos, length - 1.0))
    in_range = pos < length
    active = src.looping[:, None] | in_range

    i0 = jnp.floor(pos_wrapped).astype(jnp.int32)
    frac = pos_wrapped - i0
    i1 = jnp.where(src.looping[:, None],
                   jnp.mod(i0 + 1, length.astype(jnp.int32)),
                   jnp.minimum(i0 + 1, length.astype(jnp.int32) - 1))
    buf = samples[src.buffer]                               # [S,Lmax]
    s0 = jnp.take_along_axis(buf, i0, axis=1)
    s1 = jnp.take_along_axis(buf, i1, axis=1)
    mono = (s0 + (s1 - s0) * frac) * active.astype(jnp.float32)  # [S,B]

    left = jnp.sum(mono * (amp * gl)[:, None], axis=0)
    right = jnp.sum(mono * (amp * gr)[:, None], axis=0)
    block = jnp.stack([left, right], -1)

    new_head = src.playhead + block_len * src.pitch
    len_f = lengths[src.buffer]
    new_head = jnp.where(src.looping, jnp.mod(new_head, len_f), new_head)
    still = src.playing & (src.looping | (new_head < len_f))
    return block, src._replace(playhead=new_head, playing=still)


def load_wav(path: str) -> np.ndarray:
    """Decode a PCM WAV file to mono float32 (decoder/ equivalent)."""
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(-1)
    return data
