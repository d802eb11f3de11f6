"""Binaural (HRTF-path) spatialization.

Equivalent of the reference's HRTF renderer (fyrox-sound/src/context.rs:299
-327: block convolution against an HRIR sphere from the external `hrtf`
crate, HRTF_BLOCK_LEN=513, noted 4-5x slower than the simple panning path).

No HRIR dataset ships in this environment, so this implements the same
*architecture* — per-ear block filtering — with a parametric spherical-head
model (Woodworth ITD + first-order head-shadow low-pass for the far ear):

  * ITD: interaural delay  τ = (a/c)(θ + sin θ) per Woodworth, applied as a
    fractional per-ear sample delay
  * ILD: the shadowed ear gets a one-pole low-pass whose cutoff drops as
    the source moves behind the head

Swap `spherical_head_hrir` for measured HRIRs to get dataset-grade output;
the block-convolution path is shared.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["spherical_head_hrir", "render_block_binaural", "HRTF_BLOCK_LEN",
           "HrirSphere", "sample_hrir"]

HRTF_BLOCK_LEN = 513          # context.rs:322
_HEAD_RADIUS = 0.0875         # meters
_SPEED_OF_SOUND = 343.0
_SR = 44_100.0


def spherical_head_hrir(azimuth, length=64):
    """Per-ear FIR approximations [2, length] for a source at `azimuth`
    (radians, 0 = front, +pi/2 = right). Batched over azimuth."""
    az = jnp.asarray(azimuth)
    # Woodworth ITD, split antisymmetrically between the ears
    theta = jnp.clip(az, -np.pi, np.pi)
    itd = (_HEAD_RADIUS / _SPEED_OF_SOUND) * (jnp.abs(theta)
                                              + jnp.sin(jnp.abs(theta)))
    delay_far = itd * _SR                          # samples
    near_is_right = theta > 0

    t = jnp.arange(length, dtype=jnp.float32)

    def frac_delta(d):
        """windowed-sinc fractional delay FIR"""
        x = t[None] - 1.0 - d[..., None]
        s = jnp.sinc(x)
        win = 0.5 * (1 + jnp.cos(np.pi * jnp.clip(x / (length / 2), -1, 1)))
        return s * win

    near = frac_delta(jnp.zeros_like(delay_far))
    far = frac_delta(delay_far)
    # head shadow: one-pole low-pass on the far ear whose strength grows
    # with |θ| (identity at θ=0, so centered sources stay symmetric)
    alpha = jnp.clip(0.15 + 0.8 * (1 - jnp.abs(theta) / np.pi), 0.05, 1.0)
    decay = (1 - alpha[..., None]) ** t[None]
    lp = alpha[..., None] * decay
    lp = lp / jnp.maximum(jnp.sum(lp, -1, keepdims=True), 1e-8)
    strength = jnp.sin(jnp.abs(theta) / 2.0)[..., None]
    ident = jnp.zeros_like(lp).at[..., 0].set(1.0)
    shadow = (1.0 - strength) * ident + strength * lp
    # convolve far-ear delta with the shadow filter (short FFT conv)
    n = 2 * length
    far_f = jnp.fft.rfft(far, n) * jnp.fft.rfft(shadow, n)
    far = jnp.fft.irfft(far_f, n)[..., :length]
    gain_far = 0.6 + 0.4 * jnp.cos(jnp.abs(theta))  # mild ILD

    left = jnp.where(near_is_right[..., None], far * gain_far[..., None], near)
    right = jnp.where(near_is_right[..., None], near, far * gain_far[..., None])
    return jnp.stack([left, right], -2)            # [..., 2, length]


class HrirSphere:
    """Measured-HRIR support (the reference loads .hrir spheres for the
    external `hrtf` crate, fyrox-sound/src/context.rs:322): a ring/sphere
    of impulse responses indexed by azimuth. `sample_hrir` blends the two
    nearest measurements — drop a dataset in and the binaural path
    becomes dataset-grade without touching the mixer."""

    def __init__(self, azimuths, hrirs):
        """azimuths [M] radians (sorted, full circle); hrirs [M,2,L]."""
        order = np.argsort(np.asarray(azimuths))
        self.azimuths = np.asarray(azimuths, np.float32)[order]
        self.hrirs = np.asarray(hrirs, np.float32)[order]

    @property
    def length(self):
        return self.hrirs.shape[-1]


def sample_hrir(sphere: HrirSphere, azimuths):
    """[S,2,L] HRIRs at arbitrary azimuths: linear blend of the two
    nearest measured directions (wrap-around)."""
    az_m = jnp.asarray(sphere.azimuths)
    m = az_m.shape[0]
    two_pi = 2.0 * np.pi
    a = jnp.mod(jnp.asarray(azimuths), two_pi)
    idx = jnp.sum((az_m[None, :] <= a[:, None]).astype(jnp.int32), 1) - 1
    # below the first measured azimuth: wrap to the last↔first arc (the
    # symmetric twin of the nxt == 0 wrap below) instead of clamping to
    # index 0, which produced a discontinuity near azimuth 0 when
    # azimuths[0] != 0
    below = idx < 0
    idx = jnp.where(below, m - 1, idx)
    nxt = jnp.mod(idx + 1, m)
    a0 = jnp.where(below, az_m[m - 1] - two_pi, az_m[idx])
    a1 = jnp.where(nxt == 0, az_m[0] + two_pi, az_m[nxt])
    a1 = jnp.where(below, az_m[0], a1)
    t = jnp.clip((a - a0) / jnp.maximum(a1 - a0, 1e-6), 0.0, 1.0)
    h = jnp.asarray(sphere.hrirs)
    oh0 = (jnp.arange(m)[None] == idx[:, None]).astype(h.dtype)
    oh1 = (jnp.arange(m)[None] == nxt[:, None]).astype(h.dtype)
    h0 = jnp.einsum("sm,mcl->scl", oh0, h)
    h1 = jnp.einsum("sm,mcl->scl", oh1, h)
    return h0 * (1 - t[:, None, None]) + h1 * t[:, None, None]


def render_block_binaural(mono_blocks, azimuths, gains,
                          block_len=HRTF_BLOCK_LEN, hrir_len=64,
                          hrir_sphere: HrirSphere = None):
    """Binaural mix of S sources: mono_blocks [S, block_len], azimuths [S],
    gains [S] → stereo [block_len, 2] via FFT block convolution (the
    overlap tail is truncated per block, matching short-HRIR usage).
    Pass `hrir_sphere` to use measured HRIRs instead of the parametric
    spherical-head model."""
    if hrir_sphere is not None:
        hrirs = sample_hrir(hrir_sphere, azimuths)       # [S,2,L]
        hrir_len = hrir_sphere.length
    else:
        hrirs = spherical_head_hrir(azimuths, hrir_len)  # [S,2,L]
    n = int(2 ** np.ceil(np.log2(block_len + hrir_len)))
    src_f = jnp.fft.rfft(mono_blocks, n)                 # [S,F]
    hr_f = jnp.fft.rfft(hrirs, n)                        # [S,2,F]
    out = jnp.fft.irfft(src_f[:, None] * hr_f, n)[..., :block_len]
    out = jnp.sum(out * gains[:, None, None], axis=0)    # [2,block]
    return out.T
