"""Post-processing: HDR tonemapping with auto-exposure, bloom, FXAA.

Equivalent of the reference's post chain (renderer/hdr/mod.rs:86 histogram
luminance adaptation + tonemap, bloom/mod.rs:44, fxaa.rs:37). All
image-space batched ops over [..., H, W, 3] linear HDR colors.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["PostConfig", "tonemap_aces", "auto_exposure", "bloom", "fxaa",
           "color_grading", "identity_lut", "post_process"]


class PostConfig(NamedTuple):
    exposure: float = 1.0
    auto_exposure: bool = True
    adaptation_key: float = 0.18      # middle-gray key value
    bloom_threshold: float = 1.0
    bloom_strength: float = 0.35
    bloom_radius: int = 4
    use_fxaa: bool = True
    gamma: float = 2.2
    # color grading LUT (camera.rs ColorGradingLut / renderer hdr map
    # stage): [N,N,N,3] cube sampled trilinearly after tonemap+gamma
    color_grading_lut: object = None
    color_grading_amount: float = 1.0


def identity_lut(n: int = 16) -> np.ndarray:
    """[N,N,N,3] identity color cube (lut[r,g,b] = (r,g,b)/ (N-1))."""
    ax = np.linspace(0.0, 1.0, n, dtype=np.float32)
    r, g, b = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.stack([r, g, b], -1)


def color_grading(ldr, lut, amount=1.0):
    """Trilinear 3D-LUT grade: ldr [...,3] in [0,1], lut [N,N,N,3].

    The reference bakes the LUT from an image strip
    (camera.rs ColorGradingLut::new) and applies it in the HDR mapper;
    here any [N,N,N,3] cube works (identity_lut to start from)."""
    lut = jnp.asarray(lut)
    n = lut.shape[0]
    flat = lut.reshape(-1, 3)
    p = jnp.clip(ldr, 0.0, 1.0) * (n - 1)
    i0 = jnp.floor(p).astype(jnp.int32)
    i0 = jnp.minimum(i0, n - 2)
    f = p - i0

    def at(dr, dg, db):
        idx = ((i0[..., 0] + dr) * n + (i0[..., 1] + dg)) * n \
            + (i0[..., 2] + db)
        return flat[idx]

    c00 = at(0, 0, 0) * (1 - f[..., 2:3]) + at(0, 0, 1) * f[..., 2:3]
    c01 = at(0, 1, 0) * (1 - f[..., 2:3]) + at(0, 1, 1) * f[..., 2:3]
    c10 = at(1, 0, 0) * (1 - f[..., 2:3]) + at(1, 0, 1) * f[..., 2:3]
    c11 = at(1, 1, 0) * (1 - f[..., 2:3]) + at(1, 1, 1) * f[..., 2:3]
    c0 = c00 * (1 - f[..., 1:2]) + c01 * f[..., 1:2]
    c1 = c10 * (1 - f[..., 1:2]) + c11 * f[..., 1:2]
    graded = c0 * (1 - f[..., 0:1]) + c1 * f[..., 0:1]
    return ldr + (graded - ldr) * amount


def _luminance(c):
    return (0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2])


def auto_exposure(color, key=0.18, eps=1e-4):
    """Log-average luminance exposure (the histogram-adaptation equivalent
    of hdr/luminance/, collapsed to its steady state)."""
    lum = _luminance(color)
    log_avg = jnp.exp(jnp.mean(jnp.log(lum + eps), axis=(-2, -1),
                               keepdims=True))
    return key / jnp.maximum(log_avg, eps)


def tonemap_aces(color):
    """ACES filmic approximation (Narkowicz) — the reference's HDR tonemap
    family."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((color * (a * color + b))
                    / (color * (c * color + d) + e), 0.0, 1.0)


def _blur_separable(img, radius):
    """Box blur (separable) — cheap stand-in for the bloom pyramid."""
    k = 2 * radius + 1
    kernel = jnp.ones(k, img.dtype) / k

    def conv_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="edge")
        # cumulative-sum box filter
        cs = jnp.cumsum(xp, axis=axis)
        lead = jnp.take(cs, jnp.arange(k - 1, xp.shape[axis]), axis=axis)
        lag = jnp.concatenate(
            [jnp.zeros_like(jnp.take(cs, jnp.arange(1), axis=axis)),
             jnp.take(cs, jnp.arange(0, xp.shape[axis] - k), axis=axis)],
            axis=axis)
        return (lead - lag) / k

    return conv_axis(conv_axis(img, -3), -2)


def bloom(color, threshold=1.0, strength=0.35, radius=4):
    """Bright-pass + blur + additive combine (bloom/mod.rs:44)."""
    lum = _luminance(color)[..., None]
    bright = jnp.where(lum > threshold, color, 0.0)
    return color + strength * _blur_separable(bright, radius)


def fxaa(ldr):
    """Luma-based edge antialiasing (fxaa.rs:37), simplified: blend along
    the detected edge direction where local luma contrast is high."""
    lum = _luminance(ldr)

    def sh(a, dy, dx):
        return jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)

    l_n = sh(lum, -1, 0)
    l_s = sh(lum, 1, 0)
    l_e = sh(lum, 0, 1)
    l_w = sh(lum, 0, -1)
    l_min = jnp.minimum(lum, jnp.minimum(jnp.minimum(l_n, l_s),
                                         jnp.minimum(l_e, l_w)))
    l_max = jnp.maximum(lum, jnp.maximum(jnp.maximum(l_n, l_s),
                                         jnp.maximum(l_e, l_w)))
    contrast = l_max - l_min
    edge = contrast > jnp.maximum(0.0312, l_max * 0.125)

    blur = 0.25 * (sh(ldr, -1, 0) + sh(ldr, 1, 0)
                   + sh(ldr, 0, 1) + sh(ldr, 0, -1))
    return jnp.where(edge[..., None], 0.5 * (ldr + blur), ldr)


def post_process(color, config: PostConfig = PostConfig()):
    """Full chain: exposure → bloom → tonemap → gamma → FXAA.
    color: [..., H, W, 3] linear HDR. Returns LDR in [0,1]."""
    exp = config.exposure
    if config.auto_exposure:
        exp = exp * auto_exposure(color, config.adaptation_key)[..., None]
    c = color * exp
    if config.bloom_strength > 0:
        c = bloom(c, config.bloom_threshold, config.bloom_strength,
                  config.bloom_radius)
    ldr = tonemap_aces(c)
    ldr = ldr ** (1.0 / config.gamma)
    if config.color_grading_lut is not None:
        ldr = color_grading(ldr, config.color_grading_lut,
                            config.color_grading_amount)
    if config.use_fxaa:
        ldr = fxaa(ldr)
    return ldr
