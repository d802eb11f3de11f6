"""Colors + gradients, batched.

Equivalent of fyrox-core/src/color.rs (RGBA + HSV conversions) and
color_gradient.rs (piecewise-linear gradients used by particle systems).
Colors are float32 arrays [..., 4] in linear space, 0..1.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["from_rgba8", "to_rgba8", "hsv_to_rgb", "rgb_to_hsv",
           "ColorGradient", "sample_gradient", "srgb_to_linear",
           "linear_to_srgb"]


def from_rgba8(r, g, b, a=255):
    return jnp.asarray([r, g, b, a], jnp.float32) / 255.0


def to_rgba8(c):
    return jnp.clip(jnp.round(c * 255.0), 0, 255).astype(jnp.uint8)


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.maximum(c, 1e-8) ** (1 / 2.4) - 0.055)


def hsv_to_rgb(h, s, v):
    """h in degrees [0,360), s/v in [0,1]; batched."""
    h = jnp.mod(h, 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], -1)


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, jnp.mod((g - b) / safe_d, 6.0),
                  jnp.where(mx == g, (b - r) / safe_d + 2.0,
                            (r - g) / safe_d + 4.0)) * 60.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], -1)


class ColorGradient(NamedTuple):
    """Sorted gradient points (color_gradient.rs:299)."""
    locations: jnp.ndarray   # [K]
    colors: jnp.ndarray      # [K,4]

    @staticmethod
    def pack(points):
        """points: list of (t, (r,g,b,a))"""
        pts = sorted(points, key=lambda p: p[0])
        return ColorGradient(
            locations=jnp.asarray([p[0] for p in pts], jnp.float32),
            colors=jnp.asarray([p[1] for p in pts], jnp.float32))


def sample_gradient(g: ColorGradient, t):
    """Piecewise-linear sample, clamped at the ends; batched over t."""
    t = jnp.asarray(t, jnp.float32)
    k = g.locations.shape[0]
    right = jnp.clip(jnp.searchsorted(g.locations, t, side="right"), 1, k - 1)
    left = right - 1
    t0 = g.locations[left]
    t1 = g.locations[right]
    f = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-8), 0.0, 1.0)
    c = g.colors[left] + (g.colors[right] - g.colors[left]) * f[..., None]
    c = jnp.where((t <= g.locations[0])[..., None], g.colors[0], c)
    return jnp.where((t >= g.locations[-1])[..., None], g.colors[-1], c)
