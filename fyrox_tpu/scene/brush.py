"""Terrain brush editing.

Equivalent of the reference's brushstroke system (fyrox-impl/src/scene/
terrain/brushstroke/mod.rs: BrushShape :695, BrushMode :735, BrushTarget
:768, Brush :782 with hardness/alpha/2x2 transform; strokes accumulate
per-pixel max opacity). The TPU redesign replaces the pixel-message
thread + hash-map StrokeData with one batched update: a stroke is a set
of stamp centers, per-texel opacity is the max over stamps of the
shape's falloff, and each mode is a pure functional blend over the whole
grid — no scatter, no host loop, jit/vmap-friendly.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ["Brush", "stroke_opacity", "apply_stroke"]


@dataclass
class Brush:
    """Brush state (brushstroke/mod.rs:782).

    shape: "circle" (radius) or "rect" (width, length)
    mode:  "raise" (amount) | "flatten" | "assign" (value)
           | "smooth" (kernel_radius)
    target: "height" | "layer" | "hole" — selects which array the caller
           passes to apply_stroke; the math is target-independent.
    hardness: 0 = fades from center, 1 = hard edge.  alpha: stroke opacity.
    transform: 2x2 matrix warping the brush footprint (ellipses etc.).
    """
    shape: str = "circle"
    radius: float = 1.0
    width: float = 1.0
    length: float = 1.0
    mode: str = "raise"
    amount: float = 1.0
    value: float = 0.0
    kernel_radius: int = 1
    target: str = "height"
    hardness: float = 0.0
    alpha: float = 1.0
    transform: Tuple[Tuple[float, float], Tuple[float, float]] = \
        ((1.0, 0.0), (0.0, 1.0))


def _texel_grid(shape, cell_size, origin):
    h, w = shape
    xs = jnp.arange(w, dtype=jnp.float32) * cell_size + origin[0]
    zs = jnp.arange(h, dtype=jnp.float32) * cell_size + origin[1]
    return jnp.meshgrid(xs, zs)          # [H,W] each


def stroke_opacity(grid_shape, brush: Brush, points, cell_size=1.0,
                   origin=(0.0, 0.0)):
    """Per-texel stroke opacity [H,W] ∈ [0,1].

    points: [P,2] world-space stamp centers (a stroke's sampled path).
    Opacity is the max over stamps (StrokeData keeps max alpha), scaled
    by brush.alpha, with the hardness-controlled edge falloff."""
    px, pz = _texel_grid(grid_shape, cell_size, origin)
    pts = jnp.asarray(points, jnp.float32).reshape(-1, 2)
    inv = jnp.asarray(np.linalg.inv(np.asarray(brush.transform,
                                               np.float32)))
    dx = px[None] - pts[:, 0, None, None]          # [P,H,W]
    dz = pz[None] - pts[:, 1, None, None]
    wx = inv[0, 0] * dx + inv[0, 1] * dz
    wz = inv[1, 0] * dx + inv[1, 1] * dz
    if brush.shape == "circle":
        d = jnp.sqrt(wx * wx + wz * wz) / max(brush.radius, 1e-6)
    elif brush.shape == "rect":
        d = jnp.maximum(jnp.abs(wx) / max(brush.width * 0.5, 1e-6),
                        jnp.abs(wz) / max(brush.length * 0.5, 1e-6))
    else:
        raise ValueError(f"unknown brush shape {brush.shape!r}")
    soft = max(1.0 - float(brush.hardness), 1e-6)
    fall = jnp.clip((1.0 - d) / soft, 0.0, 1.0)
    return jnp.max(fall, axis=0) * brush.alpha


def _box_blur(data, r):
    """Mean over the (2r+1)² neighborhood via two separable passes of
    shifted adds (BrushMode::Smooth kernel_radius semantics)."""
    if r <= 0:
        return data
    out = data
    for axis in (0, 1):
        acc = jnp.zeros_like(out)
        for s in range(-r, r + 1):
            acc = acc + jnp.roll(out, s, axis=axis)
        out = acc / (2 * r + 1)
    return out


def apply_stroke(data, brush: Brush, points, cell_size=1.0,
                 origin=(0.0, 0.0), flatten_value=None):
    """Apply one brush stroke to a [H,W] array (height map, layer mask or
    hole mask per brush.target) and return the updated array.

    flatten_value: Flatten's target level; defaults to the data value at
    the first stamp center (the reference flattens to the height sampled
    at stroke start)."""
    data = jnp.asarray(data, jnp.float32)
    w = stroke_opacity(data.shape, brush, points, cell_size, origin)
    if brush.mode == "raise":
        return data + w * brush.amount
    if brush.mode == "assign":
        return data * (1 - w) + brush.value * w
    if brush.mode == "flatten":
        if flatten_value is None:
            p0 = jnp.asarray(points, jnp.float32).reshape(-1, 2)[0]
            i = jnp.clip(((p0[1] - origin[1]) / cell_size).astype(jnp.int32),
                         0, data.shape[0] - 1)
            j = jnp.clip(((p0[0] - origin[0]) / cell_size).astype(jnp.int32),
                         0, data.shape[1] - 1)
            flatten_value = data[i, j]
        return data * (1 - w) + flatten_value * w
    if brush.mode == "smooth":
        sm = _box_blur(data, int(brush.kernel_radius))
        return data * (1 - w) + sm * w
    raise ValueError(f"unknown brush mode {brush.mode!r}")
