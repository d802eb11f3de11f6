"""Volumetric light scattering (light shafts).

Equivalent of the reference's light-volume pass
(fyrox-impl/src/renderer/light_volume.rs): the GL renderer ray-marches
light cones against the depth buffer. The screen-space formulation here
is the classic radial-blur scattering estimator (Mitchell's "god rays"),
which fits a data-parallel rasterizer: occlusion mask from the G-buffer
depth, N samples accumulated along the pixel→light screen ray with
exponential decay, added to the lit image.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["light_shafts"]


def light_shafts(color, gbuf_mask, light_clip, light_color,
                 n_samples=24, density=0.9, decay=0.95, weight=0.04,
                 exposure=1.0):
    """Additive screen-space light shafts for one light.

    color [H,W,3]; gbuf_mask [H,W] (True where geometry occludes);
    light_clip [4] the light's clip-space position (from vp @ pos);
    light_color [3]. Returns color + shafts.

    Sampling runs on a fixed grid of bilinear taps toward the light's
    screen position — all gathers are static-stride resamples, no
    data-dependent indexing.
    """
    h, w = gbuf_mask.shape
    lw = light_clip[3]
    behind = lw <= 1e-6
    ndc = light_clip[:3] / jnp.where(behind, 1.0, lw)
    lx = (ndc[0] * 0.5 + 0.5) * w
    ly = (0.5 - ndc[1] * 0.5) * h

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    # "sky" (unoccluded) pixels emit light; geometry blocks it
    emissive = (~gbuf_mask).astype(jnp.float32)

    dx = (lx - px) / n_samples * density
    dy = (ly - py) / n_samples * density

    def tap(i, acc_and_decay):
        acc, dec = acc_and_decay
        sx = px + dx * i
        sy = py + dy * i
        x0 = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
        # nearest-tap sample of the emissive mask: a gather with
        # monotone per-row indices — XLA handles this image resample fine
        s = emissive[y0, x0]
        acc = acc + s * dec * weight
        return acc, dec * decay

    acc = jnp.zeros((h, w))
    dec = jnp.ones(())
    for i in range(n_samples):
        acc, dec = tap(float(i), (acc, dec))
    shaft = acc * exposure * (~behind).astype(jnp.float32)
    return color + shaft[..., None] * jnp.asarray(light_color)
