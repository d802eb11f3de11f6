"""Screen-space ambient occlusion.

Equivalent of the reference's ScreenSpaceAmbientOcclusionRenderer
(fyrox-impl/src/renderer/ssao/, wired at renderer/mod.rs:203): hemisphere
sampling against the G-buffer. This implementation works in world space
from the G-buffer's position/normal channels (no depth reconstruction
needed): for each pixel, sample points in the normal-oriented hemisphere,
project them to screen, and count how many land behind the stored surface.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["SsaoConfig", "compute_ssao"]


class SsaoConfig(NamedTuple):
    num_samples: int = 8
    radius: float = 0.5
    bias: float = 0.02
    power: float = 1.5
    seed: int = 0


def _hemisphere_kernel(n, seed):
    """Static sample kernel in tangent space (z up), biased toward the
    center like the reference's kernel."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2])
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    scale = (0.3 + 0.7 * (np.arange(n) / max(n - 1, 1)) ** 2)
    return (v * scale[:, None]).astype(np.float32)


def compute_ssao(gbuf, view_proj, cam_pos, config: SsaoConfig = SsaoConfig()):
    """AO factor [H,W] in [0,1] (1 = unoccluded) for one image
    (vmap over worlds). Uses gbuf.position/normal/mask + the camera vp and
    world-space camera position (depth comparisons run in world units —
    NDC depth is too nonlinear for a fixed bias)."""
    h, w = gbuf.depth.shape[-2:]
    pos = gbuf.position
    nrm = gbuf.normal

    # tangent basis per pixel
    up = jnp.where(jnp.abs(nrm[..., 1:2]) < 0.9,
                   jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t1 = jnp.cross(up, nrm)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
    t2 = jnp.cross(nrm, t1)

    kernel = jnp.asarray(_hemisphere_kernel(config.num_samples, config.seed))
    occluded = jnp.zeros(pos.shape[:-1], jnp.float32)
    valid = jnp.zeros(pos.shape[:-1], jnp.float32)

    # project helper
    def project(p):
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        c = jnp.einsum("ij,...j->...i", view_proj, ph, precision="highest")
        wc = jnp.maximum(jnp.abs(c[..., 3:4]), 1e-6) * jnp.sign(c[..., 3:4])
        ndc = c[..., :3] / wc
        u = (ndc[..., 0] * 0.5 + 0.5) * w
        v = (0.5 - ndc[..., 1] * 0.5) * h
        return u, v, ndc[..., 2], c[..., 3]

    cam = jnp.asarray(cam_pos)
    for k in range(config.num_samples):
        offs = (kernel[k, 0] * t1 + kernel[k, 1] * t2
                + kernel[k, 2] * nrm) * config.radius
        sample = pos + offs
        u, v, sz, sw = project(sample)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (sw > 0)
        ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
        stored_pos = gbuf.position[vi, ui]
        stored_hit = gbuf.mask[vi, ui]
        # world-space comparison: the stored surface occludes the sample
        # when it sits closer to the camera along the same screen ray
        d_sample = jnp.linalg.norm(sample - cam, axis=-1)
        d_stored = jnp.linalg.norm(stored_pos - cam, axis=-1)
        closer = stored_hit & (d_stored < d_sample - config.bias)
        in_range = (jnp.linalg.norm(stored_pos - pos, axis=-1)
                    < config.radius * 2.0)
        occluded = occluded + (closer & in_range & inside).astype(jnp.float32)
        valid = valid + inside.astype(jnp.float32)

    ao = 1.0 - occluded / jnp.maximum(valid, 1.0)
    ao = jnp.clip(ao, 0.0, 1.0) ** config.power
    return jnp.where(gbuf.mask, ao, 1.0)
