"""Reflection probes: six-face environment capture + ambient irradiance.

Equivalent of the reference's ReflectionProbe node + renderer support
(fyrox-impl/src/scene/probe.rs:135; renderer convolution.rs computes the
specular/diffuse convolutions of the captured cube). The TPU version:

  * `capture_probe` renders the scene's emissive/albedo color from the
    probe position into 6 low-res faces (unlit capture — probes update
    rarely, and ambient bounce is a low-frequency signal),
  * `face_irradiance` integrates each face to one RGB irradiance value
    (the heavy convolution collapses to a 6-lobe cosine basis),
  * `apply_probe_ambient` adds albedo * Σ faces irradiance·max(0, n·d)
    to a shaded image — the diffuse IBL term.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.render import raster as raster_mod
from fyrox_tpu.render import shadows as shadows_mod

__all__ = ["capture_probe", "face_irradiance", "apply_probe_ambient",
           "prefilter_specular", "apply_probe_specular", "face_texel_dirs",
           "FACE_DIRS"]

FACE_DIRS = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)


def capture_probe(world_tri_positions, tri_attrs, position, face_size=32,
                  tri_valid=None, chunk=64, z_far=200.0):
    """[6, S, S, 3] color faces captured from `position`.

    world_tri_positions [T,3,3] (one world); tri_attrs as for
    raster.rasterize (albedo/emission carry the capture color)."""
    vps = shadows_mod.point_vps(jnp.asarray(position), z_far=z_far)
    faces = []
    for f in range(6):
        clip = raster_mod.transform_clip(world_tri_positions, vps[f][None])
        g = raster_mod.rasterize(clip, tri_attrs, face_size, face_size,
                                 tri_valid=tri_valid, chunk=chunk,
                                 backface_cull=False)
        col = (g.albedo + g.emission) * g.mask[..., None]
        faces.append(col)
    return jnp.stack(faces, 0)


def face_irradiance(faces):
    """[6,3] mean RGB per face (the cosine-lobe diffuse basis)."""
    return jnp.mean(faces, axis=(1, 2))


def apply_probe_ambient(color, gbuf, irradiance, strength=1.0,
                        bounds=None, probe_inv=None):
    """Diffuse IBL: color += albedo * Σ_f irr[f] * max(0, n·dir_f).

    bounds/probe_inv: optionally restrict to pixels whose world position
    falls inside the probe's (inverse-transformed) unit box — the
    reference's probe bounding volume semantics."""
    n = gbuf.normal
    w = jnp.zeros(color.shape[:-1] + (3,))
    dirs = jnp.asarray(FACE_DIRS)
    irr = jnp.asarray(irradiance)
    acc = jnp.zeros_like(color)
    for f in range(6):
        ndl = jnp.clip(jnp.sum(n * dirs[f], -1), 0.0, 1.0)
        acc = acc + irr[f] * ndl[..., None]
    term = gbuf.albedo * acc * (strength / 3.0) * gbuf.mask[..., None]
    if probe_inv is not None:
        from fyrox_tpu.core import transform as tfm
        pl = tfm.transform_point(probe_inv[None, None], gbuf.position)
        inside = jnp.all(jnp.abs(pl) <= 0.5, axis=-1)
        term = term * inside[..., None]
    return color + term


# --------------------------------------------------------------------------
# specular IBL (renderer convolution.rs: specular prefilter of the captured
# cube). TPU redesign: instead of GGX importance sampling per texel, each
# roughness level is an EXACT normalized cosine-power (Phong-lobe)
# convolution of the capture, expressed as one [out_dirs, in_dirs] matmul —
# the whole prefilter rides the MXU. Roughness maps to lobe exponent via
# alpha = 2/r^4 - 2 (the standard Phong<->Beckmann fit), and shading picks
# the two nearest prefiltered levels and lerps.
# --------------------------------------------------------------------------

_CUBE_AXES = {
    # face -> (forward, right, up) for texel direction reconstruction
    0: ((1, 0, 0), (0, 0, -1), (0, 1, 0)),
    1: ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),
    2: ((0, 1, 0), (1, 0, 0), (0, 0, -1)),
    3: ((0, -1, 0), (1, 0, 0), (0, 0, 1)),
    4: ((0, 0, 1), (1, 0, 0), (0, 1, 0)),
    5: ((0, 0, -1), (-1, 0, 0), (0, 1, 0)),
}


def face_texel_dirs(size):
    """[6, S, S, 3] unit direction of every cube-face texel (numpy)."""
    u = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    out = np.zeros((6, size, size, 3), np.float32)
    for f, (fwd, right, up) in _CUBE_AXES.items():
        fwd, right, up = (np.asarray(v, np.float32) for v in (fwd, right, up))
        d = (fwd[None, None]
             + u[None, :, None] * right[None, None]
             - u[:, None, None] * up[None, None])
        out[f] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return out


# per-texel solid angle is approximately uniform at the low capture sizes
# probes use; the cosine-power weights below fold the normalization in.
def prefilter_specular(faces, roughness_levels=(0.1, 0.3, 0.6, 1.0),
                       out_size=8):
    """Prefilter captured faces into R roughness levels.

    faces: [6,S,S,3] → returns [R, 6, out_size, out_size, 3]. Each level r
    is conv(env, lobe): out[d] = Σ_s env[s]·max(0,d·s)^α(r) / Σ_s w — an
    [O,I] x [I,3] matmul with O = 6·out_size², I = 6·S².
    """
    s_in = faces.shape[1]
    din = jnp.asarray(face_texel_dirs(s_in).reshape(-1, 3))     # [I,3]
    dout = jnp.asarray(face_texel_dirs(out_size).reshape(-1, 3))  # [O,3]
    env = faces.reshape(-1, 3)                                   # [I,3]
    cos = jnp.clip(jnp.einsum("od,id->oi", dout, din,
                              precision="highest"), 0.0, 1.0)    # [O,I]
    # exponent cap: beyond the capture's angular resolution a sharper lobe
    # just underflows f32 (cos^20000 == 0 for every texel); ~8 texels per
    # lobe keeps the integral well-conditioned
    alpha_max = 2.0 * (3.0 * s_in) ** 2 / np.pi ** 2
    levels = []
    for r in roughness_levels:
        alpha = 2.0 / max(float(r), 1e-3) ** 4 - 2.0
        alpha = min(max(alpha, 0.0), alpha_max)
        if alpha > 0:
            # pow via exp/log keeps gradients and avoids denormal stalls
            w = jnp.exp(jnp.float32(alpha)
                        * jnp.log(jnp.maximum(cos, 1e-6)))
        else:
            w = jnp.ones_like(cos)
        w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-8)
        levels.append((w @ env).reshape(6, out_size, out_size, 3))
    return jnp.stack(levels, 0)


def _sample_cube(faces, dirs):
    """Nearest-texel cube lookup. faces [6,S,S,3], dirs [...,3] → [...,3].
    Face picked by dominant axis (same scheme as the point-shadow cube)."""
    s = faces.shape[1]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    ax = jnp.abs(d)
    dom = jnp.argmax(ax, axis=-1)
    face = jnp.where(dom == 0, jnp.where(d[..., 0] >= 0, 0, 1),
             jnp.where(dom == 1, jnp.where(d[..., 1] >= 0, 2, 3),
                       jnp.where(d[..., 2] >= 0, 4, 5)))
    axes = np.asarray([_CUBE_AXES[f] for f in range(6)],
                      np.float32)                                # [6,3,3]
    fwd = jnp.asarray(axes[:, 0])[face]
    right = jnp.asarray(axes[:, 1])[face]
    up = jnp.asarray(axes[:, 2])[face]
    denom = jnp.maximum(jnp.sum(d * fwd, -1), 1e-6)
    pu = jnp.sum(d * right, -1) / denom
    pv = -jnp.sum(d * up, -1) / denom
    ui = jnp.clip(((pu * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    vi = jnp.clip(((pv * 0.5 + 0.5) * s).astype(jnp.int32), 0, s - 1)
    return faces[face, vi, ui]


def apply_probe_specular(color, gbuf, cam_pos, prefiltered,
                         roughness_levels=(0.1, 0.3, 0.6, 1.0),
                         strength=1.0, probe_inv=None):
    """Specular IBL: color += F(n·v) · env(reflect(v,n), roughness).

    prefiltered: [R,6,S,S,3] from prefilter_specular. Per pixel the two
    bracketing roughness levels are sampled and lerped; Fresnel-Schlick
    with F0 = mix(0.04, albedo, metallic)."""
    n = gbuf.normal
    v = cam_pos[None, None] - gbuf.position
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    refl = 2.0 * jnp.sum(n * v, -1, keepdims=True) * n - v
    rough = gbuf.material[..., 1]
    metal = gbuf.material[..., 0]

    samples = jnp.stack([_sample_cube(prefiltered[i], refl)
                         for i in range(prefiltered.shape[0])], 0)  # [R,H,W,3]
    lv = jnp.asarray(roughness_levels, jnp.float32)
    idx = jnp.clip(jnp.searchsorted(lv, rough) - 1, 0, lv.shape[0] - 2)
    r0 = lv[idx]
    r1 = lv[idx + 1]
    t = jnp.clip((rough - r0) / jnp.maximum(r1 - r0, 1e-6), 0.0, 1.0)
    s0 = jnp.take_along_axis(samples, idx[None, ..., None], axis=0)[0]
    s1 = jnp.take_along_axis(samples, (idx + 1)[None, ..., None], axis=0)[0]
    env = s0 * (1 - t[..., None]) + s1 * t[..., None]

    ndv = jnp.clip(jnp.sum(n * v, -1), 0.0, 1.0)
    f0 = 0.04 * (1 - metal[..., None]) + gbuf.albedo * metal[..., None]
    fres = f0 + (1.0 - f0) * (1.0 - ndv[..., None]) ** 5
    term = env * fres * strength * gbuf.mask[..., None]
    if probe_inv is not None:
        from fyrox_tpu.core import transform as tfm
        pl = tfm.transform_point(probe_inv[None, None], gbuf.position)
        inside = jnp.all(jnp.abs(pl) <= 0.5, axis=-1)
        term = term * inside[..., None]
    return color + term
