"""Textures + materials.

Equivalent of fyrox-texture (image decode into GPU-agnostic `Texture`
resources, lib.rs:44 incl. mip generation) and fyrox-material (`Material`
= shader + property bindings, fyrox-material/src/lib.rs:41-83). Textures
here are numpy/JAX arrays with a mip chain; sampling is a batched bilinear
gather usable inside shading.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

__all__ = ["Texture", "load_texture", "Material", "sample_bilinear",
           "sample_array_bilinear", "resize_bilinear"]


@dataclass
class Texture:
    """[H,W,4] float32 base level + box-filtered mip chain."""
    mips: List[np.ndarray]

    @property
    def base(self):
        return self.mips[0]

    @property
    def size(self):
        return self.mips[0].shape[1], self.mips[0].shape[0]

    @staticmethod
    def from_array(rgba: np.ndarray, build_mips: bool = True) -> "Texture":
        rgba = np.asarray(rgba, np.float32)
        if rgba.ndim == 2:
            rgba = np.repeat(rgba[..., None], 4, -1)
        if rgba.shape[-1] == 3:
            rgba = np.concatenate([rgba, np.ones_like(rgba[..., :1])], -1)
        mips = [rgba]
        if build_mips:
            cur = rgba
            while min(cur.shape[0], cur.shape[1]) > 1:
                h2, w2 = max(cur.shape[0] // 2, 1), max(cur.shape[1] // 2, 1)
                cur = cur[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2, 4).mean((1, 3))
                mips.append(cur)
        return Texture(mips)


def load_texture(path: str) -> Texture:
    """Decode an image file (PIL when available, PPM natively)."""
    if path.lower().endswith(".ppm"):
        with open(path, "rb") as f:
            assert f.readline().strip() == b"P6"
            dims = f.readline().split()
            w, h = int(dims[0]), int(dims[1])
            f.readline()
            data = np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)
        return Texture.from_array(data.astype(np.float32) / 255.0)
    from PIL import Image
    img = Image.open(path).convert("RGBA")
    return Texture.from_array(np.asarray(img, np.float32) / 255.0)


def sample_bilinear(tex, uv):
    """Bilinear sample: tex [H,W,C] (jnp), uv [...,2] in [0,1] (wrapping).
    Returns [...,C]."""
    tex = jnp.asarray(tex)
    h, w = tex.shape[0], tex.shape[1]
    u = jnp.mod(uv[..., 0], 1.0) * w - 0.5
    v = jnp.mod(uv[..., 1], 1.0) * h - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def at(y, x):
        return tex[jnp.mod(y, h), jnp.mod(x, w)]

    c00 = at(y0, x0)
    c10 = at(y0, x0 + 1)
    c01 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def sample_array_bilinear(tex_array, tid, uv):
    """Bilinear sample from a TEXTURE ARRAY: tex_array [NT,R,R,C], tid
    [...] int32 layer, uv [...,2] in [0,1] (wrapping). Returns [...,C].

    One flat gather over (layer, y, x) — the deferred pipeline's per-pixel
    material fetch (gbuffer.rs:57 binds per-instance texture sets; here
    every scene texture lives in one array and the layer id rides the
    G-buffer)."""
    tex_array = jnp.asarray(tex_array)
    nt, r = tex_array.shape[0], tex_array.shape[1]
    flat = tex_array.reshape(nt * r * r, tex_array.shape[-1])
    u = jnp.mod(uv[..., 0], 1.0) * r - 0.5
    v = jnp.mod(uv[..., 1], 1.0) * r - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def at(y, x):
        idx = (tid * r + jnp.mod(y, r)) * r + jnp.mod(x, r)
        return flat[idx]

    c00 = at(y0, x0)
    c10 = at(y0, x0 + 1)
    c01 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side bilinear resize of [H,W,C] to [size,size,C] (texture-array
    packing normalizes all scene textures to one resolution)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    if h == size and w == size:
        return img
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    c00 = img[y0][:, x0]
    c10 = img[y0][:, x1]
    c01 = img[y1][:, x0]
    c11 = img[y1][:, x1]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


@dataclass
class Material:
    """Shader properties + texture bindings (fyrox-material lib.rs:41-83).
    The 'standard' material maps straight onto the G-buffer channels."""
    name: str = "standard"
    albedo: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    metallic: float = 0.0
    roughness: float = 0.8
    emission: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    textures: Dict[str, Texture] = field(default_factory=dict)
    properties: Dict[str, float] = field(default_factory=dict)

    def bind(self, name: str, tex: Texture):
        self.textures[name] = tex
        return self

    def set_property(self, name: str, value: float):
        self.properties[name] = value
        return self
