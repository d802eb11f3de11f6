"""Per-world HUD: batched parametric overlays.

The host-side painter (ui/renderer.py) produces ONE static RGBA image —
fine for a shared HUD, but the batched regime needs per-world state on
screen (health bars, scores). Reference equivalent: each Fyrox scene
instance draws its own UI (fyrox-impl/src/renderer/ui_renderer.rs); here
one HudTemplate holds the static layer plus *parametric* elements whose
per-world scalars are bound at render time, producing a [W,H,Wd,4] batch
on-device:

  * add_bar(key, ...):     rect whose filled width is value∈[0,1] — a
                           static coverage ramp compared against the bound
                           scalar (pure elementwise, no scatters)
  * add_counter(key, ...): fixed-width decimal readout — a prerendered
                           [10, gh, gw] glyph bank gathered per digit per
                           world and blended at static offsets

`compose_over` (ui/renderer.py) already broadcasts: frames [W,H,Wd,3] ×
overlay [W,H,Wd,4] compose directly.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.ui.renderer import FONT_5X7, render_ui

__all__ = ["Hud"]


class Hud:
    """Builder + renderer for a batched HUD overlay."""

    def __init__(self, height: int, width: int):
        self.height = int(height)
        self.width = int(width)
        self._static_cmds: List = []
        self._bars: List[dict] = []
        self._counters: List[dict] = []
        self._static_img = None

    # -- static layer (painted once, host-side) ---------------------------
    def add_static(self, commands) -> "Hud":
        """Draw commands (ui/core.DrawCommand list) shared by all worlds."""
        self._static_cmds.extend(commands)
        self._static_img = None
        return self

    # -- parametric elements ----------------------------------------------
    def add_bar(self, key: str, x: int, y: int, w: int, h: int,
                color=(0.9, 0.2, 0.2, 0.9),
                background=(0.1, 0.1, 0.1, 0.6)) -> "Hud":
        """Horizontal fill bar; bound value in [0,1] is the filled
        fraction (left → right)."""
        self._bars.append(dict(key=key, x=int(x), y=int(y), w=int(w),
                               h=int(h), color=tuple(color),
                               background=tuple(background)))
        return self

    def add_counter(self, key: str, x: int, y: int, digits: int = 5,
                    scale: int = 2, color=(1.0, 1.0, 1.0, 1.0)) -> "Hud":
        """Fixed-width decimal readout; bound value is a non-negative
        number (leading zeros shown, fractional part truncated)."""
        self._counters.append(dict(key=key, x=int(x), y=int(y),
                                   digits=int(digits), scale=int(scale),
                                   color=tuple(color)))
        return self

    # -- internals ----------------------------------------------------------
    def _static(self) -> np.ndarray:
        if self._static_img is None:
            img = render_ui(self._static_cmds, self.height, self.width)
            # bar backgrounds belong to the static layer
            for b in self._bars:
                r, g, bl, a = b["background"]
                dst = img[b["y"]:b["y"] + b["h"], b["x"]:b["x"] + b["w"]]
                dst[..., :3] = dst[..., :3] * (1 - a) + np.asarray([r, g, bl]) * a
                dst[..., 3] = 1.0 - (1.0 - dst[..., 3]) * (1.0 - a)
            self._static_img = img
        return self._static_img

    @staticmethod
    def _glyph_bank(scale: int, color) -> np.ndarray:
        """[10, 7*scale, 6*scale, 4] prerendered digit glyphs."""
        gh, gw = 7 * scale, 6 * scale
        bank = np.zeros((10, gh, gw, 4), np.float32)
        rgba = np.asarray(color, np.float32)
        for d in range(10):
            glyph = FONT_5X7[str(d)]
            for row, bits in enumerate(glyph):
                for col in range(5):
                    if bits & (1 << (4 - col)):
                        bank[d, row * scale:(row + 1) * scale,
                             col * scale:(col + 1) * scale] = rgba
        return bank

    def render(self, values: Dict[str, jnp.ndarray]):
        """Bind per-world scalars → [W, H, Wd, 4] overlay batch (jittable).

        values[key]: [W] array for every bar (fraction) / counter (number)
        key declared on this HUD."""
        keys = ([b["key"] for b in self._bars]
                + [c["key"] for c in self._counters])
        missing = [k for k in keys if k not in values]
        if missing:
            raise KeyError(f"HUD values missing bindings: {missing}")
        w_batch = jnp.asarray(values[keys[0]]).shape[0] if keys else 1
        img = jnp.broadcast_to(jnp.asarray(self._static()),
                               (w_batch, self.height, self.width, 4))

        def blend(dst, src_rgb, src_a):
            a = src_a[..., None]
            rgb = dst[..., :3] * (1 - a) + src_rgb * a
            al = 1.0 - (1.0 - dst[..., 3:]) * (1.0 - a)
            return jnp.concatenate([rgb, al], -1)

        for b in self._bars:
            f = jnp.clip(jnp.asarray(values[b["key"]], jnp.float32), 0.0, 1.0)
            ys = np.zeros((self.height, self.width), np.float32)
            ys[b["y"]:b["y"] + b["h"], b["x"]:b["x"] + b["w"]] = 1.0
            ramp = np.ones((self.height, self.width), np.float32)
            ramp[:, b["x"]:b["x"] + b["w"]] = (
                np.arange(b["w"], dtype=np.float32) + 1.0) / b["w"]
            filled = (jnp.asarray(ramp)[None] <= f[:, None, None])
            alpha = jnp.asarray(ys)[None] * filled * b["color"][3]
            img = blend(img, jnp.asarray(b["color"][:3], jnp.float32), alpha)

        for c in self._counters:
            bank = jnp.asarray(self._glyph_bank(c["scale"], c["color"]))
            gh, gw = bank.shape[1], bank.shape[2]
            val = jnp.maximum(jnp.asarray(values[c["key"]]), 0).astype(
                jnp.int32)
            for i in range(c["digits"]):
                div = 10 ** (c["digits"] - 1 - i)
                d = (val // div) % 10
                glyphs = bank[d]                      # [W, gh, gw, 4]
                x0 = c["x"] + i * gw
                if x0 + gw > self.width or c["y"] + gh > self.height:
                    continue
                region = jax.lax.dynamic_slice(
                    img, (0, c["y"], x0, 0), (w_batch, gh, gw, 4))
                blended = blend(region, glyphs[..., :3], glyphs[..., 3])
                img = jax.lax.dynamic_update_slice(
                    img, blended, (0, c["y"], x0, 0))
        return img
