"""Real font pipeline (ui/font.py): TTF parse → rasterize → atlas →
renderer glyphs → proportional FormattedText metrics.

Loads the reference's in-tree built-in font as a data asset
(fyrox-ui/src/font/built_in_font.ttf), the way io tests load its .rgs
scenes. Ref: fyrox-ui/src/font/mod.rs (fontdue atlas path),
formatted_text.rs (metric-driven layout).
"""
import os

import numpy as np
import pytest

FONT = "/root/reference/fyrox-ui/src/font/built_in_font.ttf"
pytestmark = pytest.mark.skipif(not os.path.exists(FONT),
                                reason="reference font asset not present")


@pytest.fixture(scope="module")
def font():
    from fyrox_tpu.ui.font import TtfFont
    return TtfFont(FONT)


def test_parse_tables(font):
    assert font.units_per_em in (1000, 2000, 2048)
    assert font.num_glyphs > 90
    assert font.ascent > 0 > font.descent
    # cmap covers printable ASCII
    for ch in "AZaz09 !?":
        assert font.glyph_index(ch) > 0, ch


def test_rasterize_two_sizes(font):
    img32, m32 = font.rasterize("A", 32)
    img16, m16 = font.rasterize("A", 16)
    assert img32.shape[0] > 1.6 * img16.shape[0]      # scales with size
    assert 1.0 >= img32.max() > 0.9                   # solid interior
    assert m32["advance"] > m16["advance"]
    # coverage scales ~quadratically with size
    assert 2.5 < img32.sum() / max(img16.sum(), 1e-6) < 6.0
    # 'A' has a hole (the counter): some interior row crosses
    # ink-gap-ink; the 5x7 fallback could never produce antialiasing
    assert ((img32 > 0.0) & (img32 < 1.0)).any()


def test_proportional_advances(font):
    from fyrox_tpu.ui.font import FontAtlas
    at = FontAtlas(font, 20)
    assert at.glyphs["W"]["advance"] > 1.5 * at.glyphs["i"]["advance"]
    w_hello, h = at.measure("Hello")
    assert w_hello > 0 and h == pytest.approx(at.line_height)
    # measure is the sum of advances + kerning
    w_wide, _ = at.measure("WWWWW")
    w_thin, _ = at.measure("iiiii")
    assert w_wide > 2.0 * w_thin


def test_renderer_golden_pixels(font):
    """Text draws through the atlas at two sizes with real coverage in
    the expected glyph boxes — and produces antialiased edges."""
    from fyrox_tpu.ui.core import DrawCommand, Rect
    from fyrox_tpu.ui.renderer import render_ui
    cmds = [DrawCommand(kind="text", bounds=Rect(4, 2, 180, 30),
                        text="Hello Ab 12", color=(1, 1, 1, 1)),
            DrawCommand(kind="text", bounds=Rect(4, 40, 180, 15),
                        text="Hello Ab 12", color=(1, 0, 0, 1))]
    img = render_ui(cmds, 64, 200, font=font)
    big = img[2:34, :, 3]
    small = img[40:56, :, 3]
    assert big.sum() > 2.0 * small.sum()              # size responds
    assert img[40:56, :, 0].max() > 0.5               # red row drew red
    assert img[40:56, :, 1].max() < 0.5
    # antialiasing: fractional alpha present
    assert ((big > 0.05) & (big < 0.95)).any()
    # fallback path still works without a font
    img2 = render_ui(cmds, 64, 200)
    assert img2[..., 3].sum() > 0


def test_formatted_text_with_font_metrics(font):
    from fyrox_tpu.ui.font import FontAtlas
    from fyrox_tpu.ui.text import FormattedText
    at = FontAtlas(font, 16)
    ft = FormattedText("The quick brown fox jumps over the lazy dog",
                       font_size=16, wrap="word", constraint=(120.0,
                                                              1e9),
                       font=at)
    assert len(ft.lines) >= 3                          # wrapped
    for ln in ft.lines:
        assert ln.width <= 120.0 + 1e-3                # honors constraint
    # caret round-trip at a mid-text index
    idx = 10
    x, y = ft.caret_to_xy(idx)
    assert ft.xy_to_caret(x + 0.1, y + 1.0) == idx
    # proportional: a W-heavy line is wider than an i-heavy line of the
    # same char count
    wide = FormattedText("WWWW", font_size=16, font=at)
    thin = FormattedText("iiii", font_size=16, font=at)
    assert wide.lines[0].width > 2.0 * thin.lines[0].width
