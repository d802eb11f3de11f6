"""Per-world HUD overlays (ui/hud.py) — VERDICT r3 weak #5.

The batched regime needs per-world UI state (health bars, scores); one
HudTemplate binds [W] scalars at render time and produces a [W,H,Wd,4]
overlay batch on-device (reference per-scene UI draw:
fyrox-impl/src/renderer/ui_renderer.rs).
"""
import numpy as np
import jax
import jax.numpy as jnp

from fyrox_tpu.ui.hud import Hud
from fyrox_tpu.ui.renderer import compose_over


def _bar_fill_fraction(img, x, y, w, h, color):
    """Fraction of the bar rect whose pixels match the fill color."""
    region = img[y:y + h, x:x + w, :3]
    hit = np.all(np.abs(region - np.asarray(color[:3])) < 0.15, axis=-1)
    return hit.mean()


class TestHud:
    def test_four_worlds_four_health_values(self):
        hud = Hud(64, 128).add_bar("health", x=8, y=8, w=100, h=6,
                                   color=(0.9, 0.2, 0.2, 1.0))
        vals = jnp.asarray([0.0, 0.25, 0.5, 1.0])
        out = np.asarray(hud.render({"health": vals}))
        assert out.shape == (4, 64, 128, 4)
        fracs = [_bar_fill_fraction(out[i], 8, 8, 100, 6, (0.9, 0.2, 0.2))
                 for i in range(4)]
        np.testing.assert_allclose(fracs, [0.0, 0.25, 0.5, 1.0], atol=0.03)

    def test_counter_digits_differ_per_world(self):
        hud = Hud(48, 160).add_counter("score", x=4, y=4, digits=3, scale=2)
        out = np.asarray(hud.render({"score": jnp.asarray([7, 42, 987])}))
        # different scores produce different glyph coverage
        lit = (out[..., 3] > 0.5).reshape(3, -1).sum(1)
        assert lit[0] != lit[1] != lit[2]
        # world 0 ("007") and world 2 ("987") share no leading-zero pattern
        assert not np.array_equal(out[0], out[2])

    def test_render_is_jittable_and_composes(self):
        hud = (Hud(32, 64)
               .add_bar("hp", x=2, y=2, w=60, h=4)
               .add_counter("score", x=2, y=12, digits=2, scale=1))

        @jax.jit
        def overlay(hp, score, frames):
            img = hud.render({"hp": hp, "score": score})
            return compose_over(frames, img)

        frames = jnp.zeros((2, 32, 64, 3))
        out = overlay(jnp.asarray([0.5, 1.0]), jnp.asarray([1, 99]), frames)
        assert out.shape == (2, 32, 64, 3)
        a = np.asarray(out)
        assert not np.array_equal(a[0], a[1])     # per-world difference

    def test_missing_binding_raises(self):
        hud = Hud(16, 16).add_bar("hp", 0, 0, 8, 2)
        import pytest
        with pytest.raises(KeyError):
            hud.render({})

    def test_shared_static_layer_still_works(self):
        from fyrox_tpu.ui.core import DrawCommand, Rect
        hud = Hud(32, 32)
        hud.add_static([DrawCommand(kind="rect", bounds=Rect(0, 0, 32, 8),
                                    color=(0.0, 0.5, 0.0, 1.0))])
        hud.add_bar("hp", x=2, y=20, w=28, h=4)
        out = np.asarray(hud.render({"hp": jnp.asarray([0.5, 0.5])}))
        np.testing.assert_array_equal(out[0], out[1])
        assert (out[0, :8, :, 1] > 0.3).mean() > 0.9   # static green strip
