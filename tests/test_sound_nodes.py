"""Sound + Listener scene nodes → mixer glue (sound/scene.py).

Reference behavior: fyrox-impl/src/scene/sound/mod.rs (the Sound node
syncs its global position/gain/state into the sound context each frame)
and listener.rs (listener pose from the node's global). Here the sync is
a pure per-block function over node globals, batched over worlds.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fyrox_tpu.engine import Engine
from fyrox_tpu.scene import SceneBuilder
from fyrox_tpu.scene.template import NodeType
from fyrox_tpu.sound.engine import SAMPLE_RATE


def _tone(freq=440.0, seconds=0.5):
    t = np.arange(int(SAMPLE_RATE * seconds)) / SAMPLE_RATE
    return np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.5


class TestSoundNodes:
    def _scene(self, src_x=-3.0):
        sb = SceneBuilder()
        sb.add_listener("ears", position=(0, 0, 0))
        mover = sb.add_pivot("mover", position=(src_x, 0, 0))
        sb.add_sound(_tone(), name="beep", parent=mover, radius=1.0,
                     max_distance=50.0)
        return sb, mover

    def test_pan_flips_left_to_right(self):
        """A source crossing the listener on +X pans L → R (world +X is
        the listener's +X basis when un-rotated)."""
        sb, mover = self._scene(src_x=-3.0)
        eng = Engine(template=sb.build())
        st = eng.init_state(num_worlds=1)

        def energy_lr(state):
            block, state = eng.render_audio(state, block_len=256)
            b = np.asarray(block)[0]
            return float(np.mean(b[:, 0] ** 2)), float(np.mean(b[:, 1] ** 2)), state

        l0, r0, st = energy_lr(st)
        assert l0 > 2.0 * r0, (l0, r0)        # source on the left

        # move the source node across to +X and re-render
        st = st._replace(scene=st.scene._replace(
            position=st.scene.position.at[:, mover, 0].set(3.0)))
        from fyrox_tpu.scene import graph
        st = st._replace(scene=graph.update_hierarchical_data(
            st.scene, eng.template))
        l1, r1, st = energy_lr(st)
        assert r1 > 2.0 * l1, (l1, r1)        # source on the right

    def test_distance_attenuates(self):
        sb, mover = self._scene(src_x=1.0)
        eng = Engine(template=sb.build())
        near = eng.init_state(1)
        block_n, _ = eng.render_audio(near, block_len=256)
        far = eng.init_state(1)
        far = far._replace(scene=far.scene._replace(
            position=far.scene.position.at[:, mover, 0].set(20.0)))
        from fyrox_tpu.scene import graph
        far = far._replace(scene=graph.update_hierarchical_data(
            far.scene, eng.template))
        block_f, _ = eng.render_audio(far, block_len=256)
        en = float(jnp.sum(block_n ** 2))
        ef = float(jnp.sum(block_f ** 2))
        assert en > 10.0 * ef, (en, ef)

    def test_playhead_advances_batched(self):
        sb, _ = self._scene()
        eng = Engine(template=sb.build())
        st = eng.init_state(num_worlds=3)
        assert st.audio is not None
        _, st2 = eng.render_audio(st, block_len=128)
        np.testing.assert_allclose(np.asarray(st2.audio.playhead),
                                   np.full((3, 1), 128.0))

    def test_render_audio_jits_with_engine_step(self):
        """Audio threads through Engine.step and renders under jit."""
        sb, _ = self._scene()
        eng = Engine(template=sb.build())
        st = eng.init_state(1)

        @jax.jit
        def tick_and_listen(s):
            s = eng.step(s)
            return eng.render_audio(s, block_len=64)

        block, st2 = tick_and_listen(st)
        assert block.shape == (1, 64, 2)
        assert np.isfinite(np.asarray(block)).all()
        assert st2.audio is not None

    def test_listener_fallback_to_camera_warns(self):
        sb = SceneBuilder()
        sb.add_camera("cam", position=(5, 0, 0))
        sb.add_sound(_tone(), name="beep", position=(5, 0, -1))
        eng = Engine(template=sb.build())
        at = eng.audio_template()
        assert at.listener_node == sb._cameras["node"][0]

    def test_body_attached_source_pans_during_rollout(self):
        """Flagship-style flow: a physics body carries the source; the
        engine steps move it past the listener and the pan follows."""
        from fyrox_tpu.physics import world as wd, shapes as sh
        sb = SceneBuilder()
        sb.add_listener("ears", position=(0, 1, 0))
        bnode = sb.add_node("ball", node_type=NodeType.RIGID_BODY,
                            position=(-4, 1, 0))
        sb.add_sound(_tone(), name="engine_noise", parent=bnode)
        pb = wd.PhysicsBuilder()
        b = pb.add_body(node=bnode, position=(-4, 1, 0), gravity_scale=0.0)
        pb.add_collider(b, sh.BALL, [0.3])
        pt = pb.build(broadphase="dense")
        eng = Engine(template=sb.build(), physics=pt)
        st = eng.init_state(1)
        st = st._replace(physics=st.physics._replace(
            linvel=st.physics.linvel.at[:, b, 0].set(8.0)))
        sides = []
        for _ in range(4):
            for _ in range(15):                    # 0.25 s of motion
                st = eng.step(st)
            block, st = eng.render_audio(st, block_len=128)
            bl = np.asarray(block)[0]
            sides.append(float(np.mean(bl[:, 1] ** 2))
                         - float(np.mean(bl[:, 0] ** 2)))
        assert sides[0] < 0 < sides[-1], sides    # left first, right last

    def test_instantiate_remaps_sound_payloads(self):
        prefab = SceneBuilder()
        prefab.add_sound(_tone(300.0), name="a")
        host = SceneBuilder()
        host.add_sound(_tone(500.0), name="host_snd")
        host.add_listener("ears")
        host.instantiate(prefab, name_prefix="p1_")
        t = host.build()
        assert len(t.sound_buffers) == 2
        assert list(t.sounds["buffer"]) == [0, 1]
        snd_nodes = list(t.sounds["node"])
        for n in snd_nodes:
            assert t.node_type[n] == NodeType.SOUND
        assert t.names[snd_nodes[1]] == "p1_a"


class TestFlagshipAudio:
    def test_flagship_emits_audio_block(self):
        """VERDICT r3 #4 done-criterion: the flagship optionally emits an
        audio block alongside the rollout."""
        import jax
        from fyrox_tpu.models import build_flagship
        engine, _ = build_flagship(n_bones=8, n_verts=128, n_bodies=4,
                                   with_audio=True)
        st = engine.init_state(2)

        @jax.jit
        def tick_listen(s):
            s = engine.step(s)
            return engine.render_audio(s, block_len=128)

        block, st2 = tick_listen(st)
        assert block.shape == (2, 128, 2)
        assert float(jnp.max(jnp.abs(block))) > 0.0
        assert np.isfinite(np.asarray(block)).all()
