"""Editor session: gizmo commands, outliner, play-mode preview
(editor/src/lib.rs:329 Mode, scene/commands/graph.rs, world outliner)."""
import numpy as np
import jax.numpy as jnp

from fyrox_tpu.editor import EditorSession
from fyrox_tpu.engine import Engine
from fyrox_tpu.physics import BALL, HALFSPACE, BodyType, PhysicsBuilder
from fyrox_tpu.scene import SceneBuilder


def session():
    sb = SceneBuilder()
    ground = sb.add_pivot("ground")
    child = sb.add_node("child", position=(1.0, 0.0, 0.0), parent=ground)
    pb = PhysicsBuilder()
    g = pb.add_body(node=ground, body_type=BodyType.STATIC)
    pb.add_collider(g, HALFSPACE, [])
    ball = sb.add_node("ball", position=(0.0, 3.0, 0.0),
                       bbox=(np.full(3, -0.5), np.full(3, 0.5)))
    bi = pb.add_body(node=ball, position=(0.0, 3.0, 0.0))
    pb.add_collider(bi, BALL, [0.5])
    eng = Engine(template=sb.build(), physics=pb.build())
    es = EditorSession(eng, eng.init_state(num_worlds=1))
    return es, dict(ground=ground, child=child, ball=ball)


class TestGizmoCommands:
    def test_translate_undo_redo(self):
        es, n = session()
        before = float(es.state.scene.position[0, n["ball"], 1])
        es.translate(n["ball"], (0.0, 2.0, 0.0))
        assert abs(float(es.state.scene.position[0, n["ball"], 1])
                   - before - 2.0) < 1e-6
        es.undo()
        assert abs(float(es.state.scene.position[0, n["ball"], 1])
                   - before) < 1e-6
        es.redo()
        assert abs(float(es.state.scene.position[0, n["ball"], 1])
                   - before - 2.0) < 1e-6

    def test_translate_parent_moves_child_global(self):
        es, n = session()
        es.translate(n["ground"], (0.0, 0.0, 5.0))
        gz = float(es.state.scene.globals_[0, n["child"], 2, 3])
        assert abs(gz - 5.0) < 1e-5          # hierarchy refreshed

    def test_rotate_and_scale(self):
        es, n = session()
        es.scale(n["child"], (2.0, 2.0, 2.0))
        np.testing.assert_allclose(
            np.asarray(es.state.scene.scale[0, n["child"]]), 2.0)
        # 90° about Y: child's global x-axis becomes -z
        q = (0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
        es.rotate(n["ground"], q)
        child_gx = np.asarray(es.state.scene.globals_[0, n["child"], :3, 3])
        assert abs(child_gx[2] + 1.0) < 1e-5  # rotated into -z

    def test_selection(self):
        es, n = session()
        es.select(n["ball"], n["child"])
        assert es.selection == [n["ball"], n["child"]]


class TestOutliner:
    def test_tree_rows(self):
        es, n = session()
        rows = es.outliner()
        names = {r.name: r for r in rows}
        assert names["child"].depth == names["ground"].depth + 1
        assert n["child"] in names["ground"].children


class TestPlayMode:
    def test_play_tick_stop_restores_edit_state(self):
        es, n = session()
        y0 = float(es.state.physics.position[0, 1, 1])
        ex = es.play(update_rate=60.0)
        es.tick(1.0)                          # ball falls in preview
        y_play = float(es.state.physics.position[0, 1, 1])
        assert y_play < y0 - 0.5
        es.stop()
        assert es.mode == "edit"
        y_back = float(es.state.physics.position[0, 1, 1])
        assert abs(y_back - y0) < 1e-6        # edit state untouched

    def test_pause_resume(self):
        es, _ = session()
        es.play()
        es.tick(0.1)
        es.pause()
        assert es.mode == "paused"
        es.resume()
        es.tick(0.1)
        es.stop()

    def test_scripts_run_in_preview(self):
        from fyrox_tpu.script import Script
        es, n = session()
        hits = []

        class Counter(Script):
            def on_update(self, ctx):
                hits.append(ctx.dt)
        ex = es.play(update_rate=30.0)
        ex.scripts.add(Counter())
        es.tick(0.5)
        assert len(hits) >= 14                # ~15 ticks at 30 Hz
