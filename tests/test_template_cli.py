"""Project/template generator CLI (VERDICT r3 #7).

Reference: /root/reference/template/src/main.rs:22-40 (`fyrox-template
init --name --style 2d|3d`) with starter scenes template-core/src/
{2d,3d}.rgs. `python -m fyrox_tpu.tools new` emits a runnable package;
these tests generate both styles and run the generated game 60 headless
ticks green.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from fyrox_tpu.tools import main as tools_main, new_project


def _run_generated(root, name, ticks=60):
    sys.path.insert(0, root)
    try:
        import importlib
        game = importlib.import_module(f"{name}.game")
        from fyrox_tpu.script import Executor
        engine, state = game.build_game()
        ex = Executor(engine, state)
        state = ex.run(ticks / 60.0)
        import jax
        # NaN only: +inf is a legitimate sentinel (node lifetimes), same
        # rule as engine.world_health
        for leaf in jax.tree_util.tree_leaves(state):
            if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype,
                                                        np.floating):
                assert not np.isnan(np.asarray(leaf)).any()
        return engine, state
    finally:
        sys.path.remove(root)


class TestTemplateCli:
    def test_generate_and_run_3d(self, tmp_path):
        rc = tools_main(["new", "proj3d", "--3d", "--dir", str(tmp_path)])
        assert rc == 0
        root = str(tmp_path / "proj3d")
        for rel in ("proj3d/__init__.py", "proj3d/game.py", "proj3d/main.py",
                    "tests/test_smoke.py", "README.md"):
            assert os.path.exists(os.path.join(root, rel)), rel
        engine, state = _run_generated(root, "proj3d")
        # the starter cube fell onto the ground plane and settled
        cube_y = float(state.physics.position[0, 1, 1])
        assert 0.3 < cube_y < 1.2, cube_y

    def test_generate_and_run_2d(self, tmp_path):
        root = new_project("proj2d", style="2d", directory=str(tmp_path))
        engine, state = _run_generated(root, "proj2d")
        ball_y = float(state.physics.position[0, 1, 1])
        assert 0.2 < ball_y < 1.0, ball_y            # rests on the ground
        assert abs(float(state.physics.position[0, 1, 2])) < 1e-4  # z-locked

    def test_generated_smoke_test_passes_in_subprocess(self, tmp_path):
        root = new_project("proj_sub", style="3d", directory=str(tmp_path))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = root + os.pathsep + os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        res = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.join(root, "tests"),
             "-q", "-p", "no:cacheprovider"],
            capture_output=True, text=True, timeout=420, env=env, cwd=root)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]

    def test_name_validation(self, tmp_path):
        with pytest.raises(ValueError):
            new_project("bad-name", directory=str(tmp_path))
        with pytest.raises(ValueError):
            new_project("ok_name", style="4d", directory=str(tmp_path))
        new_project("ok_name", directory=str(tmp_path))
        with pytest.raises(FileExistsError):
            new_project("ok_name", directory=str(tmp_path))
