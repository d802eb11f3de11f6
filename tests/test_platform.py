"""Platform-guard tests (fyrox_tpu/platform.py).

The real axon-tunnel behavior (hang on backend init when down) cannot be
reproduced hermetically, so the subprocess layer is monkeypatched and the
decision logic is tested deterministically. The driver's BENCH_r{N}.json /
MULTICHIP_r{N}.json capture is the integration test.
"""
import json
import subprocess
import sys
import types

import pytest

from fyrox_tpu import platform as fp


class _Res:
    def __init__(self, rc=0, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_probe_tpu_success(monkeypatch):
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _Res(0, f"{128.0**3}\n"))
    assert fp.probe_tpu(timeout=1) is True


def test_probe_tpu_bad_value(monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Res(0, "nan\n"))
    assert fp.probe_tpu(timeout=1) is False


def test_probe_tpu_crash(monkeypatch):
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _Res(1, "", "backend init failed"))
    assert fp.probe_tpu(timeout=1) is False


def test_probe_tpu_timeout(monkeypatch):
    def raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="python", timeout=1)
    monkeypatch.setattr(subprocess, "run", raise_timeout)
    assert fp.probe_tpu(timeout=1) is False


def test_guard_falls_back_to_cpu(monkeypatch):
    # probe fails -> guard must pin jax_platforms to cpu
    monkeypatch.setattr(fp, "probe_tpu", lambda timeout=0: False)
    assert fp.platform_guard(probe_timeout=1) == "cpu"
    import jax
    assert jax.config.jax_platforms == "cpu"


def test_guard_force_cpu_env(monkeypatch):
    monkeypatch.setenv("FYROX_FORCE_CPU", "1")
    # probe must not even run
    monkeypatch.setattr(fp, "probe_tpu",
                        lambda timeout=0: pytest.fail("probe ran"))
    assert fp.platform_guard() == "cpu"


def test_run_guarded_skips_when_tpu_down(monkeypatch, capsys):
    monkeypatch.setattr(fp, "probe_tpu", lambda timeout=0: False)
    monkeypatch.setattr(fp.time, "sleep", lambda s: None)
    monkeypatch.setenv("FYROX_BENCH_PROBE_ATTEMPTS", "2")
    fp.run_benchmark_guarded("/tmp/nonexistent_bench.py",
                            metric="m", unit="u")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["skipped"] == "tpu-unavailable"
    assert parsed["value"] is None
    assert parsed["metric"] == "m"


def test_run_guarded_relays_child_stdout(monkeypatch, capsys):
    monkeypatch.setattr(fp, "probe_tpu", lambda timeout=0: True)
    child_line = json.dumps({"metric": "m", "value": 42.0, "unit": "u",
                             "vs_baseline": 0.1})

    def fake_run(cmd, **kw):
        assert kw["env"]["FYROX_BENCH_CHILD"] == "1"
        return _Res(0, child_line + "\n", "child log\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    fp.run_benchmark_guarded(__file__, metric="m", unit="u")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["value"] == 42.0


def test_run_guarded_reports_child_failure(monkeypatch, capsys):
    monkeypatch.setattr(fp, "probe_tpu", lambda timeout=0: True)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Res(3, "", "boom"))
    monkeypatch.setenv("FYROX_BENCH_RUN_ATTEMPTS", "2")
    fp.run_benchmark_guarded(__file__, metric="m", unit="u")
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["skipped"] == "bench-failed"
    assert "rc=3" in parsed["detail"]


def test_dryrun_entry_never_touches_default_backend(monkeypatch):
    """dryrun_multichip must go subprocess-first: no jax.devices() in-proc."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    called = {}
    monkeypatch.setattr(g, "_dryrun_in_subprocess",
                        lambda n: called.setdefault("n", n))
    monkeypatch.delenv("FYROX_DRYRUN_CHILD", raising=False)
    g.dryrun_multichip(8)
    assert called["n"] == 8
