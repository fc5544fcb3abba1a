"""Marker-gating semantics of scripts/run_hw_queue.py (host-only)."""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_queue():
    spec = importlib.util.spec_from_file_location(
        "run_hw_queue", REPO / "scripts" / "run_hw_queue.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stages_skip_when_marker_exists(tmp_path, monkeypatch, capsys):
    q = _load_queue()
    monkeypatch.setattr(q, "ROOT", tmp_path)
    done = tmp_path / "a" / "artifact.json"
    done.parent.mkdir()
    done.write_text("{}")
    ran = tmp_path / "b" / ".queue_done"
    q.STAGES = [
        ("a/artifact.json", [sys.executable, "-c", "raise SystemExit(9)"]),
        ("b/.queue_done", [sys.executable, "-c", "pass"]),
    ]
    assert q.main() == 0
    out = capsys.readouterr().out
    assert "skip (done): a/artifact.json" in out
    assert ran.exists()  # marker written after clean exit


def test_failed_stage_does_not_starve_later_stages(tmp_path, monkeypatch):
    q = _load_queue()
    monkeypatch.setattr(q, "ROOT", tmp_path)
    q.STAGES = [
        ("x/.queue_done", [sys.executable, "-c", "raise SystemExit(3)"]),
        ("y/.queue_done", [sys.executable, "-c", "pass"]),
    ]
    assert q.main() == 1                       # reports the failure...
    assert not (tmp_path / "x" / ".queue_done").exists()  # ...no marker
    assert (tmp_path / "y" / ".queue_done").exists()      # ...later ran


def test_real_stage_list_is_wellformed():
    q = _load_queue()
    for marker, argv, *opt in q.STAGES:
        assert not Path(marker).is_absolute()
        assert argv[0] == sys.executable
        if argv[1] == "-m":  # python -m package.module stage
            mod = REPO / (argv[2].replace(".", "/") + ".py")
            assert mod.exists(), f"missing stage module {argv[2]}"
        else:
            script = REPO / argv[1]
            assert script.exists(), f"missing stage script {argv[1]}"
        if opt:  # optional {"env": str->str, "commit": [repo-rel paths]}
            opts = opt[0]
            assert isinstance(opts, dict)
            assert set(opts) <= {"env", "commit"}, f"unknown stage opts {opts}"
            for k, v in opts.get("env", {}).items():
                assert isinstance(k, str) and isinstance(v, str)
            for p in opts.get("commit", []):
                assert isinstance(p, str) and not Path(p).is_absolute()
