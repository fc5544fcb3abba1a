"""Stall-watchdog supervisor: detects frozen runs, restarts, resumes.

Models the observed failure mode: a dropped TPU tunnel leaves training
blocked inside a device call forever — no exit, no progress. The child
here stalls on its first incarnation and completes on the second (its
"resume" is a marker file), exactly the contract of the artifact-gated
pipeline scripts.

Children run with ``python -S``: the image's sitecustomize pre-imports
jax and can block interpreter startup for seconds (or, with the TPU
tunnel down, indefinitely) — the exact failure the watchdog exists to
catch, but not what these tests measure."""

import sys
import textwrap
import time

from gcssl_tpu.utils.watchdog import newest_mtime, supervise, wait_for_probe


def _write_child(tmp_path, body: str):
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(body))
    return script


class TestNewestMtime:
    def test_empty_and_missing(self, tmp_path):
        assert newest_mtime([tmp_path / "nope"]) == 0.0
        assert newest_mtime([tmp_path]) == 0.0

    def test_finds_newest_nested(self, tmp_path):
        (tmp_path / "a").mkdir()
        old = tmp_path / "a" / "old.txt"
        old.write_text("x")
        time.sleep(0.05)
        new = tmp_path / "new.txt"
        new.write_text("y")
        assert newest_mtime([tmp_path]) == new.stat().st_mtime


class TestSupervise:
    def test_restarts_stalled_child_and_returns_final_rc(self, tmp_path):
        work = tmp_path / "work"
        work.mkdir()
        child = _write_child(tmp_path, f"""
            import sys, time
            from pathlib import Path
            work = Path({str(work)!r})
            marker = work / "restarted"
            if marker.exists():
                (work / "done").write_text("ok")   # resumed run completes
                sys.exit(0)
            marker.write_text("x")                 # first run: stall forever
            time.sleep(3600)
        """)
        logs = []
        rc = supervise(
            [sys.executable, "-S", str(child)],
            watch_paths=[work],
            stall_timeout_s=2.0,
            poll_s=0.3,
            restart_backoff_s=0.1,
            max_restarts=3,
            log_fn=logs.append,
        )
        assert rc == 0
        assert (work / "done").exists()
        assert any("STALL" in m for m in logs)

    def test_healthy_child_not_killed(self, tmp_path):
        work = tmp_path / "w"
        work.mkdir()
        child = _write_child(tmp_path, f"""
            import time
            from pathlib import Path
            work = Path({str(work)!r})
            for i in range(6):                     # heartbeats faster than timeout
                (work / "hb").write_text(str(i))
                time.sleep(0.2)
        """)
        logs = []
        rc = supervise(
            [sys.executable, "-S", str(child)], [work],
            stall_timeout_s=5.0, poll_s=0.2, log_fn=logs.append,
        )
        assert rc == 0
        assert not any("STALL" in m for m in logs)

    def test_gives_up_after_max_restarts(self, tmp_path):
        work = tmp_path / "w"
        work.mkdir()
        child = _write_child(tmp_path, "import time; time.sleep(3600)")
        rc = supervise(
            [sys.executable, "-S", str(child)], [work],
            stall_timeout_s=1.0, poll_s=0.2, restart_backoff_s=0.05,
            max_restarts=1, log_fn=lambda m: None,
        )
        assert rc == -1

    def test_probe_gates_launch(self, tmp_path):
        """The child is only started once the probe passes: a probe keyed
        on a marker file fails twice (no marker), then the marker appears
        (simulating the tunnel coming back) and the run launches and
        completes. Probe failures must not consume restarts."""
        work = tmp_path / "w"
        work.mkdir()
        marker = tmp_path / "link_up"
        probe = _write_child(tmp_path, f"""
            import sys
            from pathlib import Path
            m = Path({str(marker)!r})
            if m.exists():
                sys.exit(0)
            m.write_text("")   # next probe finds the link up
            sys.exit(1)
        """)
        probe_script = tmp_path / "probe.py"
        probe.rename(probe_script)
        child = _write_child(tmp_path, f"""
            from pathlib import Path
            (Path({str(work)!r}) / "done").write_text("ok")
        """)
        logs = []
        rc = supervise(
            [sys.executable, "-S", str(child)], [work],
            stall_timeout_s=30.0, poll_s=0.2, max_restarts=0,
            probe_cmd=[sys.executable, "-S", str(probe_script)],
            probe_retry_s=0.1, log_fn=logs.append,
        )
        assert rc == 0
        assert (work / "done").exists()
        assert any("probe failed" in m for m in logs)


class TestWaitForProbe:
    def test_hung_probe_is_timeout_killed_then_retried(self, tmp_path):
        """A probe that blocks forever (the jax.devices()-on-dead-tunnel
        mode) must be killed at probe_timeout_s and retried, not waited on."""
        marker = tmp_path / "up"
        probe = tmp_path / "probe.py"
        probe.write_text(textwrap.dedent(f"""
            import sys, time
            from pathlib import Path
            m = Path({str(marker)!r})
            if m.exists():
                sys.exit(0)
            m.write_text("")
            time.sleep(3600)   # first probe hangs like a dead device call
        """))
        logs = []
        t0 = time.time()
        wait_for_probe([sys.executable, "-S", str(probe)],
                       probe_timeout_s=1.0, probe_retry_s=0.1,
                       log_fn=logs.append)
        assert time.time() - t0 < 30
        assert any("probe failed rc=-9" in m for m in logs)
