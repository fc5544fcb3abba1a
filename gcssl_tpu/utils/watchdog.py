"""Stall-watchdog supervisor for long hardware runs.

The reference has no failure handling at all (SURVEY.md §5: an interrupted
Ultralytics or CGAN run restarts from zero). This framework's trainers are
all crash-resumable (checkpoint `last` + `--resume` / artifact-gated
pipeline stages), which reduces fault recovery to a supervision problem:
detect that a run has stopped making progress and restart it.

The failure mode this targets is real and observed: a dropped TPU-tunnel
connection leaves the training process blocked forever inside a device
call — no exception, no exit, heartbeat files stop updating. A supervisor
process is the only reliable recovery (the blocked call cannot be
interrupted from inside the process).

Progress is measured by the newest mtime under ``watch_paths`` (checkpoint
dirs, log files). If nothing advances for ``stall_timeout_s``, the child is
killed (SIGTERM, then SIGKILL) and relaunched — the run's own resume logic
takes it from the last checkpoint.

Usage::

    from gcssl_tpu.utils.watchdog import supervise
    rc = supervise(
        [sys.executable, "scripts/run_loop_r2.py", "runs/loop_m", ...],
        watch_paths=["runs/loop_m"],
        stall_timeout_s=1800,
    )

or as a CLI::

    python -m gcssl_tpu.utils.watchdog --watch runs/loop_m \
        --stall-minutes 30 -- python scripts/run_loop_r2.py runs/loop_m ...
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path


def newest_mtime(paths: list[str | Path]) -> float:
    """Most recent mtime of any file under the given files/dirs (0 if none)."""
    newest = 0.0
    for p in paths:
        p = Path(p)
        if p.is_file():
            try:  # file can vanish between is_file() and stat() (logrotate)
                newest = max(newest, p.stat().st_mtime)
            except OSError:
                continue
        elif p.is_dir():
            for f in p.rglob("*"):
                try:
                    if f.is_file():
                        newest = max(newest, f.stat().st_mtime)
                except OSError:
                    continue
    return newest


def _terminate(proc: subprocess.Popen, grace_s: float = 15.0) -> None:
    """SIGTERM the child's process group, escalate to SIGKILL."""
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except (ProcessLookupError, PermissionError):
        return
    deadline = time.time() + grace_s
    while time.time() < deadline:
        if proc.poll() is not None:
            return
        time.sleep(0.5)
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    proc.wait()


def _print_flush(msg: str) -> None:
    print(msg, flush=True)  # stdout is block-buffered under nohup/redirects


def wait_for_probe(
    probe_cmd: list[str],
    probe_timeout_s: float = 330.0,
    probe_retry_s: float = 120.0,
    log_fn=_print_flush,
) -> None:
    """Block until ``probe_cmd`` exits 0 within ``probe_timeout_s``.

    Gate for (re)launching a hardware run while the device link is down:
    a dead TPU tunnel makes ``jax.devices()`` HANG rather than raise, so
    the probe must be a separate timeout-killed process — never an inline
    call. A hung/failed probe just sleeps and re-probes; probing does NOT
    count against the supervisor's restart budget (an hours-long outage
    would otherwise exhaust ``max_restarts`` on launches that never had a
    chance, observed 2026-08-18 with a ~20-min stall-kill cycle)."""
    while True:
        try:
            rc = subprocess.run(
                probe_cmd, timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -9
        if rc == 0:
            return
        log_fn(f"[watchdog] probe failed rc={rc}; device link likely down, "
               f"re-probing in {probe_retry_s:.0f}s")
        time.sleep(probe_retry_s)


def supervise(
    cmd: list[str],
    watch_paths: list[str | Path],
    stall_timeout_s: float = 1800.0,
    max_restarts: int = 10,
    poll_s: float = 30.0,
    restart_backoff_s: float = 60.0,
    log_fn=_print_flush,
    probe_cmd: list[str] | None = None,
    probe_timeout_s: float = 330.0,
    probe_retry_s: float = 120.0,
) -> int:
    """Run ``cmd``; kill + relaunch it whenever ``watch_paths`` stop
    advancing for ``stall_timeout_s``.  Returns the child's exit code once
    it terminates on its own (stall kills don't count as termination), or
    -1 if ``max_restarts`` is exhausted (``max_restarts < 0`` = unlimited).

    ``probe_cmd``: optional health gate run before every (re)launch —
    the child is only started once the probe exits 0 within
    ``probe_timeout_s`` (see :func:`wait_for_probe`). Probe waits don't
    consume restarts, so a long tunnel outage can't exhaust the budget.

    ``cmd`` must be idempotent-resumable: artifact-gated stages and/or
    checkpoint resume (every trainer in this framework is)."""
    restarts = 0
    while True:
        if probe_cmd:
            wait_for_probe(probe_cmd, probe_timeout_s, probe_retry_s, log_fn)
        t_start = time.time()
        proc = subprocess.Popen(cmd, start_new_session=True)
        log_fn(f"[watchdog] launched pid {proc.pid}: {' '.join(map(str, cmd))}")
        while True:
            rc = proc.poll()
            if rc is not None:
                log_fn(f"[watchdog] child exited rc={rc}")
                return rc
            last_progress = max(newest_mtime(watch_paths), t_start)
            idle = time.time() - last_progress
            if idle > stall_timeout_s:
                log_fn(f"[watchdog] STALL: no progress for {idle:.0f}s "
                       f"(> {stall_timeout_s:.0f}s); restarting")
                _terminate(proc)
                break
            time.sleep(poll_s)
        restarts += 1
        if 0 <= max_restarts < restarts:
            log_fn(f"[watchdog] giving up after {max_restarts} restarts")
            return -1
        time.sleep(restart_backoff_s)


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="gcssl_tpu.utils.watchdog",
        description="restart a resumable run when its artifacts stop advancing",
    )
    ap.add_argument("--watch", action="append", required=True,
                    help="file/dir whose mtimes indicate progress (repeatable)")
    ap.add_argument("--stall-minutes", type=float, default=30.0)
    ap.add_argument("--max-restarts", type=int, default=10,
                    help="-1 = unlimited")
    ap.add_argument("--probe", default=None,
                    help="shell-style command gating every (re)launch: the "
                         "child starts only once this exits 0 within "
                         "--probe-timeout-s (e.g. a timeout-killed "
                         "jax.devices() tunnel check); probe waits never "
                         "consume restarts")
    ap.add_argument("--probe-timeout-s", type=float, default=330.0)
    ap.add_argument("--probe-retry-s", type=float, default=120.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to supervise")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no command given (pass it after --)")
    import shlex

    return supervise(
        cmd, args.watch, stall_timeout_s=args.stall_minutes * 60,
        max_restarts=args.max_restarts,
        probe_cmd=shlex.split(args.probe) if args.probe else None,
        probe_timeout_s=args.probe_timeout_s,
        probe_retry_s=args.probe_retry_s,
    )


if __name__ == "__main__":
    raise SystemExit(main())
