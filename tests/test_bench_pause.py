"""Regression tests for bench.py's queue-pause (SIGSTOP) logic.

Round-3 incident: the hardware queue's own bench stage froze the entire
process tree — bench is a *descendant* of the queue, and `_paused_queue`
SIGSTOP'd every pid in the queue tree including bench itself (a stopped
process can never run its own SIGCONT cleanup).  The fix protects bench's
own pid and all its ancestors from the stop set.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _state(pid: int) -> str:
    with open(f"/proc/{pid}/stat") as f:
        return f.read().split(") ")[-1].split()[0]


def _wait_state(pid: int, want: bool, deadline_s: float = 5.0) -> str:
    """Poll until the pid's stopped-ness matches ``want`` (the T state
    lands asynchronously after SIGSTOP/SIGCONT) or the deadline passes."""
    t0 = time.monotonic()
    s = _state(pid)
    while ((s == "T") != want) and time.monotonic() - t0 < deadline_s:
        time.sleep(0.05)
        s = _state(pid)
    return s


# the inner driver: acts as a descendant of the fake queue and exercises
# _paused_queue; prints the observed states for the test to assert on.
_INNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import bench

queue_pid = int(sys.argv[1])
sibling_pid = int(sys.argv[2])

def state(pid):
    with open(f"/proc/{{pid}}/stat") as f:
        return f.read().split(") ")[-1].split()[0]

def wait_state(pid, want, deadline=5.0):
    t0 = time.monotonic()
    s = state(pid)
    while ((s == "T") != want) and time.monotonic() - t0 < deadline:
        time.sleep(0.05)
        s = state(pid)
    return s

with bench._paused_queue():
    inside = {{
        "self": state(os.getpid()),
        "queue": state(queue_pid),
        "sibling": wait_state(sibling_pid, True),
    }}
after = {{"sibling": wait_state(sibling_pid, False)}}
print(json.dumps({{"inside": inside, "after": after}}), flush=True)
"""

# the fake queue: writes the pidfile, spawns a sibling sleeper and the
# inner driver, waits for the driver, and reports its output.  argv[-1]
# contains "run_hw_queue" so bench._queue_tree accepts the pidfile.
_QUEUE = r"""
import os, subprocess, sys
pidfile, repo = sys.argv[1], sys.argv[2]
with open(pidfile, "w") as f:
    f.write(str(os.getpid()))
sib = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
inner = {inner!r}.format(repo=repo)
r = subprocess.run(
    [sys.executable, "-c", inner, str(os.getpid()), str(sib.pid)],
    capture_output=True, text=True,
)
sib.kill()
sys.stdout.write(r.stdout)
sys.stderr.write(r.stderr)
sys.exit(r.returncode)
"""


def test_queue_run_bench_does_not_freeze_itself(tmp_path):
    """A bench that is a descendant of the queue must not SIGSTOP itself or
    the queue (its ancestor), but must still stop unrelated queue
    descendants — and resume them on exit."""
    import json

    pidfile = tmp_path / "queue.pid"
    env = {**os.environ, "BENCH_QUEUE_PIDFILE": str(pidfile)}
    queue_src = _QUEUE.format(inner=_INNER)
    r = subprocess.run(
        [sys.executable, "-c", queue_src, str(pidfile), str(REPO),
         "run_hw_queue-marker"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # the incident: self/queue frozen -> the line above never printed at all
    assert out["inside"]["self"] != "T"
    assert out["inside"]["queue"] != "T"
    assert out["inside"]["sibling"] == "T"   # real contention is paused
    assert out["after"]["sibling"] != "T"    # ...and resumed on exit


def test_standalone_bench_pauses_queue_tree(tmp_path):
    """A bench that is NOT inside the queue tree pauses the queue itself."""
    pidfile = tmp_path / "queue.pid"
    fake_queue = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)",
         "run_hw_queue-marker"])
    try:
        pidfile.write_text(str(fake_queue.pid))
        os.environ["BENCH_QUEUE_PIDFILE"] = str(pidfile)
        sys.path.insert(0, str(REPO))
        import bench

        time.sleep(0.2)
        with bench._paused_queue():
            assert _wait_state(fake_queue.pid, want=True) == "T"
        assert _wait_state(fake_queue.pid, want=False) != "T"
    finally:
        os.environ.pop("BENCH_QUEUE_PIDFILE", None)
        try:
            fake_queue.send_signal(signal.SIGCONT)
        except OSError:
            pass
        fake_queue.kill()
