"""Run a command with the hardware work queue SIGSTOPped.

Usage: python scripts/with_queue_paused.py [--timeout S] -- cmd [args...]

Any timed measurement on the one chip (profiling, ad-hoc benches) must not
share it with the queue's training process; this borrows bench.py's
_paused_queue (SIGCONT guaranteed via atexit/SIGTERM handlers, ancestry
protection, descendant re-sweep).

KEEP PAUSES SHORT (minutes, not tens of minutes): a SIGSTOPped training
process cannot service its TPU-tunnel connection, and the remote side drops
the session after a long freeze — observed round 4 (00:06–00:51): a ~9 min
pause left the resumed trainer blocked forever inside a dead device call
until the stall watchdog killed and relaunched the queue (~45 min lost).
"""

import os
import signal
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _paused_queue  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    timeout = None
    if args[:1] == ["--timeout"]:
        timeout = float(args[1])
        args = args[2:]
    if args[:1] == ["--"]:
        args = args[1:]
    if not args:
        print(__doc__)
        return 2
    with _paused_queue():
        # own session: on timeout the WHOLE process group dies, not just the
        # direct child — a surviving grandchild (spawned JAX/profiler proc)
        # would keep using the chip after the queue is SIGCONT'd
        proc = subprocess.Popen(args, start_new_session=True)
        try:
            return proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"[with_queue_paused] timeout after {timeout}s; killing "
                  f"process group {proc.pid}", file=sys.stderr)
            try:
                os.killpg(proc.pid, signal.SIGTERM)
                proc.wait(timeout=10)
            except (subprocess.TimeoutExpired, OSError):
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except OSError:
                    pass
            return 124


if __name__ == "__main__":
    raise SystemExit(main())
