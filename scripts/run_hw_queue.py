"""Serial hardware work queue for unattended TPU time (resume-safe).

Usage: python scripts/run_hw_queue.py

Runs the session's hardware stages in priority order.  Each stage is
skipped when its marker file exists; a stage whose natural artifact is its
marker (e.g. the loop chain's loop_result.json) self-gates, while plain
commands get a ``.queue_done`` marker written by this script after a clean
exit.  Every stage command is itself resume-safe (checkpoint resume /
artifact-gated sub-stages), so the queue can be killed and relaunched at
any point — run it under ``gcssl_tpu.utils.watchdog`` with ``--probe`` so
TPU-tunnel outages park the queue instead of burning restarts.

Round-4 order (VERDICT r3 "Next round"): live bench first (fresh record +
cache prime), then the retrain-schedule A/B, then the loop chain toward
detector parity (>=0.5666 mAP50), then the calibrator detector-level A/B,
the hard-set SSL configs, and a final loop_m3 iteration.  Each stage's
result artifacts are git-committed the moment it lands (round-3 weak #4:
the round's headline science died untracked at snapshot twice).
"""

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# m-scale loop-retrain recipe shared flags live in scripts/run_loop_iter.py

STAGES = [
    # 0. fused live bench with wide deadlines: records real numbers in
    #    runs/bench_live.json, writes the touched cache keys, and primes
    #    the local+remote compile caches (round-2 rc=124 failure class)
    ("runs/.bench_r4.queue_done",
     [sys.executable, "bench.py"],
     {"env": {"BENCH_TOTAL_DEADLINE_S": "2400"},
      # .xla_cache: the executables behind the recorded keys MUST land in
      # git — round 3 committed only the key list, so the primed cache died
      # with the workspace and this round's first bench recompiled cold
      # (85 s calibrator / 81 s detector compiles, cache_hit_miss [1,28])
      "commit": ["runs/bench_live.json", "runs/bench_cache_keys.json",
                 ".xla_cache"]}),
    # 0b. serving artifact for the bench's `served` section (exports/ is
    #     gitignored — 82 MB of baked params — so a reset-wiped artifact is
    #     re-exported here; ~2-6 min host-side, no training disruption)
    ("exports/detector_loop_m.aot",
     [sys.executable, "-m", "gcssl_tpu.cli", "export-model", "detector",
      "--weights-dir", "weights/detector_loop_m.msgpack.gz",
      "--out", "exports/detector_loop_m.aot",
      "--params-dtype", "bfloat16", "--platforms", "tpu"]),
    # 1. retrain-schedule A/B on loop_m's frozen merge (round-3 weak #3:
    #    best at ep15 of a 300-ep cosine) — decides the loop_m2/m3 regime
    ("runs/loop_m_ft/ab_result.json",
     [sys.executable, "scripts/ft_retrain_ab.py"],
     {"commit": ["runs/loop_m_ft/ab_result.json", "runs/loop_m_ft/best.json",
                 "runs/loop_m_ft/results.json",
                 "weights/detector_loop_m_ft.msgpack.gz", ".xla_cache"]}),
    # 2. loop iteration 2: teacher = loop_m retrain (0.5587); regime from
    #    the A/B above.  Target: >= reference 0.5666 mAP50
    ("runs/loop_m2/loop_result.json",
     [sys.executable, "scripts/run_loop_iter.py", "runs/loop_m2",
      "teacher=runs/loop_m/retrain",
      "teacher_release=weights/detector_loop_m.msgpack.gz"],
     {"commit": ["runs/loop_m2", "weights/detector_loop_m2.msgpack.gz",
                 "weights/detector_loop_m2_snapshot.msgpack.gz", ".xla_cache"]}),
    # 3. loop iteration 3 — MOVED before the calibrator A/B after loop_m2
    #    regressed (0.5378 from a 0.5587 teacher): parity is the round's #1
    #    item, so it gets the chip first.  run_loop_iter's improvement guard
    #    picks the best release on record as teacher; conf_high forced to
    #    the round-3 proven volume point (0.75: P0.81/R0.26 gave +0.022)
    #    instead of the sweep's max-precision point (0.8) that regressed.
    ("runs/loop_m3/loop_result.json",
     [sys.executable, "scripts/run_loop_iter.py", "runs/loop_m3",
      "teacher=runs/loop_m2/retrain",
      "teacher_release=weights/detector_loop_m2.msgpack.gz",
      # 7,102 AND 6,500-image merges both OOM'd the 16 GB HBM (dataset
      # is device-resident); 5,396 is the largest proven fit -> cap 4,900
      "conf_high=0.75", "max_pseudo=4900"],
     {"commit": ["runs/loop_m3", "weights/detector_loop_m3.msgpack.gz",
                 "weights/detector_loop_m3_snapshot.msgpack.gz", ".xla_cache"]}),
    # 4. calibrator question (round-3 verdict #2): detector-level A/B of
    #    raw vs self-calibrated k-fold labels in the sloppy-pair regime
    ("runs/ab_calib/result.json",
     [sys.executable, "scripts/ab_calibrated_retrain.py",
      "det_epochs=100", "patience=25"],
     {"commit": ["runs/ab_calib/result.json",
                 "weights/calibrator_self_g.msgpack.gz", ".xla_cache"]}),
    # 5. five BASELINE SSL configs on the HARD synthetic sets (round-3
    #    verdict #3: round-2 rows saturated at acc 1.0; ~40 min measured)
    ("runs/ssl_hard/.queue_done",
     [sys.executable, "scripts/run_ssl_configs.py", "seeds=2"],
     {"commit": ["runs/ssl_mnist_100", "runs/ssl_svhn_1000",
                 "runs/ssl_cifar10_4000", "runs/ssl_cifar100_10k",
                 "runs/ssl_imagenet32"]}),
    # 6. polish fine-tune of the best release on the loop_m3 merge (~25
    #    min): protocol-matched parity gap is 0.0016 mAP50
    #    (runs/rescore_val.json) and schedule-A/B gains arrive early
    ("runs/ft_polish/result.json",
     [sys.executable, "scripts/ft_polish.py"],
     {"commit": ["runs/ft_polish/result.json", "runs/ft_polish/best.json",
                 "weights/detector_polish.msgpack.gz", ".xla_cache"]}),
    # 7. stretch (round-3 verdict #8): digits ladder with temperature-scaled
    #    test ECE — cells lacking test_ece_cal re-run automatically
    ("runs/ssl_digits_ladder/cal.queue_done",
     [sys.executable, "scripts/run_ssl_digits_ladder.py"],
     {"commit": ["runs/ssl_digits_ladder"]}),
]


def _commit(paths: list[str], marker: str) -> None:
    """Commit stage artifacts the moment they land (runs/**/*.msgpack and
    image trees stay gitignored; only metrics/weights/history go in).
    Retries around a concurrent index lock; never fails the stage."""
    import os

    existing = [p for p in paths if (ROOT / p).exists()]
    if not existing:
        return
    for attempt in range(5):
        add = subprocess.run(["git", "add", "--"] + existing, cwd=ROOT,
                             capture_output=True, text=True)
        if add.returncode == 0:
            break
        time.sleep(3.0 * (attempt + 1))
    staged = subprocess.run(["git", "diff", "--cached", "--quiet"], cwd=ROOT)
    if staged.returncode == 0:
        return  # nothing new
    msg = f"Queue artifact: {marker}"
    for attempt in range(5):
        rc = subprocess.run(["git", "commit", "-q", "-m", msg], cwd=ROOT,
                            capture_output=True, text=True).returncode
        if rc == 0:
            print(f"[queue] committed: {marker}", flush=True)
            return
        time.sleep(3.0 * (attempt + 1))
    print(f"[queue] WARNING: commit failed for {marker}", flush=True)


def main() -> int:
    # advertise our pid so bench.py can SIGSTOP this tree during its
    # timed measurements (two processes sharing the one chip would halve
    # the recorded throughput); see bench._paused_queue
    import os

    # one persistent XLA-executable cache for EVERY stage (absolute path:
    # the dir string is baked into the cache keys — a relative spelling
    # creates a disjoint key space, the round-3 priming failure): trainer
    # step compiles (~5-15 min cold through the tunnel) become ~10 s warm
    # after a watchdog restart or workspace reset
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(ROOT / ".xla_cache"))
    pidfile = ROOT / "runs" / ".hw_queue.pid"
    pidfile.parent.mkdir(parents=True, exist_ok=True)
    # refuse to double-run: a second queue would overwrite the pidfile and
    # bench._paused_queue would pause only the newer tree while the older
    # one keeps training on the chip, skewing every timed number
    try:
        old = int(pidfile.read_text().strip())
        if old != os.getpid() and b"run_hw_queue" in Path(
            f"/proc/{old}/cmdline"
        ).read_bytes():
            print(f"[queue] another queue is running (pid {old}); exiting",
                  flush=True)
            return 3
    except (OSError, ValueError):
        pass
    pidfile.write_text(str(os.getpid()))
    failed = []
    for marker, argv, *opt in STAGES:
        opts = opt[0] if opt else {}
        mpath = ROOT / marker
        if mpath.exists():
            print(f"[queue] skip (done): {marker}", flush=True)
            continue
        print(f"[queue] run: {' '.join(argv[1:])}", flush=True)
        env = {**os.environ, **opts.get("env", {})}
        rc = subprocess.run(argv, cwd=ROOT, env=env).returncode
        if rc != 0:
            # keep going: a persistently-failing early stage must not starve
            # the later ones (the watchdog relaunches the whole queue, so a
            # transiently-failing stage still gets retried every cycle)
            print(f"[queue] stage FAILED rc={rc}: {marker}", flush=True)
            failed.append(marker)
            continue
        if marker.endswith(".queue_done"):
            mpath.parent.mkdir(parents=True, exist_ok=True)
            mpath.write_text(time.strftime("%Y-%m-%dT%H:%M:%S"))
        if opts.get("commit"):
            _commit(opts["commit"], marker)
    pidfile.unlink(missing_ok=True)
    if failed:
        print(f"[queue] finished with failures: {failed}", flush=True)
        return 1
    print("[queue] all stages done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
