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

Round-5 order (VERDICT r4 "Next round"): live bench first (fresh record +
cache prime), then the parity push (fitness selection + GT polish +
3-seed retrains + within-run checkpoint averaging, target BOTH
map50_u >= 0.5666 AND map50_95_u >= 0.2088), protocol rescore of every
release, the calibrated-ECE digits ladder (round-3 carryover), the
stratified calibration A/B (close the transfer question), the improved
cifar100 schedule, and a WGAN-step profile for the MFU roofline note.
Each stage's result artifacts are git-committed the moment it lands.
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
    ("runs/.bench_r5.queue_done",
     [sys.executable, "bench.py"],
     {"env": {"BENCH_TOTAL_DEADLINE_S": "2400"},
      # .xla_cache: the executables behind the recorded keys MUST land in
      # git — round 3 committed only the key list, so the primed cache died
      # with the workspace and round 4's first bench recompiled cold
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
    # 1. THE round-5 headline (VERDICT r4 #1): parity push — fitness
    #    selection, GT-only polish of the closest releases, 3-seed
    #    retrains of the frozen loop_m merge, within-run top-k checkpoint
    #    averaging.  Target: one release with map50_u >= 0.5666 AND
    #    map50_95_u >= 0.2088.  Job artifacts commit as they land inside
    #    the script; summary committed here.
    ("runs/parity/summary.json",
     [sys.executable, "scripts/parity_push.py"],
     {"commit": ["runs/parity", "weights", ".xla_cache"]}),
    # 2. protocol rescore of every detector release (fresh committed
    #    runs/rescore_val.json including the parity candidates — the
    #    VERDICT's "done" criterion)
    ("runs/.rescore_r5.queue_done",
     [sys.executable, "scripts/rescore_all.py"],
     {"commit": ["runs/rescore_val.json", "runs/rescore_test.json", ".xla_cache"]}),
    # 3. round-3 carryover (VERDICT r4 #3): digits ladder cells re-run
    #    with temperature-scaled test ECE (test_ece_cal)
    ("runs/ssl_digits_ladder/cal.queue_done",
     [sys.executable, "scripts/run_ssl_digits_ladder.py"],
     {"commit": ["runs/ssl_digits_ladder"]}),
    # 4. stratified calibration A/B (VERDICT r4 #5): apply calibration
    #    only where the strata say it helps, retrain, compare against the
    #    round-4 raw arm (0.4374) — closes the transfer question
    ("runs/ab_calib_strat/result.json",
     [sys.executable, "scripts/ab_stratified_calib.py"],
     {"commit": ["runs/ab_calib_strat", ".xla_cache"]}),
    # 5. cifar100_10k with a real schedule (VERDICT r4 #4): cosine LR,
    #    longer budget, standard aug, seeds=2
    ("runs/ssl_cifar100_v2/results.json",
     [sys.executable, "scripts/run_cifar100_v2.py"],
     {"commit": ["runs/ssl_cifar100_v2", ".xla_cache"]}),
    # 6. WGAN fused-step profile for the calibrator MFU roofline note
    #    (VERDICT r4 #7)
    ("runs/profile_wgan/summary.json",
     [sys.executable, "scripts/profile_wgan_step.py"],
     {"commit": ["runs/profile_wgan/summary.json", ".xla_cache"]}),
    # 7. flagship serving artifact: AOT-export the parity release so the
    #    bench's `served` section measures the shipped best model
    ("exports/detector_parity_gtp_m.aot",
     [sys.executable, "-m", "gcssl_tpu.cli", "export-model", "detector",
      "--weights-dir", "weights/detector_parity_gtp_m.msgpack.gz",
      "--out", "exports/detector_parity_gtp_m.aot",
      "--params-dtype", "bfloat16", "--platforms", "tpu"]),
    # 7b. ViT-GAN hardware validation: short real-pair training run of the
    #     bytecode-only variant rebuilt in models/vit_gan.py — records
    #     ΔIoU + throughput so the variant ships exercised, not just
    #     unit-tested
    ("runs/calib_vit/.queue_done",
     [sys.executable, "-m", "gcssl_tpu.cli", "train-calibrator",
      "--data-dir", "/root/reference/datasets/500_100_100/cgan",
      "--save-dir", "runs/calib_vit", "--config",
      "configs/calibrator_r2.yaml", "--generator-type", "vit",
      "--discriminator-type", "vit", "--epochs", "40",
      "--cache-dir", "runs/calib_vit/cache", "--resume",
      "--release", "weights/calibrator_vit_g.msgpack.gz"],
     {"commit": ["runs/calib_vit/training_history.json",
                 "weights/calibrator_vit_g.msgpack.gz", ".xla_cache"]}),
    # 8. once-per-round FULL test suite (CPU-only; ~45 min on the 1-core
    #    box) with a committed machine-readable summary (VERDICT r4 #6)
    ("runs/test_suite_r5.json",
     [sys.executable, "scripts/run_full_tests.py"],
     {"commit": ["runs/test_suite_r5.json"]}),
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
