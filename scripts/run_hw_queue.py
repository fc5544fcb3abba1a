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
"""

import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# run checkpoints are gitignored and do not survive workspace resets;
# fall back to the git-tracked release backbone (core/release.py)
_MAE_M = ("runs/mae_11k_m/backbone.msgpack"
          if (ROOT / "runs/mae_11k_m/backbone.msgpack").exists()
          else "weights/mae_backbone_m.msgpack.gz")

# m-scale loop-retrain recipe (mirrors scripts/run_loop_chain.py)
M_SCALE = [
    "labels_src=raw",
    f"init_from={_MAE_M}",
    "width_mult=0.75", "depth_mult=0.67", "batch_size=16", "lr=5e-4",
    "aug_dtype=bfloat16",
    "retrain_epochs=300",
]

M_CP = [
    f"init_from={_MAE_M}",
    "width_mult=0.75", "depth_mult=0.67", "batch_size=16", "lr=5e-4",
    "epochs=300", "patience=50", "resume=1",
    "aug_dtype=bfloat16",  # +9% step throughput (runs/det_m_mae/ab_step.json)
]

STAGES = [
    # 0. bench with wide deadlines: records real numbers in
    #    runs/bench_live.json (the provisional headline for later runs)
    #    and primes the local+remote compile caches — a cold remote
    #    compile can exceed the driver's bench window (round-2 rc=124)
    ("runs/bench_live.json",
     [sys.executable, "bench.py"],
     {"BENCH_DEADLINE_CALIBRATOR": "900", "BENCH_DEADLINE_DETECTOR": "900",
      "BENCH_TOTAL_DEADLINE_S": "2400",
      "JAX_COMPILATION_CACHE_DIR": ".xla_cache"}),
    # 0b. real-data SSL ladder: digits at 20/50/100 labels x 3 seeds
    #    (round-3 verdict #5: the synthetic benchmarks saturated)
    ("runs/ssl_digits_ladder/results.json",
     [sys.executable, "scripts/run_ssl_digits_ladder.py"]),
    # 1. clean m-scale loop iteration (round-3 verdict #2): the fixed
    #    artifact gates wipe + re-run the corrupted loop_m to a valid
    #    positive delta — the single most important artifact of the round
    ("runs/loop_m/loop_result.json",
     [sys.executable, "scripts/run_loop_chain.py", "runs/loop_m"]),
    # 2. five BASELINE SSL configs on the HARD synthetic sets (round-3
    #    verdict #5: the round-2 rows saturated at acc 1.0; ~40 min total
    #    measured round 2)
    ("runs/ssl_hard/.queue_done",
     [sys.executable, "scripts/run_ssl_configs.py", "seeds=2"]),
    # 3. calibrator question (round-3 verdict #6): detector-level A/B of
    #    raw vs self-calibrated k-fold labels in the sloppy-pair regime
    #    (100-epoch arms keep the pair of retrains inside the round budget)
    ("runs/ab_calib/result.json",
     [sys.executable, "scripts/ab_calibrated_retrain.py",
      "det_epochs=100", "patience=25"]),
    # 4+5. chain two more loop iterations toward detector parity
    #    (ref 0.5666 mAP50); each teacher is the previous retrain
    ("runs/loop_m2/loop_result.json",
     [sys.executable, "scripts/run_loop_r2.py", "runs/loop_m2",
      "weights_dir=runs/loop_m/retrain", *M_SCALE]),
    ("runs/loop_m3/loop_result.json",
     [sys.executable, "scripts/run_loop_r2.py", "runs/loop_m3",
      "weights_dir=runs/loop_m2/retrain", *M_SCALE]),
    # 6. finish the copy-paste accuracy A/B (round-2 weak #6; resumes ep85)
    ("runs/det_m_cp/.queue_done",
     [sys.executable, "scripts/train_det_v2.py", "runs/det_m_cp",
      *M_CP, "copy_paste=0.5"]),
]


def main() -> int:
    # advertise our pid so bench.py can SIGSTOP this tree during its
    # timed measurements (two processes sharing the one chip would halve
    # the recorded throughput); see bench._paused_queue
    import os

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
        mpath = ROOT / marker
        if mpath.exists():
            print(f"[queue] skip (done): {marker}", flush=True)
            continue
        print(f"[queue] run: {' '.join(argv[1:])}", flush=True)
        env = {**os.environ, **(opt[0] if opt else {})}
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
    pidfile.unlink(missing_ok=True)
    if failed:
        print(f"[queue] finished with failures: {failed}", flush=True)
        return 1
    print("[queue] all stages done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
