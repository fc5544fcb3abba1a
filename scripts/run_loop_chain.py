"""Chain SSL loop iterations: each iteration's retrained detector becomes
the next iteration's teacher — the reference's stage-4 'merge into the
labeled set, retrain, loop' cycle (/root/reference/plan.md:87-95) run for
multiple rounds unattended.

Usage: python scripts/run_loop_chain.py <work1> <work2> [... workN]

Iteration 1's teacher is the released m-scale detector; iteration i>1's
teacher is iteration i-1's retrain checkpoint dir.  Every stage inside
run_loop_r2.py is artifact-gated and the retrain resumes from its last
checkpoint, so this chain is safe to kill and relaunch at any point
(run it under utils/watchdog for stall recovery on flaky links).
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _fallback(primary: str, release: str) -> str:
    """Prefer the live run artifact; fall back to the git-tracked release
    weights (run checkpoints are gitignored and do not survive workspace
    resets — core/release.py)."""
    return primary if (ROOT / primary).exists() else release


M_SCALE = [
    "labels_src=raw",
    "init_from=" + _fallback("runs/mae_11k_m/backbone.msgpack",
                             "weights/mae_backbone_m.msgpack.gz"),
    "width_mult=0.75",
    "depth_mult=0.67",
    "batch_size=16",
    "lr=5e-4",
    "aug_dtype=bfloat16",  # +9% step throughput (runs/det_m_mae/ab_step.json)
    "retrain_epochs=300",
]
FIRST_TEACHER = _fallback("runs/det_m_mae/best.msgpack",
                          "weights/detector_m_mae.msgpack.gz")
if FIRST_TEACHER.endswith("best.msgpack"):
    FIRST_TEACHER = "runs/det_m_mae"  # checkpoint-dir form


def main() -> int:
    works = sys.argv[1:]
    if not works:
        print(__doc__)
        return 2
    teacher = FIRST_TEACHER
    for work in works:
        cmd = [
            sys.executable, "scripts/run_loop_r2.py", work,
            f"weights_dir={teacher}", *M_SCALE,
        ]
        print(f"[chain] iteration {work}: teacher={teacher}", flush=True)
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        result = ROOT / work / "loop_result.json"
        if rc != 0 or not result.exists():
            print(f"[chain] iteration {work} FAILED rc={rc}", flush=True)
            return rc or 1
        print(f"[chain] {work}: {result.read_text()}", flush=True)
        teacher = str(Path(work) / "retrain")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
