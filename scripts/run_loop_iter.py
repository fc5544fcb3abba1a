"""Chain one SSL loop iteration with the A/B-selected retrain regime.

Usage: python scripts/run_loop_iter.py <work_dir> teacher=<ckpt_dir> \
           teacher_release=<weights/*.msgpack.gz> [key=value ...]

Thin wrapper over run_loop_r2.py that picks the retrain regime from the
schedule A/B (scripts/ft_retrain_ab.py -> runs/loop_m_ft/ab_result.json):

  ft:      full-detector init from the teacher's release weights, short
           cosine (70 ep), lr 2e-4 — wins when fine-tuning the merge from
           an already-trained teacher beats re-training from the MAE
           backbone (round-3 retrain peaked at ep 15/300).
  scratch: MAE-backbone init, 300 ep, lr 5e-4 (round-3 recipe).

Teacher selection is reset-safe: the checkpoint dir wins while its
best.msgpack survives, otherwise the git-committed release file.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
AB_RESULT = ROOT / "runs" / "loop_m_ft" / "ab_result.json"

SHARED = [
    "labels_src=raw",
    "width_mult=0.75", "depth_mult=0.67", "batch_size=16",
    "aug_dtype=bfloat16",
]

_MAE_M = ("runs/mae_11k_m/backbone.msgpack"
          if (ROOT / "runs/mae_11k_m/backbone.msgpack").exists()
          else "weights/mae_backbone_m.msgpack.gz")


def main() -> int:
    work = sys.argv[1]
    o = dict(kv.split("=", 1) for kv in sys.argv[2:])
    teacher = o.pop("teacher", None)
    teacher_release = o.pop("teacher_release", None)

    winner = "scratch"
    if AB_RESULT.exists():
        winner = json.loads(AB_RESULT.read_text()).get("winner", "scratch")
    print(f"[loop_iter] retrain regime: {winner} "
          f"({'A/B ' + AB_RESULT.as_posix() if AB_RESULT.exists() else 'default'})",
          flush=True)

    if teacher and (ROOT / teacher / "best.msgpack").exists():
        weights_dir = teacher
    elif teacher_release and (ROOT / teacher_release).exists():
        weights_dir = teacher_release
    else:
        print(f"[loop_iter] no teacher found ({teacher} / {teacher_release})",
              flush=True)
        return 2

    # IMPROVEMENT GUARD: a chain iteration can regress (round 4: loop_m2
    # retrained to 0.5378 from a 0.5587 teacher) — pseudo-labeling from the
    # regressed student would only compound the loss.  Use the best release
    # on record instead of blindly chaining.
    def _map50(p: Path) -> float:
        try:
            if p.is_dir():
                import json as _j
                return float(_j.loads((p / "best.json").read_text())["map50"])
            from gcssl_tpu.core.release import load_release
            return float(load_release(p)[1].get("map50") or -1)
        except Exception:
            return -1.0
    cand = {ROOT / weights_dir: _map50(ROOT / weights_dir)}
    for rel in ROOT.glob("weights/detector_loop_m*.msgpack.gz"):
        if "snapshot" not in rel.name:
            cand[rel] = _map50(rel)
    best_path = max(cand, key=cand.get)
    if cand[best_path] > cand[ROOT / weights_dir] + 1e-9:
        print(f"[loop_iter] teacher {weights_dir} map50={cand[ROOT/weights_dir]:.4f} "
              f"is not the best on record — using {best_path.name} "
              f"map50={cand[best_path]:.4f}", flush=True)
        weights_dir = str(best_path.relative_to(ROOT))
        # keep the ft regime consistent with the guard: fine-tuning must
        # start from the swapped-in best, not the regressed original —
        # otherwise the guard's pseudo-labels and the ft init disagree
        if best_path.is_file():
            teacher_release = weights_dir

    if winner == "ft":
        if not (teacher_release and (ROOT / teacher_release).exists()):
            print("[loop_iter] ft regime needs the teacher release file; "
                  "falling back to scratch", flush=True)
            winner = "scratch"
    if winner == "ft":
        regime = [f"init_from={teacher_release}", "retrain_epochs=70",
                  "lr=2e-4", "warmup_epochs=2"]
    else:
        regime = [f"init_from={_MAE_M}", "retrain_epochs=300", "lr=5e-4"]

    argv = [sys.executable, "scripts/run_loop_r2.py", work,
            f"weights_dir={weights_dir}", *SHARED, *regime,
            *[f"{k}={v}" for k, v in o.items()]]
    print(f"[loop_iter] exec: {' '.join(argv[1:])}", flush=True)
    return subprocess.run(argv, cwd=ROOT).returncode


if __name__ == "__main__":
    raise SystemExit(main())
