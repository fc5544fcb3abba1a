"""Reference-scale k-fold cross pseudo-labeling run (VERDICT #3).

Mirrors /root/reference/kfold_train_and_pseudo.py on the real labeled pool:
5 folds over the 500 train images, each fold trains a detector on 400 and
predicts the held-out 100 at conf 0.1 / NMS-IoU 0.9 / save_conf, folds merge
into merged_pseudo/ (reference produced 499 label files of 500 — one image
yielded no boxes).  Reference fold trainings early-stopped at 67-86 epochs
(fold_0*/train/results.csv); ours are bounded at max_epochs with the same
early-stop discipline and start from the MAE-pretrained backbone.

Usage: python scripts/run_kfold_r2.py <output_root> [key=value ...]
Resume-safe: finished folds are skipped via fold done-markers.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def main():
    from gcssl_tpu.core.config import (
        DetectorConfig,
        PseudoLabelConfig,
        apply_overrides,
    )
    from gcssl_tpu.eval.pseudo_vs_gt import evaluate_pseudo_labels
    from gcssl_tpu.pipeline.kfold import kfold_pseudo_label

    out = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/kfold_r2")
    o = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    max_epochs = int(o.pop("max_epochs", 120))
    init_from = o.pop("init_from", "runs/mae_11k_long/backbone.msgpack")
    det_cfg = apply_overrides(DetectorConfig(), {"patience": 30, **o})
    pl_cfg = PseudoLabelConfig()

    t_start = time.time()

    def log_fn(rec):
        if rec.get("epoch", 0) % 10 == 0 or "fold" in rec:
            print(f"[{time.strftime('%H:%M:%S')}] {rec}", flush=True)

    merged = kfold_pseudo_label(
        det_cfg, pl_cfg, DATA / "train" / "images", DATA / "val", out,
        max_epochs=max_epochs, log_fn=log_fn, init_from=init_from,
    )
    n_labels = len(list((merged / "labels").glob("*.txt")))
    rep = evaluate_pseudo_labels(merged / "labels", DATA / "train" / "labels")
    summary = {
        "merged_label_files": n_labels,
        "reference_merged_label_files": 499,
        "precision": rep.precision,
        "recall": rep.recall,
        "f1": rep.f1,
        "wall_s": round(time.time() - t_start, 1),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
