"""Calibrate the loop's stage-2 pseudo-labels with a given calibrator and
measure label quality vs the held-back GT — the transfer experiment.

Round-2 finding: the calibrator trained on the REFERENCE teacher's k-fold
pairs lowers matched IoU on OUR detector's pseudo-labels (0.592 -> 0.550).
This script closes the loop with the SELF-consistent calibrator (trained on
our own k-fold pairs, runs/kfold_r2/cgan_pairs) and reports P/R/F1 at the
0.40 matching threshold plus mean matched IoU, raw vs calibrated.

Usage: python scripts/eval_self_calibration.py <calib_dir> <out_dir> [n_imgs]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
STAGE2 = Path("runs/loop_r2/two_stage/stage2/high")


def _iou_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix = np.maximum(0, np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]))
    iy = np.maximum(0, np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]))
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1)
    ub = (bx2 - bx1) * (by2 - by1)
    return inter / np.maximum(ua[:, None] + ub[None] - inter, 1e-9)


def matched_iou_stats(pred_dir: Path, gt_dir: Path, names):
    from gcssl_tpu.data.yolo import load_yolo_txt

    ious = []
    for name in names:
        p, g = pred_dir / name, gt_dir / name
        if not p.exists() or not g.exists():
            continue
        _, pb, _ = load_yolo_txt(p, min_fields=5)
        _, gb, _ = load_yolo_txt(g)
        if not len(pb) or not len(gb):
            continue
        best = _iou_mat(pb, gb).max(1)
        ious.extend(best[best > 0.1])
    ious = np.asarray(ious)
    return {
        "matched": int(len(ious)),
        "mean_iou": round(float(ious.mean()), 4),
        "frac_ge_50": round(float((ious >= 0.5).mean()), 4),
    }


def main():
    from gcssl_tpu.core.config import load_config
    from gcssl_tpu.eval.pseudo_vs_gt import evaluate_pseudo_labels
    from gcssl_tpu.pipeline.calibrate import (
        calibrate_tree,
        load_calibrator_from_checkpoint,
    )

    calib_dir = sys.argv[1]
    out_dir = Path(sys.argv[2])
    n_imgs = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = all

    names = sorted(p.name for p in (STAGE2 / "labels").glob("*.txt"))
    if n_imgs:
        names = names[:n_imgs]
    img_dir, lab_dir = STAGE2 / "images", STAGE2 / "labels"
    if n_imgs:
        # restrict to a subset tree
        sub = out_dir.parent / (out_dir.name + "_src")
        (sub / "images").mkdir(parents=True, exist_ok=True)
        (sub / "labels").mkdir(parents=True, exist_ok=True)
        import shutil

        for n in names:
            stem = Path(n).stem
            for ext in (".jpg", ".png", ".jpeg"):
                src = STAGE2 / "images" / (stem + ext)
                if src.exists():
                    shutil.copy2(src, sub / "images" / src.name)
                    break
            shutil.copy2(STAGE2 / "labels" / n, sub / "labels" / n)
        img_dir, lab_dir = sub / "images", sub / "labels"

    cal = load_calibrator_from_checkpoint(
        calib_dir, cfg=load_config("configs/calibrator_r2.yaml"), max_boxes=128
    )
    n = calibrate_tree(cal, img_dir, lab_dir, out_dir)

    gt = DATA / "unlabels" / "labels"
    raw_rep = evaluate_pseudo_labels(lab_dir, gt)
    cal_rep = evaluate_pseudo_labels(out_dir, gt)
    result = {
        "calibrator": str(calib_dir),
        "images": len(names),
        "boxes_calibrated": n,
        "raw": {"precision": raw_rep.precision, "recall": raw_rep.recall,
                "f1": raw_rep.f1, **matched_iou_stats(lab_dir, gt, names)},
        "calibrated": {"precision": cal_rep.precision, "recall": cal_rep.recall,
                       "f1": cal_rep.f1, **matched_iou_stats(out_dir, gt, names)},
    }
    (out_dir.parent / (out_dir.name + "_quality.json")).write_text(
        json.dumps(result, indent=1)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
