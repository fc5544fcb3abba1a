"""Stratify per-box calibration gain by raw IoU and box size.

For every stage-2 pseudo-box: match it to its best-IoU GT box, then compare
the raw box's IoU with the calibrated box's IoU against that SAME GT box.
Buckets by raw IoU expose the regression-to-the-mean failure mode (a
calibrator trained on sloppy pairs wrecks already-good boxes), buckets by
sqrt(area) expose the tiny-box blur limit of 128px patches.

Usage: python scripts/stratify_calibration.py <calibrated_labels_dir>
       [raw_labels_dir] [gt_labels_dir]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcssl_tpu.data.yolo import load_yolo_txt

RAW = Path("runs/loop_r2/two_stage/stage2/high/labels")
GT = Path("/root/reference/datasets/500_100_100/unlabels/labels")


def iou_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
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


def main():
    cal_dir = Path(sys.argv[1])
    raw_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else RAW
    gt_dir = Path(sys.argv[3]) if len(sys.argv) > 3 else GT

    raw_i, cal_i, areas = [], [], []
    for f in sorted(raw_dir.glob("*.txt")):
        g, c = gt_dir / f.name, cal_dir / f.name
        if not g.exists() or not c.exists():
            continue
        _, rb, _ = load_yolo_txt(f, min_fields=5)
        _, cb, _ = load_yolo_txt(c, min_fields=5)
        _, gb, _ = load_yolo_txt(g)
        if not len(rb) or not len(gb) or len(rb) != len(cb):
            continue
        m = iou_mat(rb, gb)
        j = m.argmax(1)
        raw_i.append(m.max(1))
        cal_i.append(iou_mat(cb, gb)[np.arange(len(cb)), j])
        areas.append(rb[:, 2] * rb[:, 3])
    raw = np.concatenate(raw_i)
    cal = np.concatenate(cal_i)
    area = np.concatenate(areas)
    d = cal - raw
    print(f"n={len(d)}  mean raw {raw.mean():.4f} -> cal {cal.mean():.4f}  (d {d.mean():+.4f})")
    print(f"{'raw-IoU bucket':>16} {'n':>6} {'mean dIoU':>10} {'frac_improved':>14}")
    for lo, hi in [(0, 0.1), (0.1, 0.3), (0.3, 0.5), (0.5, 0.7), (0.7, 0.85), (0.85, 1.01)]:
        m = (raw >= lo) & (raw < hi)
        if m.sum():
            print(f"{lo:.2f}-{hi:.2f}       {m.sum():>6} {d[m].mean():>+10.4f} {(d[m] > 0).mean():>14.3f}")
    print("by sqrt(area):")
    for lo, hi in [(0, 0.05), (0.05, 0.1), (0.1, 0.2), (0.2, 1.0)]:
        m = (np.sqrt(area) >= lo) & (np.sqrt(area) < hi)
        if m.sum():
            print(f"{lo:.2f}-{hi:.2f}       {m.sum():>6} {d[m].mean():>+10.4f} {(d[m] > 0).mean():>14.3f}")


if __name__ == "__main__":
    main()
