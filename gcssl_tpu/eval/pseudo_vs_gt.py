"""Pseudo-label quality vs GT: TP/FP/FN and P/R/F1, overall and per class.

Twin of /root/reference/compare_pseudo_vs_gt.py: iterate pseudo-label files,
greedy one-to-one class-aware matching at IoU >= threshold (GT boxes claim
preds in file order, TP/FN attributed to the GT's class, FP to the pred's),
count files with missing GT separately.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from gcssl_tpu.data.yolo import load_yolo_txt


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU on cxcywh boxes (numpy, exact union)."""
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)))
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    iw = np.clip(
        np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]),
        0, None,
    )
    ih = np.clip(
        np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]),
        0, None,
    )
    inter = iw * ih
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


@dataclass
class PRF1Report:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    per_class: dict[int, dict[str, int]] = field(default_factory=dict)
    missing_gt: int = 0
    total_imgs: int = 0

    @staticmethod
    def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    @property
    def precision(self) -> float:
        return self._prf(self.tp, self.fp, self.fn)[0]

    @property
    def recall(self) -> float:
        return self._prf(self.tp, self.fp, self.fn)[1]

    @property
    def f1(self) -> float:
        return self._prf(self.tp, self.fp, self.fn)[2]

    def render(self, iou_thr: float, class_names: list[str] | None = None) -> str:
        lines = [
            f"=== Quality on {self.total_imgs - self.missing_gt}/{self.total_imgs} "
            f"images (IoU >= {iou_thr}) ===",
            f"TP {self.tp}  FP {self.fp}  FN {self.fn}",
            f"Precision {self.precision:.3f}  Recall {self.recall:.3f}  F1 {self.f1:.3f}",
        ]
        if self.missing_gt:
            lines.append(
                f"WARNING: {self.missing_gt} pseudo-label files had no matching GT."
            )
        if self.per_class:
            lines.append("--- Per-class ---")
            for cid in sorted(self.per_class):
                s = self.per_class[cid]
                p, r, f = self._prf(s["tp"], s["fp"], s["fn"])
                name = (
                    class_names[cid]
                    if class_names is not None and cid < len(class_names)
                    else str(cid)
                )
                lines.append(
                    f"{name:<15}{s['tp']:>6}{s['fp']:>6}{s['fn']:>6}"
                    f"{p:>9.3f}{r:>9.3f}{f:>9.3f}"
                )
        return "\n".join(lines)


def evaluate_pseudo_labels(
    pseudo_dir: str | Path,
    gt_dir: str | Path,
    iou_thr: float = 0.40,
) -> PRF1Report:
    pseudo_dir, gt_dir = Path(pseudo_dir), Path(gt_dir)
    report = PRF1Report()
    per_class: dict[int, dict[str, int]] = defaultdict(
        lambda: {"tp": 0, "fp": 0, "fn": 0}
    )
    for pseudo_file in sorted(pseudo_dir.glob("*.txt")):
        report.total_imgs += 1
        gt_file = gt_dir / pseudo_file.name
        if not gt_file.exists():
            report.missing_gt += 1
            continue
        p_cls, p_boxes, _ = load_yolo_txt(pseudo_file, min_fields=5)
        g_cls, g_boxes, _ = load_yolo_txt(gt_file, min_fields=5)
        iou_mat = _iou_matrix(g_boxes, p_boxes)
        matched = np.zeros(len(p_boxes), dtype=bool)
        for g in range(len(g_boxes)):
            best_iou, best_j = 0.0, None
            for j in range(len(p_boxes)):
                if matched[j] or p_cls[j] != g_cls[g]:
                    continue
                if iou_mat[g, j] > best_iou:
                    best_iou, best_j = float(iou_mat[g, j]), j
            if best_iou >= iou_thr and best_j is not None:
                report.tp += 1
                per_class[int(g_cls[g])]["tp"] += 1
                matched[best_j] = True
            else:
                report.fn += 1
                per_class[int(g_cls[g])]["fn"] += 1
        for j in range(len(p_boxes)):
            if not matched[j]:
                report.fp += 1
                per_class[int(p_cls[j])]["fp"] += 1
    report.per_class = dict(per_class)
    return report
