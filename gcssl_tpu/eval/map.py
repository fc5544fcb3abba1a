"""mAP50 / mAP50-95 evaluator (VOC/COCO-style, host-side numpy).

Twin of the Ultralytics validator the reference relies on for its headline
numbers (result/person/results.csv — SURVEY.md §6): predictions sorted by
confidence, greedy matched to GT at each IoU threshold, 101-point
interpolated AP, averaged over IoU 0.50:0.95:0.05 for mAP50-95.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (Na, 4) x (Nb, 4) cxcywh arrays."""
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)))
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    iw = np.clip(np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]), 0, None)
    ih = np.clip(np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]), 0, None)
    inter = iw * ih
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


@dataclass
class DetMetrics:
    map50: float
    map50_95: float
    precision: float   # P at max-F1 confidence, IoU 0.5
    recall: float      # R at max-F1 confidence, IoU 0.5
    ap_per_iou: np.ndarray


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray) -> float:
    """101-point interpolated AP (COCO style): at each of 101 recall points,
    take the max precision achieved at recall >= that point (0 beyond the
    maximum achieved recall), then average."""
    mrec = np.concatenate([[0.0], recall])
    # sentinel at recall 0 carries the best achieved precision (not a
    # hard-coded 1.0, which would award credit when there are no TPs at all)
    mpre = np.concatenate([[precision[0] if len(precision) else 0.0], precision])
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    idx = np.searchsorted(mrec, x, side="left")
    p = np.where(idx < len(mpre), mpre[np.minimum(idx, len(mpre) - 1)], 0.0)
    return float(p.mean())


def evaluate_detections(
    pred_boxes: list[np.ndarray],   # per image (Ni, 4) cxcywh
    pred_scores: list[np.ndarray],  # per image (Ni,)
    gt_boxes: list[np.ndarray],     # per image (Mi, 4)
) -> DetMetrics:
    """Single-class detection metrics over a set of images."""
    n_gt = sum(len(g) for g in gt_boxes)
    # flatten predictions with image ids
    recs = []
    for i, (pb, ps) in enumerate(zip(pred_boxes, pred_scores)):
        for j in range(len(pb)):
            recs.append((float(ps[j]), i, j))
    recs.sort(key=lambda r: -r[0])

    ious = [ _iou_matrix(pb, gb) for pb, gb in zip(pred_boxes, gt_boxes) ]

    aps = []
    p_at_f1 = r_at_f1 = 0.0
    for t_i, thr in enumerate(IOU_THRESHOLDS):
        matched = [np.zeros(len(g), bool) for g in gt_boxes]
        tp = np.zeros(len(recs))
        fp = np.zeros(len(recs))
        for k, (score, i, j) in enumerate(recs):
            iou_row = ious[i][j] if ious[i].size else np.zeros(0)
            if iou_row.size:
                order = np.argsort(-iou_row)
                hit = -1
                for g in order:
                    if iou_row[g] < thr:
                        break
                    if not matched[i][g]:
                        hit = g
                        break
                if hit >= 0:
                    matched[i][hit] = True
                    tp[k] = 1
                else:
                    fp[k] = 1
            else:
                fp[k] = 1
        ctp = np.cumsum(tp)
        cfp = np.cumsum(fp)
        recall = ctp / max(n_gt, 1)
        precision = ctp / np.maximum(ctp + cfp, 1e-9)
        aps.append(_ap_from_pr(recall, precision) if len(recs) else 0.0)
        if t_i == 0 and len(recs):
            f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-9)
            k = int(np.argmax(f1))
            p_at_f1, r_at_f1 = float(precision[k]), float(recall[k])

    aps = np.asarray(aps)
    return DetMetrics(
        map50=float(aps[0]),
        map50_95=float(aps.mean()),
        precision=p_at_f1,
        recall=r_at_f1,
        ap_per_iou=aps,
    )
