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
    # Ultralytics-protocol AP: their TP matching (per-image IoU-sorted
    # unique assignment, match_predictions) AND their AP formula (trapz
    # over np.interp of the PR envelope with a leading (recall 0,
    # precision 1.0) sentinel — compute_ap, method="interp").  The
    # reference's headline numbers (result/person/results.csv) are
    # computed with THIS protocol, which reads systematically higher than
    # strict right-step sampling on the same predictions; comparisons
    # against the reference must use these fields.
    map50_u: float = 0.0
    map50_95_u: float = 0.0


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


def _ap_ultralytics(recall: np.ndarray, precision: np.ndarray) -> float:
    """AP exactly as Ultralytics v8 computes it (utils/metrics.py
    compute_ap, default method="interp"): monotonic envelope over the PR
    curve with sentinels (0, 1.0) and (1, 0.0), then trapezoidal
    integration of the envelope linearly interpolated at 101 recall
    points.  The linear interpolation between envelope steps (and the
    leading precision-1.0 sentinel) credit area a right-step sampler does
    not, so this reads higher than `_ap_from_pr` on identical
    predictions."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    # np.trapz is deprecated (removed in newer NumPy); prefer np.trapezoid
    trapz = getattr(np, "trapezoid", None) or np.trapz
    return float(trapz(np.interp(x, mrec, mpre), x))


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

    # Ultralytics TP assignment (utils/metrics.py match_predictions): per
    # image, all (pred, gt) pairs with IoU >= thr are sorted by IoU desc,
    # deduped by pred then by gt (keeping the highest-IoU pair for each) —
    # matching is IoU-priority, NOT confidence-priority like the strict
    # loop below.  Flags are indexed by the global confidence order.
    pos_of = {}
    for k, (_, i, j) in enumerate(recs):
        pos_of[(i, j)] = k
    tp_u = np.zeros((len(recs), len(IOU_THRESHOLDS)))
    for t_i, thr in enumerate(IOU_THRESHOLDS):
        for i, iou in enumerate(ious):
            if not iou.size:
                continue
            pairs = np.argwhere(iou >= thr)          # (n, 2) = (pred, gt)
            if not len(pairs):
                continue
            if len(pairs) > 1:
                order = np.argsort(-iou[pairs[:, 0], pairs[:, 1]])
                pairs = pairs[order]
                pairs = pairs[np.unique(pairs[:, 0], return_index=True)[1]]
                pairs = pairs[np.unique(pairs[:, 1], return_index=True)[1]]
            for p_idx, _g in pairs:
                tp_u[pos_of[(i, int(p_idx))], t_i] = 1.0

    aps, aps_u = [], []
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
        if len(recs):
            ctp_u = np.cumsum(tp_u[:, t_i])
            cfp_u = np.cumsum(1.0 - tp_u[:, t_i])
            rec_u = ctp_u / max(n_gt, 1)
            pre_u = ctp_u / np.maximum(ctp_u + cfp_u, 1e-9)
            aps_u.append(_ap_ultralytics(rec_u, pre_u))
        else:
            aps_u.append(0.0)
        if t_i == 0 and len(recs):
            f1 = 2 * precision * recall / np.maximum(precision + recall, 1e-9)
            k = int(np.argmax(f1))
            p_at_f1, r_at_f1 = float(precision[k]), float(recall[k])

    aps = np.asarray(aps)
    aps_u = np.asarray(aps_u)
    return DetMetrics(
        map50=float(aps[0]),
        map50_95=float(aps.mean()),
        precision=p_at_f1,
        recall=r_at_f1,
        ap_per_iou=aps,
        map50_u=float(aps_u[0]),
        map50_95_u=float(aps_u.mean()),
    )
