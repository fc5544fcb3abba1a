"""Box matching strategies (vectorized JAX + host variants).

Two matchers from the reference, both preserved exactly:

* many-to-one greedy — each pred independently takes its best-IoU GT
  (one GT may be matched by several preds); used to build calibrator
  training pairs.  Reference: /root/reference/cgan/dataset.py:181-205
  (misnamed ``_hungarian_matching`` there) and
  /root/reference/create_paired_patches.py:84-113.
* one-to-one greedy — iterate GT boxes in file order, each takes the
  best-IoU *unmatched* same-class pred; used by the pseudo-vs-GT
  P/R/F1 evaluator.  Reference: /root/reference/compare_pseudo_vs_gt.py:53-67.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.ops.boxes import iou_pairwise


def match_greedy_many_to_one(
    pred_boxes: jax.Array,
    gt_boxes: jax.Array,
    iou_thr: float,
    pred_mask: jax.Array | None = None,
    gt_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-pred argmax matching against GT boxes.

    Args:
        pred_boxes: (Np, 4) cxcywh.
        gt_boxes: (Ng, 4) cxcywh.
        iou_thr: minimum IoU to accept a match.
        pred_mask / gt_mask: optional boolean validity masks for padded
            fixed-shape batches (TPU-friendly: shapes stay static).

    Returns:
        (best_gt_idx (Np,), best_iou (Np,), matched (Np,) bool)
    """
    iou = iou_pairwise(pred_boxes, gt_boxes)  # (Np, Ng)
    if gt_mask is not None:
        iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt_idx = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    matched = best_iou >= iou_thr
    if pred_mask is not None:
        matched = matched & pred_mask
    return best_gt_idx, best_iou, matched


def match_greedy_one_to_one(
    gt_boxes: np.ndarray,
    gt_cls: np.ndarray,
    pred_boxes: np.ndarray,
    pred_cls: np.ndarray,
    iou_thr: float,
) -> tuple[int, int, int, np.ndarray]:
    """Order-dependent greedy 1:1 matching for the P/R/F1 evaluator.

    Host-side (numpy) because the semantics are inherently sequential: GT
    boxes claim preds in file order, strictly-greater IoU wins
    (/root/reference/compare_pseudo_vs_gt.py:53-67), and the workload is
    tiny (per-image box lists) — not a TPU op.

    Returns:
        (tp, fp, fn, matched_pred_flags)
    """
    n_gt, n_pred = len(gt_boxes), len(pred_boxes)
    matched = np.zeros(n_pred, dtype=bool)
    tp = fn = 0
    if n_pred:
        iou_mat = (
            np.asarray(iou_pairwise(jnp.asarray(gt_boxes, jnp.float32),
                                    jnp.asarray(pred_boxes, jnp.float32)))
            if n_gt
            else np.zeros((0, n_pred))
        )
    else:
        iou_mat = np.zeros((n_gt, 0))
    for g in range(n_gt):
        best_iou, best_j = 0.0, None
        for j in range(n_pred):
            if matched[j] or pred_cls[j] != gt_cls[g]:
                continue
            iou = float(iou_mat[g, j])
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_iou >= iou_thr and best_j is not None:
            tp += 1
            matched[best_j] = True
        else:
            fn += 1
    fp = int(n_pred - matched.sum())
    return tp, fp, fn, matched
