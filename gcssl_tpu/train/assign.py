"""Task-aligned label assignment (TAL) for the anchor-free detector.

The reference outsources assignment to Ultralytics' TaskAlignedAssigner
(used by the YOLOv8 trainer the reference invokes at
/root/reference/train.py:11-22).  This is an independent TPU-native
implementation of the published TOOD/YOLOv8 assignment rule with fully
static shapes so it jits cleanly:

  align(g, a) = p_a^alpha * IoU(pred_a, gt_g)^beta   for anchors a whose
  center lies inside gt_g; each GT takes its top-k anchors by align; anchor
  conflicts resolve to the GT with the highest IoU; the classification
  target of a positive anchor is its align score renormalized per-GT to
  peak at that GT's best IoU (soft, quality-aware targets).

Everything is computed in normalized cxcywh coordinates and vmapped over
the batch by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcssl_tpu.ops.boxes import cxcywh_to_xyxy, iou_pairwise


def tal_assign(
    pred_boxes: jax.Array,   # (N, 4) cxcywh normalized, decoded (stop-grad)
    pred_probs: jax.Array,   # (N,) sigmoid class probability (stop-grad)
    gt_boxes: jax.Array,     # (G, 4) cxcywh normalized
    gt_mask: jax.Array,      # (G,) bool
    anchors: jax.Array,      # (N, 2) normalized (x, y) cell centers
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Returns (cls_target (N,), box_target (N, 4) cxcywh, pos (N,))."""
    n = pred_boxes.shape[0]
    gt_xyxy = cxcywh_to_xyxy(gt_boxes)  # (G, 4)

    # candidate anchors: center strictly inside the GT box
    lx = anchors[None, :, 0] - gt_xyxy[:, None, 0]
    ty = anchors[None, :, 1] - gt_xyxy[:, None, 1]
    rx = gt_xyxy[:, None, 2] - anchors[None, :, 0]
    by = gt_xyxy[:, None, 3] - anchors[None, :, 1]
    inside = (
        (jnp.minimum(jnp.minimum(lx, rx), jnp.minimum(ty, by)) > 1e-9)
        & gt_mask[:, None]
    )  # (G, N)

    iou = iou_pairwise(gt_boxes, pred_boxes)  # (G, N)
    align = (pred_probs[None, :] ** alpha) * (iou ** beta)
    align = jnp.where(inside, align, 0.0)

    # top-k anchors per GT (static k); a slot only counts if align > 0.
    # NOT lax.top_k + scatter: top_k lowers to a full per-row sort on TPU
    # (G x N rows of 8400) and the scatter is serial — together ~23 ms of
    # an 84 ms train step at batch 16 (runs/det_m_mae/profile.json).  k
    # unrolled argmax-and-mask passes are pure VPU reductions with the
    # same selection (ties to the lower index, like top_k).
    k = min(topk, n)

    def take_max(carry, _):
        a, sel = carry
        idx = jnp.argmax(a, axis=1)                       # (G,)
        hit = jax.nn.one_hot(idx, n, dtype=bool)          # (G, N)
        pos_ok = jnp.take_along_axis(a, idx[:, None], 1) > 0.0
        sel = sel | (hit & pos_ok)
        a = jnp.where(hit, -jnp.inf, a)
        return (a, sel), None

    (_, sel), _ = jax.lax.scan(
        take_max, (align, jnp.zeros_like(align, dtype=bool)), length=k
    )

    # resolve anchors claimed by several GTs: keep the max-IoU GT
    claimed_iou = jnp.where(sel, iou, -1.0)          # (G, N)
    best_gt = jnp.argmax(claimed_iou, axis=0)        # (N,)
    pos = jnp.any(sel, axis=0)                       # (N,)

    # per-GT normalization: target peaks at the GT's best candidate IoU
    max_align = jnp.max(align, axis=1, keepdims=True)      # (G, 1)
    max_iou = jnp.max(jnp.where(sel, iou, 0.0), axis=1, keepdims=True)
    norm_align = align * max_iou / jnp.maximum(max_align, 1e-9)  # (G, N)

    cls_target = jnp.where(
        pos, norm_align[best_gt, jnp.arange(n)], 0.0
    )
    box_target = gt_boxes[best_gt]  # (N, 4); garbage where not pos
    return cls_target, box_target, pos
