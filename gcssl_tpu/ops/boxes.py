"""Box geometry, IoU/EIoU, and delta codecs (pure JAX).

Behavioral contract mirrors the reference implementation:

* EIoU / IoU formulas: /root/reference/cgan/losses.py:10-73,152-183
* smooth_clamp:        /root/reference/cgan/losses.py:99-106
* delta encode:        /root/reference/cgan/dataset.py:73-101 (_bbox2delta)
* delta apply (train/eval): /root/reference/cgan/losses.py:108-150
* delta apply (inference CLI): /root/reference/cgan/inference.py:69-89
  (NOTE: the reference uses *different* clamps at CLI inference time —
  delta clamp +-2 with no inner exp-clamp, and w/h bounds [0.01, 0.9];
  we preserve both variants.)

All functions take boxes in normalized YOLO ``(cx, cy, w, h)`` layout on the
last axis unless stated otherwise, broadcast over any leading batch axes, and
are differentiable where the reference path is differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-6


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), last-axis layout."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h), last-axis layout."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes_xyxy: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(boxes_xyxy, 4, axis=-1)
    return ((x2 - x1) * (y2 - y1))[..., 0]


def iou_elementwise(boxes_a: jax.Array, boxes_b: jax.Array, eps: float = EPS) -> jax.Array:
    """Elementwise IoU of aligned (..., 4) cxcywh boxes.

    Matches ``iou_metric`` at /root/reference/cgan/losses.py:152-183
    (denominator is union + eps; degenerate boxes give signed areas exactly
    as the reference does).
    """
    a = cxcywh_to_xyxy(boxes_a)
    b = cxcywh_to_xyxy(boxes_b)
    inter_x1 = jnp.maximum(a[..., 0], b[..., 0])
    inter_y1 = jnp.maximum(a[..., 1], b[..., 1])
    inter_x2 = jnp.minimum(a[..., 2], b[..., 2])
    inter_y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return inter / (union + eps)


def iou_pairwise(boxes_a: jax.Array, boxes_b: jax.Array, eps: float = EPS) -> jax.Array:
    """Pairwise IoU matrix for (Na, 4) x (Nb, 4) cxcywh boxes -> (Na, Nb).

    Vectorized equivalent of the reference's per-pair python loop at
    /root/reference/cgan/dataset.py:57-71,181-193.  Note the reference's
    scalar ``_bbox_iou`` divides by the exact union (0 -> IoU 0); we divide by
    union + eps which is equal to it within float tolerance for valid boxes
    and also maps union==0 to 0.
    """
    return iou_elementwise(boxes_a[..., :, None, :], boxes_b[..., None, :, :], eps)


def eiou(pred_boxes: jax.Array, target_boxes: jax.Array, eps: float = EPS) -> jax.Array:
    """Efficient-IoU score per box pair, (..., 4) cxcywh -> (...).

    EIoU = IoU - rho^2(centers)/c^2 - dw^2/c_w^2 - dh^2/c_h^2
    exactly as /root/reference/cgan/losses.py:19-70.
    """
    p = cxcywh_to_xyxy(pred_boxes)
    t = cxcywh_to_xyxy(target_boxes)

    inter_x1 = jnp.maximum(p[..., 0], t[..., 0])
    inter_y1 = jnp.maximum(p[..., 1], t[..., 1])
    inter_x2 = jnp.minimum(p[..., 2], t[..., 2])
    inter_y2 = jnp.minimum(p[..., 3], t[..., 3])
    inter = jnp.clip(inter_x2 - inter_x1, 0) * jnp.clip(inter_y2 - inter_y1, 0)

    area_p = (p[..., 2] - p[..., 0]) * (p[..., 3] - p[..., 1])
    area_t = (t[..., 2] - t[..., 0]) * (t[..., 3] - t[..., 1])
    union = area_p + area_t - inter
    iou = inter / (union + eps)

    enc_x1 = jnp.minimum(p[..., 0], t[..., 0])
    enc_y1 = jnp.minimum(p[..., 1], t[..., 1])
    enc_x2 = jnp.maximum(p[..., 2], t[..., 2])
    enc_y2 = jnp.maximum(p[..., 3], t[..., 3])
    enc_w = enc_x2 - enc_x1
    enc_h = enc_y2 - enc_y1
    enc_c = enc_w**2 + enc_h**2

    center_dist = (
        (pred_boxes[..., 0] - target_boxes[..., 0]) ** 2
        + (pred_boxes[..., 1] - target_boxes[..., 1]) ** 2
    )
    w_dist = (pred_boxes[..., 2] - target_boxes[..., 2]) ** 2
    h_dist = (pred_boxes[..., 3] - target_boxes[..., 3]) ** 2

    return (
        iou
        - center_dist / (enc_c + eps)
        - w_dist / (enc_w**2 + eps)
        - h_dist / (enc_h**2 + eps)
    )


def eiou_loss(
    pred_boxes: jax.Array,
    target_boxes: jax.Array,
    weights: jax.Array | None = None,
    eps: float = EPS,
) -> jax.Array:
    """1 - mean(EIoU): /root/reference/cgan/losses.py:73.

    ``weights`` (optional, broadcastable to the box batch) enables masked
    means over padded batches — needed on TPU where batches are fixed-shape.
    """
    e = eiou(pred_boxes, target_boxes, eps)
    if weights is None:
        return 1.0 - jnp.mean(e)
    wsum = jnp.maximum(jnp.sum(weights), eps)
    return 1.0 - jnp.sum(e * weights) / wsum


def smooth_clamp(
    x: jax.Array, min_val: float, max_val: float, temperature: float = 0.5
) -> jax.Array:
    """Differentiable sigmoid clamp: /root/reference/cgan/losses.py:99-106."""
    center = (min_val + max_val) / 2
    return min_val + (max_val - min_val) * jax.nn.sigmoid((x - center) / temperature)


def delta_encode(gt_boxes: jax.Array, pred_boxes: jax.Array) -> jax.Array:
    """Target delta = (dx_rel, dy_rel, log dw, log dh), (..., 4) cxcywh inputs.

    Mirrors ``CalibratorDataset._bbox2delta`` at
    /root/reference/cgan/dataset.py:73-101: center offsets normalized by
    max(sqrt(pred area), 0.05); log of w/h ratios clamped to [0.1, 10].
    """
    pred_area = pred_boxes[..., 2] * pred_boxes[..., 3]
    norm = jnp.maximum(jnp.sqrt(jnp.maximum(pred_area, 0.0)), 0.05)
    dx = (gt_boxes[..., 0] - pred_boxes[..., 0]) / norm
    dy = (gt_boxes[..., 1] - pred_boxes[..., 1]) / norm
    gt_w = jnp.maximum(gt_boxes[..., 2], EPS)
    gt_h = jnp.maximum(gt_boxes[..., 3], EPS)
    pred_w = jnp.maximum(pred_boxes[..., 2], EPS)
    pred_h = jnp.maximum(pred_boxes[..., 3], EPS)
    dw = jnp.log(jnp.clip(gt_w / pred_w, 0.1, 10.0))
    dh = jnp.log(jnp.clip(gt_h / pred_h, 0.1, 10.0))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def delta_apply(boxes: jax.Array, deltas: jax.Array, training: bool = True) -> jax.Array:
    """Apply correction deltas to boxes, (..., 4) cxcywh.

    Mirrors ``apply_delta_to_bbox`` at /root/reference/cgan/losses.py:108-150:
    delta clamped to +-1.5 (smooth sigmoid clamp when training, hard clamp in
    eval); centers shifted by delta * box size; w/h scaled by exp of the delta
    additionally hard-clipped to +-1; results bounded to cx,cy in [0.05,0.95],
    w,h in [0.02,0.8] (again smooth in training, hard in eval).

    NOTE the reference intentionally uses a *hard* inner clip on the exp
    arguments even in training (zero gradient outside +-1); we replicate that.
    """
    rng_clamp = 1.5
    if training:
        d = smooth_clamp(deltas, -rng_clamp, rng_clamp)
    else:
        d = jnp.clip(deltas, -rng_clamp, rng_clamp)

    cx = boxes[..., 0] + d[..., 0] * boxes[..., 2]
    cy = boxes[..., 1] + d[..., 1] * boxes[..., 3]
    w = boxes[..., 2] * jnp.exp(jnp.clip(d[..., 2], -1.0, 1.0))
    h = boxes[..., 3] * jnp.exp(jnp.clip(d[..., 3], -1.0, 1.0))

    if training:
        cx = smooth_clamp(cx, 0.05, 0.95)
        cy = smooth_clamp(cy, 0.05, 0.95)
        w = smooth_clamp(w, 0.02, 0.8)
        h = smooth_clamp(h, 0.02, 0.8)
    else:
        cx = jnp.clip(cx, 0.05, 0.95)
        cy = jnp.clip(cy, 0.05, 0.95)
        w = jnp.clip(w, 0.02, 0.8)
        h = jnp.clip(h, 0.02, 0.8)

    return jnp.stack([cx, cy, w, h], axis=-1)


def delta_apply_inference(boxes: jax.Array, deltas: jax.Array) -> jax.Array:
    """CLI-inference variant of delta application, (..., 4) cxcywh.

    Mirrors ``apply_delta_to_bbox_inference`` at
    /root/reference/cgan/inference.py:69-89: hard delta clamp +-2 (no inner
    exp clip), box bounds cx,cy in [0.05,0.95] and w,h in [0.01,0.9].
    """
    d = jnp.clip(deltas, -2.0, 2.0)
    cx = boxes[..., 0] + d[..., 0] * boxes[..., 2]
    cy = boxes[..., 1] + d[..., 1] * boxes[..., 3]
    w = boxes[..., 2] * jnp.exp(d[..., 2])
    h = boxes[..., 3] * jnp.exp(d[..., 3])
    cx = jnp.clip(cx, 0.05, 0.95)
    cy = jnp.clip(cy, 0.05, 0.95)
    w = jnp.clip(w, 0.01, 0.9)
    h = jnp.clip(h, 0.01, 0.9)
    return jnp.stack([cx, cy, w, h], axis=-1)
