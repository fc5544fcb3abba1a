"""Fixed-shape non-maximum suppression for XLA.

The reference delegates NMS to Ultralytics/torchvision
(/root/reference/Two-stage pseudo-labeling.py:50 ``iou=IOU_NMS``,
/root/reference/kfold_train_and_pseudo.py:121).  TPU-native rebuild: a
static-shape greedy NMS expressed as ``lax.fori_loop`` over score-sorted
candidates with a suppression mask — no dynamic shapes, jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gcssl_tpu.ops.boxes import iou_pairwise


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_thr: float,
    max_out: int,
    valid_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Greedy NMS over (N, 4) cxcywh boxes with (N,) scores.

    Args:
        boxes: (N, 4) cxcywh (any consistent coordinate space).
        scores: (N,) confidence scores; invalid entries should be -inf or
            masked via ``valid_mask``.
        iou_thr: suppress boxes with IoU > thr against a kept box
            (matches torchvision semantics: strictly-greater suppresses).
        max_out: static number of survivors to emit.

    Returns:
        (keep_idx (max_out,) int32, keep_valid (max_out,) bool) — indices into
        the input arrays, padded with 0 where invalid.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-s)  # descending
    boxes_sorted = boxes[order]
    s_sorted = s[order]
    iou = iou_pairwise(boxes_sorted, boxes_sorted)  # (N, N)

    def body(i, alive):
        # If candidate i is still alive, suppress all later boxes overlapping it.
        row = iou[i] > iou_thr
        later = jnp.arange(n) > i
        suppress = row & later & alive[i]
        return alive & ~suppress

    alive = jnp.isfinite(s_sorted)
    alive = jax.lax.fori_loop(0, n, body, alive)

    # Gather up to max_out survivors in score order.
    alive_rank = jnp.cumsum(alive) - 1  # rank among survivors
    slot = jnp.where(alive, alive_rank, max_out)
    keep_sorted_idx = jnp.full((max_out,), n, dtype=jnp.int32)
    keep_sorted_idx = keep_sorted_idx.at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    # scatter with mode="drop" ignores slot == max_out (suppressed/overflow)
    keep_valid = keep_sorted_idx < n
    keep_sorted_idx = jnp.where(keep_valid, keep_sorted_idx, 0)
    keep_idx = order[keep_sorted_idx].astype(jnp.int32)
    keep_idx = jnp.where(keep_valid, keep_idx, 0)
    return keep_idx, keep_valid


def nms_fused(
    boxes: jax.Array,
    scores: jax.Array,
    iou_thr: float,
    max_out: int,
    valid_mask: jax.Array | None = None,
    rel_score_thr: float = 0.5,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy NMS with weighted box fusion (WBF-style coordinate merging).

    Identical survivor selection to :func:`nms`, but each survivor's
    coordinates become the confidence-weighted mean of its suppression
    cluster — itself plus every box it suppressed.  With TTA the same
    object produces several near-duplicate candidates (original + flipped
    views); plain NMS keeps one arbitrary member while fusion averages out
    the per-view localization noise.  (Solovyev et al., "Weighted Boxes
    Fusion", 2021 — public technique; the reference has no equivalent, its
    Ultralytics ``augment=True`` merges candidates with plain NMS.)

    ``rel_score_thr``: a cluster member only contributes to the average if
    its score is >= this fraction of the cluster leader's.  Without it, a
    low-confidence-threshold regime (e.g. mAP eval at conf 1e-3) floods
    each cluster with hundreds of near-zero-score candidates whose summed
    weight outvotes the one confident box; classic WBF never sees this
    because it fuses small post-NMS candidate sets.

    Returns:
        (fused_boxes (max_out, 4), scores (max_out,), keep_valid (max_out,)).
        Scores are the cluster maxima (the kept box's own score), so
        downstream confidence thresholds behave exactly as with ``nms``.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = scores if valid_mask is None else jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-s)
    boxes_sorted = boxes[order]
    s_sorted = s[order]
    iou = iou_pairwise(boxes_sorted, boxes_sorted)

    def body(i, alive):
        row = iou[i] > iou_thr
        later = jnp.arange(n) > i
        suppress = row & later & alive[i]
        return alive & ~suppress

    alive = jnp.isfinite(s_sorted)
    alive = jax.lax.fori_loop(0, n, body, alive)

    # Cluster ownership: box j belongs to the EARLIEST surviving box i <= j
    # that overlaps it — exactly the box that suppressed it in the greedy
    # loop (for a survivor, the only overlapping survivor at or before
    # itself is itself, IoU = 1).
    idx = jnp.arange(n)
    finite = jnp.isfinite(s_sorted)
    member = alive[:, None] & (iou > iou_thr) & (idx[:, None] <= idx[None, :])
    member = member & finite[None, :]
    owner = jnp.argmax(member, axis=0)                      # (N,) first-true
    owned = member[owner, idx]                              # j has an owner at all
    near_leader = s_sorted >= rel_score_thr * s_sorted[owner]
    w = jnp.where(owned & finite & near_leader,
                  jnp.maximum(s_sorted, 0.0), 0.0)
    onehot = (owner[None, :] == idx[:, None]) & owned[None, :]   # (N owners, N)
    wsum = (onehot * w[None, :]).sum(axis=1)
    fused = (onehot * w[None, :]) @ boxes_sorted / jnp.maximum(wsum, 1e-12)[:, None]
    fused = jnp.where((wsum > 0)[:, None], fused, boxes_sorted)

    alive_rank = jnp.cumsum(alive) - 1
    slot = jnp.where(alive, alive_rank, max_out)
    keep_sorted_idx = jnp.full((max_out,), n, dtype=jnp.int32)
    keep_sorted_idx = keep_sorted_idx.at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    keep_valid = keep_sorted_idx < n
    keep_sorted_idx = jnp.where(keep_valid, keep_sorted_idx, 0)
    out_boxes = fused[keep_sorted_idx]
    out_scores = s_sorted[keep_sorted_idx]
    out_boxes = jnp.where(keep_valid[:, None], out_boxes, 0.0)
    out_scores = jnp.where(keep_valid, out_scores, 0.0)
    return out_boxes, out_scores, keep_valid
