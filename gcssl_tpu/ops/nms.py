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
