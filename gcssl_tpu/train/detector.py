"""Detector training: FCOS-style assignment, focal + CIoU losses, fused
jitted step, and a YOLO-style train loop with early stopping on val mAP50.

Replaces the Ultralytics training the reference leans on
(/root/reference/train.py:11-22: imgsz 640, epochs 400, patience 20, batch 32,
AMP) with a TPU-native trainer: device-resident uint8 images, device-side
augmentation (hflip + scale/translate jitter fused into the step), bf16
compute, data-parallel over the mesh 'data' axis.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.models.detector import STRIDES, Detector, decode_all
from gcssl_tpu.ops.boxes import cxcywh_to_xyxy, iou_elementwise


class DetectorTrainState(struct.PyTreeNode):
    params: Any
    ema_params: Any
    opt: Any
    rng: jax.Array
    step: jax.Array


# ---------------------------------------------------------------------------
# target assignment (dense, static shapes)
# ---------------------------------------------------------------------------

# per-level ltrb regression ranges in pixels (FCOS-style level assignment)
LEVEL_RANGES = ((0.0, 64.0), (64.0, 128.0), (128.0, 1e8))
CENTER_RADIUS = 2.5  # center sampling radius in stride units


def assign_targets_level(
    gt_boxes: jax.Array,   # (G, 4) cxcywh normalized
    gt_mask: jax.Array,    # (G,) bool
    stride: int,
    h: int,
    w: int,
    img_size: int,
    level: int,
):
    """Dense targets for one level: for every cell, pick the min-area GT whose
    center region contains the cell center and whose max-ltrb falls in the
    level's range.  Returns (cls_target (H*W,), box_target (H*W, 4) xyxy px,
    pos_mask (H*W,))."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = cx.reshape(-1)  # (N,)
    cy = cy.reshape(-1)

    gt_px = gt_boxes * img_size  # cxcywh in pixels
    x1 = gt_px[:, 0] - gt_px[:, 2] / 2
    y1 = gt_px[:, 1] - gt_px[:, 3] / 2
    x2 = gt_px[:, 0] + gt_px[:, 2] / 2
    y2 = gt_px[:, 1] + gt_px[:, 3] / 2

    # ltrb of every (cell, gt) pair: (N, G)
    l = cx[:, None] - x1[None, :]
    t = cy[:, None] - y1[None, :]
    r = x2[None, :] - cx[:, None]
    b = y2[None, :] - cy[:, None]
    inside = jnp.minimum(jnp.minimum(l, r), jnp.minimum(t, b)) > 0

    # center sampling: cell center within radius*stride of GT center
    radius = CENTER_RADIUS * stride
    near = (jnp.abs(cx[:, None] - gt_px[None, :, 0]) < radius) & (
        jnp.abs(cy[:, None] - gt_px[None, :, 1]) < radius
    )

    max_ltrb = jnp.maximum(jnp.maximum(l, r), jnp.maximum(t, b))
    lo, hi = LEVEL_RANGES[level]
    in_range = (max_ltrb >= lo) & (max_ltrb < hi)

    candidate = inside & near & in_range & gt_mask[None, :]
    area = gt_px[:, 2] * gt_px[:, 3]
    big = 1e12
    cand_area = jnp.where(candidate, area[None, :], big)
    best_gt = jnp.argmin(cand_area, axis=1)            # (N,)
    pos = jnp.min(cand_area, axis=1) < big             # (N,)

    box_target = jnp.stack([x1, y1, x2, y2], axis=1)[best_gt]  # (N, 4) px
    return box_target, pos


def detection_loss(outs, gt_boxes, gt_mask, img_size: int, weights):
    """Focal classification + CIoU-style box loss over all levels.

    outs: list of (cls_logits (B,H,W,C), ltrb (B,H,W,4)); single-class C=1.
    gt_boxes: (B, G, 4) normalized cxcywh; gt_mask: (B, G); weights: (B,).
    """
    alpha, gamma = 0.25, 2.0
    total_cls, total_box, total_pos = 0.0, 0.0, 0.0
    for level, ((cls_logits, ltrb), stride) in enumerate(zip(outs, STRIDES)):
        bsz, h, w, _ = cls_logits.shape
        n = h * w

        box_t, pos = jax.vmap(
            lambda gb, gm: assign_targets_level(
                gb, gm, stride, h, w, img_size, level
            )
        )(gt_boxes, gt_mask)
        # (B, N, 4), (B, N)

        logits = cls_logits.reshape(bsz, n)
        target = pos.astype(jnp.float32)
        p = jax.nn.sigmoid(logits)
        ce = optax.sigmoid_binary_cross_entropy(logits, target)
        p_t = p * target + (1 - p) * (1 - target)
        a_t = alpha * target + (1 - alpha) * (1 - target)
        focal = a_t * (1 - p_t) ** gamma * ce
        total_cls += jnp.sum(focal * weights[:, None])

        # box regression on positives: IoU loss between decoded and target
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        d = ltrb.reshape(bsz, n, 4) * stride
        px1 = cx.reshape(-1)[None] - d[..., 0]
        py1 = cy.reshape(-1)[None] - d[..., 1]
        px2 = cx.reshape(-1)[None] + d[..., 2]
        py2 = cy.reshape(-1)[None] + d[..., 3]
        pred_cxcywh = jnp.stack(
            [(px1 + px2) / 2, (py1 + py2) / 2, px2 - px1, py2 - py1], axis=-1
        )
        tgt_cxcywh = jnp.stack(
            [
                (box_t[..., 0] + box_t[..., 2]) / 2,
                (box_t[..., 1] + box_t[..., 3]) / 2,
                box_t[..., 2] - box_t[..., 0],
                box_t[..., 3] - box_t[..., 1],
            ],
            axis=-1,
        )
        iou = iou_elementwise(pred_cxcywh / img_size, tgt_cxcywh / img_size)
        box_l = (1.0 - iou) * pos * weights[:, None]
        total_box += jnp.sum(box_l)
        total_pos += jnp.sum(pos * weights[:, None])

    norm = jnp.maximum(total_pos, 1.0)
    return total_cls / norm, total_box / norm


# ---------------------------------------------------------------------------
# augmentation (device-side, fused into the step)
# ---------------------------------------------------------------------------


def augment_batch(rng, images, boxes, mask):
    """hflip (p=.5) + brightness jitter; boxes follow the flip."""
    b = images.shape[0]
    r1, r2 = jax.random.split(rng)
    flip = jax.random.bernoulli(r1, 0.5, (b,))
    flipped = jnp.flip(images, axis=2)
    images = jnp.where(flip[:, None, None, None], flipped, images)
    fboxes = boxes.at[..., 0].set(1.0 - boxes[..., 0])
    boxes = jnp.where(flip[:, None, None], fboxes, boxes)
    gain = jax.random.uniform(r2, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    images = jnp.clip(images * gain, 0.0, 1.0)
    return images, boxes, mask


def mosaic_batch(rng, images4, boxes4, mask4):
    """Device-side 4-image mosaic (static shapes).

    Each output sample places 4 source images into the quadrants of a random
    center split — the small-object-friendly augmentation Ultralytics relies
    on for from-scratch training.  Implemented as 4 per-sample
    scale_and_translate resizes + quadrant masks (all MXU/VPU work, no host).

    Args:
        images4: (B, 4, S, S, 3) float source images.
        boxes4: (B, 4, M, 4) normalized cxcywh per source.
        mask4: (B, 4, M) bool.
    Returns:
        (images (B, S, S, 3), boxes (B, 4*M, 4), mask (B, 4*M))
    """
    b, _, s, _, c = images4.shape
    m = boxes4.shape[2]
    cx = jax.random.uniform(rng, (b,), minval=0.3, maxval=0.7)
    cy = jax.random.uniform(jax.random.fold_in(rng, 1), (b,), minval=0.3, maxval=0.7)

    def one(imgs, bxs, msk, ccx, ccy):
        # quadrant rects in normalized coords: (x0, y0, x1, y1)
        rects = jnp.stack(
            [
                jnp.stack([0.0, 0.0, ccx, ccy]),
                jnp.stack([ccx, 0.0, 1.0, ccy]),
                jnp.stack([0.0, ccy, ccx, 1.0]),
                jnp.stack([ccx, ccy, 1.0, 1.0]),
            ]
        )  # (4, 4)

        grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

        def place(img, rect):
            x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
            scale = jnp.stack([(y1 - y0), (x1 - x0)])  # full img -> quadrant
            translation = jnp.stack([y0 * s, x0 * s])
            out = jax.image.scale_and_translate(
                img, (s, s, c), (0, 1), scale, translation,
                method="linear", antialias=True,
            )
            row_in = (grid >= y0) & (grid < y1)
            col_in = (grid >= x0) & (grid < x1)
            return out, (row_in[:, None] & col_in[None, :]).astype(img.dtype)

        outs, masks = jax.vmap(place)(imgs, rects)  # (4, S, S, C), (4, S, S)
        canvas = jnp.sum(outs * masks[..., None], axis=0)

        # boxes: source normalized -> quadrant
        qx0, qy0 = rects[:, 0], rects[:, 1]
        qw = rects[:, 2] - rects[:, 0]
        qh = rects[:, 3] - rects[:, 1]
        nbx = jnp.stack(
            [
                qx0[:, None] + bxs[..., 0] * qw[:, None],
                qy0[:, None] + bxs[..., 1] * qh[:, None],
                bxs[..., 2] * qw[:, None],
                bxs[..., 3] * qh[:, None],
            ],
            axis=-1,
        )  # (4, M, 4)
        # drop boxes that became tiny slivers
        nmsk = msk & (nbx[..., 2] > 0.004) & (nbx[..., 3] > 0.004)
        return canvas, nbx.reshape(4 * m, 4), nmsk.reshape(4 * m)

    return jax.vmap(one)(images4, boxes4, mask4, cx, cy)


def create_detector_state(cfg: DetectorConfig, rng: jax.Array):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = Detector(
        num_classes=cfg.num_classes,
        width_mult=cfg.width_mult,
        depth_mult=cfg.depth_mult,
        dtype=dtype,
    )
    rng, init_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    params = model.init(init_rng, dummy)["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.scale_by_adam(),
        optax.add_decayed_weights(cfg.weight_decay),
    )
    state = DetectorTrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt=tx.init(params),
        rng=rng,
        step=jnp.asarray(0, jnp.int32),
    )
    return state, model, tx


def make_detector_train_step(cfg: DetectorConfig, model, tx):
    """Fused step over 4-tuples of source images: mosaic (flag-gated) +
    hflip/brightness aug + forward/backward + Adam + weight EMA, all one
    compiled program."""

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("use_mosaic",))
    def step(state, images4_u8, boxes4, mask4, weights, lr, use_mosaic: bool = True):
        rng, mosaic_rng, aug_rng = jax.random.split(state.rng, 3)
        images4 = images4_u8.astype(jnp.float32) / 255.0
        if use_mosaic:
            images, boxes, mask = mosaic_batch(mosaic_rng, images4, boxes4, mask4)
        else:
            images, boxes, mask = images4[:, 0], boxes4[:, 0], mask4[:, 0]
        images, boxes, mask = augment_batch(aug_rng, images, boxes, mask)

        def loss_fn(params):
            outs = model.apply({"params": params}, images)
            cls_l, box_l = detection_loss(outs, boxes, mask, cfg.img_size, weights)
            return cls_l + box_l, (cls_l, box_l)

        (loss, (cls_l, box_l)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates)
        )
        d = cfg.ema_decay
        # warmup the decay so early EMA isn't dominated by the random init
        d_eff = jnp.minimum(d, (1.0 + state.step) / (10.0 + state.step)) if d > 0 else 0.0
        ema_params = (
            jax.tree.map(lambda e, p: e * d_eff + p * (1 - d_eff),
                         state.ema_params, params)
            if d > 0 else state.ema_params
        )
        new_state = state.replace(
            params=params, ema_params=ema_params, opt=opt, rng=rng,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "cls": cls_l, "box": box_l}

    return step


def eval_params(cfg: DetectorConfig, state: DetectorTrainState):
    """Parameters to use for evaluation/prediction (EMA when enabled)."""
    return state.ema_params if cfg.ema_decay > 0 else state.params


def make_detector_predict(
    cfg: DetectorConfig,
    model,
    max_out: int | None = None,
    pre_nms_topk: int = 300,
):
    """Batched jitted predict: images -> (boxes (B, K, 4) cxcywh, scores
    (B, K), valid (B, K)) after confidence threshold + NMS.

    NMS runs on the top ``pre_nms_topk`` candidates per image — the dense
    grid is ~8.4k cells at 640px and a full pairwise IoU there would be a
    B x 8400^2 tensor (36 GB at batch 16); top-k first keeps it at
    B x 300^2."""
    from gcssl_tpu.ops.nms import nms

    max_out = max_out or cfg.max_boxes

    @functools.partial(jax.jit, static_argnames=("conf_thr", "iou_thr", "tta"))
    def predict(params, images_u8, conf_thr: float, iou_thr: float, tta: bool = False):
        images = images_u8.astype(jnp.float32) / 255.0
        outs = model.apply({"params": params}, images)
        scores, boxes = decode_all(outs, cfg.img_size)
        if tta:
            # hflip TTA: merged candidate set (mirror of the reference's
            # augment=True predicts)
            outs_f = model.apply({"params": params}, jnp.flip(images, axis=2))
            s2, b2 = decode_all(outs_f, cfg.img_size)
            b2 = b2.at[..., 0].set(1.0 - b2[..., 0])
            scores = jnp.concatenate([scores, s2], axis=1)
            boxes = jnp.concatenate([boxes, b2], axis=1)
        conf = scores[..., 0]  # single class
        k = min(pre_nms_topk, conf.shape[1])
        top_conf, top_idx = jax.lax.top_k(conf, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        valid = top_conf >= conf_thr

        def per_image(bx, sc, vl):
            keep, kv = nms(bx, sc, iou_thr, max_out, valid_mask=vl)
            return bx[keep], sc[keep], kv

        return jax.vmap(per_image)(top_boxes, top_conf, valid)

    return predict
