"""Stage 2a: two-stage (high/low confidence) pseudo-labeling.

Twin of /root/reference/Two-stage pseudo-labeling.py:

* Stage 1: predict the unlabeled pool with TTA at conf_high (0.85); images
  with >= 1 box go to ``stage1/high`` (image copy + YOLO txt, no conf),
  the rest to ``stage1/low/images`` (:48-57).
* Stage 2: re-predict the kept images at conf_low (0.40); boxes split at
  conf_high; low boxes whose max IoU against the high set >= overlap_thr
  (0.35) are dropped; surviving low boxes concat with the *stage-1* high
  boxes and are rewritten under ``stage2/high`` (:68-111).

TPU-native: predictions run as jitted batches over the whole pool (the
reference does one model.predict per image); the per-image IoU overlap
filter and file routing stay host-side (numpy) — the box sets are tiny and
per-image device calls would cost a round trip each.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from gcssl_tpu.core.config import DetectorConfig, PseudoLabelConfig
from gcssl_tpu.data.detection import load_detection_tree, map_boxes_from_letterbox
from gcssl_tpu.data.yolo import list_images, load_yolo_txt, save_yolo_txt
from gcssl_tpu.pipeline.detect import predict_arrays


def _filter_low_by_overlap(
    low_boxes: np.ndarray, high_boxes: np.ndarray, overlap_thr: float
) -> np.ndarray:
    """Keep low-conf boxes whose max IoU vs high boxes < thr
    (Two-stage pseudo-labeling.py:86-93, helper iou_max :24-25).

    Pure numpy: the per-image box sets here are tiny, and a device call per
    image costs a full host<->device round trip on remote-attached TPUs —
    measured ~1 s/image through the relay, which dominated stage 2.
    """
    if len(low_boxes) == 0:
        return np.zeros(0, bool)
    if len(high_boxes) == 0:
        return np.ones(len(low_boxes), bool)
    lo = np.asarray(low_boxes, np.float32)
    hi = np.asarray(high_boxes, np.float32)
    lo_xy = np.concatenate([lo[:, :2] - lo[:, 2:] / 2, lo[:, :2] + lo[:, 2:] / 2], 1)
    hi_xy = np.concatenate([hi[:, :2] - hi[:, 2:] / 2, hi[:, :2] + hi[:, 2:] / 2], 1)
    tl = np.maximum(lo_xy[:, None, :2], hi_xy[None, :, :2])
    br = np.minimum(lo_xy[:, None, 2:], hi_xy[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_lo = np.prod(lo[:, 2:], axis=-1)[:, None]
    area_hi = np.prod(hi[:, 2:], axis=-1)[None, :]
    iou = inter / np.maximum(area_lo + area_hi - inter, 1e-9)
    return iou.max(axis=1) < overlap_thr


def two_stage_pseudo_label(
    det_cfg: DetectorConfig,
    pl_cfg: PseudoLabelConfig,
    predict_fn,
    params,
    source_dir: str | Path,
    dest_dir: str | Path,
    batch_size: int = 16,
    dp: int = 1,
) -> dict:
    """Run both stages; returns counts {stage1_high, stage1_low, stage2_high}.

    ``dp``: data-parallel inference over the first ``dp`` devices for both
    predict passes (pipeline/detect.py:predict_arrays)."""
    source_dir, dest_dir = Path(source_dir), Path(dest_dir)
    stage1, stage2 = dest_dir / "stage1", dest_dir / "stage2"
    high_img1, high_lab1 = stage1 / "high" / "images", stage1 / "high" / "labels"
    low_img1 = stage1 / "low" / "images"
    high_img2, high_lab2 = stage2 / "high" / "images", stage2 / "high" / "labels"
    for d in (high_img1, high_lab1, low_img1, high_img2, high_lab2):
        d.mkdir(parents=True, exist_ok=True)

    paths = list_images(source_dir)
    arrays = load_detection_tree(
        source_dir, det_cfg.img_size, det_cfg.max_boxes,
        labels_dir="/nonexistent", image_list=paths,
    )

    # ---- stage 1: high-confidence pass (TTA) ----
    boxes1, scores1 = predict_arrays(
        predict_fn, params, arrays,
        conf_thr=pl_cfg.conf_high, iou_thr=pl_cfg.iou_nms,
        tta=pl_cfg.tta, fuse=pl_cfg.fuse, batch_size=batch_size, dp=dp,
    )
    kept_names: list[str] = []
    kept_idx: list[int] = []
    for i, p in enumerate(paths):
        w, h = arrays.orig_wh[i]
        b = map_boxes_from_letterbox(boxes1[i], float(w), float(h))
        if len(b) == 0:
            shutil.copy2(p, low_img1 / p.name)
            continue
        shutil.copy2(p, high_img1 / p.name)
        save_yolo_txt(
            high_lab1 / f"{p.stem}.txt",
            np.zeros(len(b), np.int32), np.clip(b, 0, 1),
        )
        kept_names.append(p.name)
        kept_idx.append(i)
    (stage1 / "high_list.txt").write_text("\n".join(kept_names) + "\n")

    # ---- stage 2: low-confidence completion pass on kept images ----
    kept_paths = [paths[i] for i in kept_idx]
    del arrays, boxes1  # 11k x 640px uint8 = 13.5 GB; free before stage-2 load
    sub = load_detection_tree(
        source_dir, det_cfg.img_size, det_cfg.max_boxes,
        labels_dir="/nonexistent", image_list=kept_paths,
    )
    boxes2, scores2 = predict_arrays(
        predict_fn, params, sub,
        conf_thr=pl_cfg.conf_low, iou_thr=pl_cfg.iou_nms,
        tta=pl_cfg.tta, fuse=pl_cfg.fuse, batch_size=batch_size, dp=dp,
    )
    n_stage2 = 0
    for k, p in enumerate(kept_paths):
        w, h = sub.orig_wh[k]
        # stage-1 high boxes re-read from txt (reference :74-76)
        _, hi1, _ = load_yolo_txt(high_lab1 / f"{p.stem}.txt", min_fields=5)
        b2 = map_boxes_from_letterbox(boxes2[k], float(w), float(h))
        s2 = scores2[k]
        hi_mask = s2 >= pl_cfg.conf_high
        lo_boxes = b2[~hi_mask]
        hi2_boxes = b2[hi_mask]
        keep = _filter_low_by_overlap(lo_boxes, hi2_boxes, pl_cfg.overlap_thr)
        final = np.concatenate([hi1, lo_boxes[keep]], axis=0) if keep.any() else hi1
        if len(final):
            shutil.copy2(p, high_img2 / p.name)
            save_yolo_txt(
                high_lab2 / f"{p.stem}.txt",
                np.zeros(len(final), np.int32), np.clip(final, 0, 1),
            )
            n_stage2 += 1
            # optional only-low routing (reference NEED_ONLY_LOW flag)
            if pl_cfg.need_only_low and len(hi1) == 0:
                only_img = stage2 / "only_low" / "images"
                only_lab = stage2 / "only_low" / "labels"
                only_img.mkdir(parents=True, exist_ok=True)
                only_lab.mkdir(parents=True, exist_ok=True)
                shutil.copy2(p, only_img / p.name)
                save_yolo_txt(
                    only_lab / f"{p.stem}.txt",
                    np.zeros(len(final), np.int32), np.clip(final, 0, 1),
                )

    return {
        "stage1_high": len(kept_names),
        "stage1_low": len(paths) - len(kept_names),
        "stage2_high": n_stage2,
    }
