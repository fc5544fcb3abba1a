"""Calibrator pair dataset: index build, patch materialization, device residency.

Index semantics mirror ``CalibratorDataset._prepare_index``
(/root/reference/cgan/dataset.py:128-153): for each ``labels_pred/*.txt``
(sorted) with an existing ``labels_gt/<stem>.txt`` and ``images/<stem>.jpg``,
greedy many-to-one IoU matching (threshold from config, default 0.25) of pred
boxes (rows with a conf column) against GT boxes, one sample per accepted
(pred, gt) pair with the delta target of dataset.py:73-101.

TPU-first materialization: instead of a per-item PIL DataLoader, ALL samples
are pre-cropped once (pred/gt 128x128 patches, PIL-bicubic, byte-faithful to
the reference's ``_letterbox``) and stored as uint8 arrays, together with one
letterboxed ``canvas`` per source image for the on-device differentiable
refined-patch crop.  The whole pack fits in HBM (≈2 GB for the reference's
18.5k pairs), so an epoch runs with ZERO host->device transfers: the train
step gathers its batch by index on device.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from gcssl_tpu.data.yolo import load_yolo_txt


@dataclass
class CalibratorSample:
    img_path: Path
    pred_box: np.ndarray  # (4,) cxcywh normalized
    gt_box: np.ndarray    # (4,)
    delta: np.ndarray     # (4,) target


@dataclass
class CalibratorArrays:
    """Materialized dataset, ready for device residency."""

    pred_patch: np.ndarray   # (N, S, S, 3) uint8
    gt_patch: np.ndarray     # (N, S, S, 3) uint8
    delta: np.ndarray        # (N, 4) f32
    pred_box: np.ndarray     # (N, 4) f32 — original-image normalized coords
    gt_box: np.ndarray       # (N, 4) f32
    canvas_idx: np.ndarray   # (N,) int32 — into canvases
    canvases: np.ndarray     # (M, C, C, 3) uint8 — letterboxed full images
    canvas_wh: np.ndarray    # (M, 2) f32 — original (W, H) per canvas
    img_size: int
    canvas_size: int

    def __len__(self) -> int:
        return len(self.delta)


def _np_iou_matrix(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Pairwise IoU on cxcywh (numpy, exact-union denominator)."""
    def corners(b):
        return np.stack(
            [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
             b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1)
    a, b = corners(pred)[:, None, :], corners(gt)[None, :, :]
    iw = np.clip(np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]), 0, None)
    ih = np.clip(np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]), 0, None)
    inter = iw * ih
    area_a = (pred[:, 2] * pred[:, 3])[:, None]
    area_b = (gt[:, 2] * gt[:, 3])[None, :]
    union = area_a + area_b - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def _delta_encode_np(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.delta_encode (dataset.py:73-101) for index build."""
    norm = max(float(np.sqrt(max(pred[2] * pred[3], 0.0))), 0.05)
    eps = 1e-6
    dx = (float(gt[0]) - float(pred[0])) / norm
    dy = (float(gt[1]) - float(pred[1])) / norm
    w_ratio = min(10.0, max(0.1, max(float(gt[2]), eps) / max(float(pred[2]), eps)))
    h_ratio = min(10.0, max(0.1, max(float(gt[3]), eps) / max(float(pred[3]), eps)))
    return np.asarray([dx, dy, np.log(w_ratio), np.log(h_ratio)], np.float32)


def build_index(root: str | Path, iou_thr: float = 0.25) -> list[CalibratorSample]:
    """Scan {images, labels_gt, labels_pred} and build matched samples."""
    root = Path(root)
    img_dir, gt_dir, pred_dir = root / "images", root / "labels_gt", root / "labels_pred"
    samples: list[CalibratorSample] = []
    for txt_pred in sorted(pred_dir.glob("*.txt")):
        name = txt_pred.stem
        txt_gt = gt_dir / f"{name}.txt"
        img_path = img_dir / f"{name}.jpg"
        if not txt_gt.exists() or not img_path.exists():
            continue
        _, gt_boxes, _ = load_yolo_txt(txt_gt, min_fields=5)
        _, pred_boxes, _ = load_yolo_txt(txt_pred, min_fields=6)
        if len(gt_boxes) == 0 or len(pred_boxes) == 0:
            continue
        iou = _np_iou_matrix(pred_boxes, gt_boxes)
        best_gt = iou.argmax(axis=1)
        best_iou = iou.max(axis=1)
        for i in range(len(pred_boxes)):
            if best_iou[i] >= iou_thr:
                pb, gb = pred_boxes[i], gt_boxes[best_gt[i]]
                samples.append(
                    CalibratorSample(img_path, pb, gb, _delta_encode_np(gb, pb))
                )
    return samples


def _pil_letterbox_crop(img, box_cxcywh: np.ndarray, out_size: int):
    """Byte-faithful host twin of the reference crop (dataset.py:103-124)."""
    from PIL import Image, ImageOps

    W, H = img.size
    cx, cy, w, h = [float(v) for v in box_cxcywh]
    px, py, pw, ph = cx * W, cy * H, w * W, h * H
    x1 = max(0, px - pw / 2)
    y1 = max(0, py - ph / 2)
    x2 = min(W, px + pw / 2)
    y2 = min(H, py + ph / 2)
    crop = img.crop((int(x1), int(y1), int(x2), int(y2)))
    pad_w = max(crop.height - crop.width, 0)
    pad_h = max(crop.width - crop.height, 0)
    padding = (pad_w // 2, pad_h // 2, pad_w - pad_w // 2, pad_h - pad_h // 2)
    sq = ImageOps.expand(crop, padding, fill=(128, 128, 128))
    return sq.resize((out_size, out_size), Image.BICUBIC)


def _pil_letterbox_full(img, out_size: int):
    """Letterbox a full image to a square canvas (gray pads, bicubic)."""
    from PIL import Image, ImageOps

    pad_w = max(img.height - img.width, 0)
    pad_h = max(img.width - img.height, 0)
    padding = (pad_w // 2, pad_h // 2, pad_w - pad_w // 2, pad_h - pad_h // 2)
    sq = ImageOps.expand(img, padding, fill=(128, 128, 128))
    return sq.resize((out_size, out_size), Image.BICUBIC)


def materialize(
    samples: list[CalibratorSample],
    img_size: int = 128,
    canvas_size: int = 448,
    skip_patches: bool = False,
) -> CalibratorArrays:
    """Pre-crop every sample once; group canvases by unique source image.

    ``skip_patches=True`` (for ``device_patches`` training) skips the host
    PIL patch crops entirely — only canvases + geometry are materialized,
    cutting both host time and the host->device upload ~10x.
    """
    from PIL import Image

    n = len(samples)
    patch_side = 1 if skip_patches else img_size
    pred_patch = np.zeros((n, patch_side, patch_side, 3), np.uint8)
    gt_patch = np.zeros((n, patch_side, patch_side, 3), np.uint8)
    delta = np.empty((n, 4), np.float32)
    pred_box = np.empty((n, 4), np.float32)
    gt_box = np.empty((n, 4), np.float32)
    canvas_idx = np.empty((n,), np.int32)

    path_to_idx: dict[Path, int] = {}
    canvases: list[np.ndarray] = []
    canvas_wh: list[tuple[float, float]] = []

    # group samples by image so each file is decoded exactly once
    by_img: dict[Path, list[int]] = {}
    for i, s in enumerate(samples):
        by_img.setdefault(s.img_path, []).append(i)

    for img_path, idxs in by_img.items():
        img = Image.open(img_path).convert("RGB")
        ci = path_to_idx.setdefault(img_path, len(canvases))
        if ci == len(canvases):
            canvases.append(np.asarray(_pil_letterbox_full(img, canvas_size), np.uint8))
            canvas_wh.append((float(img.size[0]), float(img.size[1])))
        for i in idxs:
            s = samples[i]
            if not skip_patches:
                pred_patch[i] = np.asarray(
                    _pil_letterbox_crop(img, s.pred_box, img_size)
                )
                gt_patch[i] = np.asarray(_pil_letterbox_crop(img, s.gt_box, img_size))
            delta[i] = s.delta
            pred_box[i] = s.pred_box
            gt_box[i] = s.gt_box
            canvas_idx[i] = ci

    return CalibratorArrays(
        pred_patch=pred_patch,
        gt_patch=gt_patch,
        delta=delta,
        pred_box=pred_box,
        gt_box=gt_box,
        canvas_idx=canvas_idx,
        canvases=np.stack(canvases) if canvases else np.zeros((0, canvas_size, canvas_size, 3), np.uint8),
        canvas_wh=np.asarray(canvas_wh, np.float32).reshape(-1, 2),
        img_size=img_size,
        canvas_size=canvas_size,
    )


def load_or_build(
    root: str | Path,
    iou_thr: float = 0.25,
    img_size: int = 128,
    canvas_size: int = 448,
    cache_dir: str | Path | None = None,
    skip_patches: bool = False,
) -> CalibratorArrays:
    """Build (or load a cached) materialized dataset."""
    root = Path(root)
    if cache_dir is not None:
        key = hashlib.sha1(
            json.dumps([str(root), iou_thr, img_size, canvas_size, skip_patches]).encode()
        ).hexdigest()[:16]
        cache = Path(cache_dir) / f"calib_{key}.npz"
        if cache.exists():
            z = np.load(cache)
            return CalibratorArrays(
                **{f.name: z[f.name] for f in dataclasses.fields(CalibratorArrays)
                   if f.name not in ("img_size", "canvas_size")},
                img_size=img_size,
                canvas_size=canvas_size,
            )
    arrays = materialize(build_index(root, iou_thr), img_size, canvas_size, skip_patches)
    if cache_dir is not None:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        np.savez(
            cache,
            **{f.name: getattr(arrays, f.name)
               for f in dataclasses.fields(CalibratorArrays)
               if f.name not in ("img_size", "canvas_size")},
        )
    return arrays


def train_val_split(
    n: int, val_split: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic shuffle split (reference: torch random_split of 80/20,
    cgan_train_enhanced.py:218-224; val_len = max(1, int(val_split * n)))."""
    val_len = max(1, int(val_split * n))
    perm = np.random.default_rng(seed).permutation(n)
    return perm[val_len:], perm[:val_len]
