"""Paired-patch visual QA: side-by-side (pred | gt) crops as PNGs.

Twin of /root/reference/create_paired_patches.py: for every pred/gt label
pair, many-to-one greedy IoU matching (threshold 0.25 by default, :39), crop
and letterbox both boxes at the patch size, concatenate horizontally, write
``<stem>_<k>.png``.  The reference produced 18,523 such pairs for eyeball QA.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gcssl_tpu.data.calibrator import build_index, _pil_letterbox_crop


def create_paired_patches(
    root: str | Path,
    out_dir: str | Path,
    img_size: int = 128,
    iou_thr: float = 0.25,
    limit: int | None = None,
) -> int:
    """root holds {images, labels_gt, labels_pred}; returns pairs written."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    samples = build_index(root, iou_thr)
    if limit is not None:
        samples = samples[:limit]

    count_per_image: dict[str, int] = {}
    current_path, img = None, None
    for s in samples:
        if s.img_path != current_path:
            img = Image.open(s.img_path).convert("RGB")
            current_path = s.img_path
        k = count_per_image.get(s.img_path.stem, 0)
        count_per_image[s.img_path.stem] = k + 1
        pred = _pil_letterbox_crop(img, s.pred_box, img_size)
        gt = _pil_letterbox_crop(img, s.gt_box, img_size)
        pair = np.concatenate([np.asarray(pred), np.asarray(gt)], axis=1)
        Image.fromarray(pair).save(out_dir / f"{s.img_path.stem}_{k}.png")
    return sum(count_per_image.values())
