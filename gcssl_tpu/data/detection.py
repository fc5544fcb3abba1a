"""Detection dataset: YOLO tree -> device-resident letterboxed arrays.

Loads an ``images/ + labels/`` YOLO tree (the contract of
/root/reference/yaml/person.yaml and the dataset dirs under
datasets/500_100_100), letterboxes every image to the square training size
once on the host, and packs fixed-shape arrays (uint8 images, padded box
lists) that live in HBM for the whole run — the TPU twin of Ultralytics'
mosaic-worker DataLoader.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from gcssl_tpu.data.yolo import list_images, load_yolo_txt


@dataclass
class DetectionArrays:
    images: np.ndarray    # (N, S, S, 3) uint8 — letterboxed
    boxes: np.ndarray     # (N, M, 4) f32 cxcywh in letterboxed frame
    cls: np.ndarray       # (N, M) int32
    mask: np.ndarray      # (N, M) bool
    orig_wh: np.ndarray   # (N, 2) f32 original sizes
    names: list[str]      # image stems (for writing predictions)
    img_size: int

    def __len__(self) -> int:
        return len(self.images)


def letterbox_to_square(img, out_size: int):
    """PIL letterbox (gray pads) + the affine mapping normalized-orig ->
    normalized-letterboxed."""
    from PIL import Image, ImageOps

    w, h = img.size
    side = max(w, h)
    pad_w, pad_h = side - w, side - h
    padding = (pad_w // 2, pad_h // 2, pad_w - pad_w // 2, pad_h - pad_h // 2)
    sq = ImageOps.expand(img, padding, fill=(114, 114, 114))
    out = sq.resize((out_size, out_size), Image.BILINEAR)
    return out, (w, h, side, pad_w // 2, pad_h // 2)


def map_boxes_to_letterbox(boxes: np.ndarray, w: int, h: int, side: int,
                           px: int, py: int) -> np.ndarray:
    """cxcywh normalized in original frame -> normalized in letterboxed frame."""
    if len(boxes) == 0:
        return boxes
    out = boxes.copy()
    out[:, 0] = (boxes[:, 0] * w + px) / side
    out[:, 1] = (boxes[:, 1] * h + py) / side
    out[:, 2] = boxes[:, 2] * w / side
    out[:, 3] = boxes[:, 3] * h / side
    return out


def map_boxes_from_letterbox(boxes: np.ndarray, w: float, h: float) -> np.ndarray:
    """Inverse mapping: letterboxed normalized -> original-frame normalized."""
    if len(boxes) == 0:
        return boxes
    side = max(w, h)
    px, py = (side - w) // 2, (side - h) // 2
    out = boxes.copy()
    out[:, 0] = (boxes[:, 0] * side - px) / w
    out[:, 1] = (boxes[:, 1] * side - py) / h
    out[:, 2] = boxes[:, 2] * side / w
    out[:, 3] = boxes[:, 3] * side / h
    return out


def load_detection_tree(
    root_or_images: str | Path,
    img_size: int = 640,
    max_boxes: int = 100,
    labels_dir: str | Path | None = None,
    image_list: list[Path] | None = None,
) -> DetectionArrays:
    """Load a YOLO tree.  ``root_or_images`` may be the tree root (containing
    images/ and labels/) or the images dir itself with ``labels_dir`` given.
    ``image_list`` restricts to specific files (k-fold train/infer lists)."""
    from PIL import Image

    root = Path(root_or_images)
    if (root / "images").exists():
        img_dir = root / "images"
        lbl_dir = Path(labels_dir) if labels_dir else root / "labels"
    else:
        img_dir = root
        lbl_dir = Path(labels_dir) if labels_dir else root.parent / "labels"

    paths = image_list if image_list is not None else list_images(img_dir)
    n = len(paths)
    images = np.empty((n, img_size, img_size, 3), np.uint8)
    boxes = np.zeros((n, max_boxes, 4), np.float32)
    cls = np.zeros((n, max_boxes), np.int32)
    mask = np.zeros((n, max_boxes), bool)
    orig_wh = np.empty((n, 2), np.float32)
    names = []

    # native C++ decode+letterbox for .jpg (native/loader.cc); PIL covers
    # other formats and any native decode failure
    native_done = np.zeros(n, bool)
    jpg_idx = [i for i, p in enumerate(paths) if p.suffix.lower() in (".jpg", ".jpeg")]
    if jpg_idx:
        from gcssl_tpu.data.native_loader import decode_letterbox_batch

        res = decode_letterbox_batch([paths[i] for i in jpg_idx], img_size, 114)
        if res is not None:
            imgs_n, wh_n = res
            for k, i in enumerate(jpg_idx):
                if wh_n[k, 0] > 0:
                    images[i] = imgs_n[k]
                    orig_wh[i] = wh_n[k]
                    native_done[i] = True

    for i, p in enumerate(paths):
        names.append(p.stem)
        if native_done[i]:
            w, h = orig_wh[i]
            side = max(w, h)
            geom = (int(w), int(h), int(side),
                    int((side - w) // 2), int((side - h) // 2))
        else:
            img = Image.open(p).convert("RGB")
            lb, geom = letterbox_to_square(img, img_size)
            images[i] = np.asarray(lb, np.uint8)
            orig_wh[i] = img.size
        c, b, _ = load_yolo_txt(lbl_dir / f"{p.stem}.txt", min_fields=5)
        b = map_boxes_to_letterbox(b, *geom)
        k = min(len(b), max_boxes)
        boxes[i, :k] = b[:k]
        cls[i, :k] = c[:k]
        mask[i, :k] = True

    return DetectionArrays(
        images=images, boxes=boxes, cls=cls, mask=mask,
        orig_wh=orig_wh, names=names, img_size=img_size,
    )


def load_image_pack(
    image_dir: str | Path,
    size: int,
    cache: str | Path | None = None,
    fill: int = 114,
) -> np.ndarray:
    """Label-free resident pack: every image in ``image_dir`` letterboxed to
    ``size``² uint8.  Feeds backbone self-pretraining (train/pretrain.py)
    over the unlabeled pool — the stand-in for the reference's COCO-
    pretrained init (/root/reference/train.py:11), which has no offline
    equivalent.  Decoding the 11k-image pool takes minutes, so pass
    ``cache`` (an .npz path) to persist the pack across runs."""
    from PIL import Image

    cache = Path(cache) if cache else None
    if cache is not None and cache.exists():
        return np.load(cache)["images"]

    image_dir = Path(image_dir)
    paths = list_images(image_dir)
    images = np.zeros((len(paths), size, size, 3), np.uint8)
    done = np.zeros(len(paths), bool)

    jpg_idx = [i for i, p in enumerate(paths)
               if p.suffix.lower() in (".jpg", ".jpeg")]
    if jpg_idx:
        from gcssl_tpu.data.native_loader import decode_letterbox_batch

        res = decode_letterbox_batch([paths[i] for i in jpg_idx], size, fill)
        if res is not None:
            imgs_n, wh_n = res
            for k, i in enumerate(jpg_idx):
                if wh_n[k, 0] > 0:
                    images[i] = imgs_n[k]
                    done[i] = True

    for i in np.nonzero(~done)[0]:
        img = Image.open(paths[i]).convert("RGB")
        w, h = img.size
        s = size / max(w, h)
        img = img.resize(
            (max(1, round(w * s)), max(1, round(h * s))), Image.BILINEAR
        )
        canvas = Image.new("RGB", (size, size), (fill,) * 3)
        canvas.paste(img, ((size - img.size[0]) // 2, (size - img.size[1]) // 2))
        images[i] = np.asarray(canvas)

    if cache is not None:
        cache.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache, images=images)
    return images
