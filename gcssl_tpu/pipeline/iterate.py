"""Stage 4b: merge calibrated pseudo-labels into the labeled set and retrain.

The reference's plan (plan.md:87-95) closes the loop manually: calibrated
two-stage pseudo-labels are merged with the 500 labeled images, the detector
retrains on the union, and the cycle can repeat.  This orchestrator does the
merge + retrain programmatically.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.data.detection import load_detection_tree
from gcssl_tpu.data.yolo import list_images
from gcssl_tpu.pipeline.detect import train_detector


def merge_labeled_and_pseudo(
    labeled_dir: str | Path,
    pseudo_images_dir: str | Path,
    pseudo_labels_dir: str | Path,
    out_dir: str | Path,
    strict: bool = True,
) -> int:
    """Union of {labeled_dir/{images,labels}} and calibrated pseudo pairs
    into out_dir; labeled data wins on stem collisions.  Returns total images.

    ``strict`` (default) hard-fails when a pseudo label has no matching
    image: a half-wiped pseudo tree (labels survived a workspace reset,
    images did not) would otherwise silently collapse the merge to the
    labeled set alone — round 2's m-scale loop recorded a bogus negative
    delta exactly this way."""
    labeled_dir, out_dir = Path(labeled_dir), Path(out_dir)
    pseudo_images_dir, pseudo_labels_dir = Path(pseudo_images_dir), Path(pseudo_labels_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    (out_dir / "labels").mkdir(parents=True, exist_ok=True)

    seen = set()
    for img in list_images(labeled_dir / "images", recursive=False):
        shutil.copy2(img, out_dir / "images" / img.name)
        lbl = labeled_dir / "labels" / f"{img.stem}.txt"
        if lbl.exists():
            shutil.copy2(lbl, out_dir / "labels" / lbl.name)
        seen.add(img.stem)

    missing = []
    for lbl in sorted(pseudo_labels_dir.glob("*.txt")):
        if lbl.stem in seen:
            continue
        img = None
        for ext in (".jpg", ".jpeg", ".png", ".bmp"):
            cand = pseudo_images_dir / f"{lbl.stem}{ext}"
            if cand.exists():
                img = cand
                break
        if img is None:
            missing.append(lbl.stem)
            continue
        # strip confidence column: training labels are `cls cx cy w h`
        rows = []
        for line in lbl.read_text().strip().splitlines():
            parts = line.split()
            if len(parts) >= 5:
                rows.append(" ".join(parts[:5]))
        (out_dir / "labels" / lbl.name).write_text("\n".join(rows) + "\n" if rows else "")
        shutil.copy2(img, out_dir / "images" / img.name)
        seen.add(lbl.stem)
    if missing and strict:
        raise FileNotFoundError(
            f"merge_labeled_and_pseudo: {len(missing)} pseudo label(s) in "
            f"{pseudo_labels_dir} have no image in {pseudo_images_dir} "
            f"(first: {missing[:3]}). The pseudo tree is corrupt/half-wiped; "
            "re-run the pseudo-labeling stage instead of training on a "
            "silently-shrunken merge."
        )
    return len(seen)


def retrain_on_merged(
    cfg: DetectorConfig,
    merged_dir: str | Path,
    val_dir: str | Path,
    save_dir: str | Path,
    log_fn=None,
    max_epochs: int | None = None,
    init_from: str | Path | None = None,
    resume: bool = False,
    release_path: str | Path | None = None,
):
    """Train a fresh detector on the merged set (the reference's 'retrain,
    loop' step)."""
    train_arrays = load_detection_tree(merged_dir, cfg.img_size, cfg.max_boxes)
    val_arrays = load_detection_tree(val_dir, cfg.img_size, cfg.max_boxes)
    return train_detector(
        cfg, train_arrays, val_arrays,
        save_dir=save_dir, log_fn=log_fn, max_epochs=max_epochs,
        init_from=init_from, resume=resume, release_path=release_path,
    )
