"""Stage 0: deterministic dataset split (labeled / val / test / unlabeled).

Twin of /root/reference/split_dataset.py: seeded random shuffle of
``images/*`` in a source tree, split into the configured counts with the
remainder becoming the unlabeled pool; image+label pairs copied (or moved)
into ``part{i}/{images,labels}``.
"""

from __future__ import annotations

import random
import shutil
from pathlib import Path


def split_dataset(
    src_dir: str | Path,
    dst_dir: str | Path,
    counts: list[int],
    seed: int | None = 42,
    move: bool = False,
    part_names: list[str] | None = None,
) -> list[int]:
    """Split ``src_dir/{images,labels}`` into parts; returns per-part sizes.

    ``part_names`` (optional) names the output dirs (e.g. ["train", "val",
    "test", "unlabels"]) instead of the reference's part1..partN.
    """
    src = Path(src_dir)
    imgs = sorted((src / "images").glob("*.*"))
    if not imgs:
        raise FileNotFoundError(f"no images under {src / 'images'}")
    if seed is not None:
        random.seed(seed)
    imgs = list(imgs)
    random.shuffle(imgs)

    splits: list[list[Path]] = []
    idx = 0
    for c in counts:
        splits.append(imgs[idx : idx + c])
        idx += c
    splits.append(imgs[idx:])  # remainder -> unlabeled pool

    sizes = []
    for i, part in enumerate(splits):
        name = (
            part_names[i]
            if part_names is not None and i < len(part_names)
            else f"part{i + 1}"
        )
        part_dir = Path(dst_dir) / name
        for img in part:
            lbl = src / "labels" / (img.stem + ".txt")
            dst_img = part_dir / "images" / img.name
            dst_lbl = part_dir / "labels" / lbl.name
            dst_img.parent.mkdir(parents=True, exist_ok=True)
            dst_lbl.parent.mkdir(parents=True, exist_ok=True)
            op = shutil.move if move else shutil.copy2
            op(str(img), dst_img)
            if lbl.exists():
                op(str(lbl), dst_lbl)
        sizes.append(len(part))
    return sizes
