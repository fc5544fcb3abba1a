"""YOLO-format txt IO — the filesystem contract every stage shares.

Row format: ``cls cx cy w h [conf]`` with normalized coordinates
(/root/reference/split_dataset.py:24-38, /root/reference/cgan/dataset.py:20-25,
/root/reference/cgan/inference.py:29-49).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}


def load_yolo_txt(
    path: str | Path, min_fields: int = 5
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load a YOLO txt file.

    Args:
        path: label file; missing or empty file -> empty arrays.
        min_fields: rows with fewer whitespace fields are skipped.  The
            reference uses 5 for GT and 6 for predictions (conf required,
            /root/reference/cgan/dataset.py:155-179).

    Returns:
        (cls (N,) int32, boxes (N, 4) float32 cxcywh, conf (N,) float32 —
        NaN where the row had no confidence column).
    """
    path = Path(path)
    cls_list, box_list, conf_list = [], [], []
    if path.exists() and path.stat().st_size > 0:
        for line in path.read_text().strip().splitlines():
            parts = line.strip().split()
            if len(parts) < min_fields:
                continue
            cls_list.append(int(float(parts[0])))
            box_list.append([float(v) for v in parts[1:5]])
            conf_list.append(float(parts[5]) if len(parts) >= 6 else np.nan)
    return (
        np.asarray(cls_list, np.int32),
        np.asarray(box_list, np.float32).reshape(-1, 4),
        np.asarray(conf_list, np.float32),
    )


def save_yolo_txt(
    path: str | Path,
    cls: np.ndarray,
    boxes: np.ndarray,
    conf: np.ndarray | None = None,
    precision: int = 6,
) -> None:
    """Write YOLO rows; confidences appended when given (and finite).

    Matches the writers at /root/reference/Two-stage pseudo-labeling.py:27-31
    and /root/reference/cgan/inference.py:43-49.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(len(cls)):
        row = f"{int(cls[i])} " + " ".join(
            f"{v:.{precision}f}" for v in np.asarray(boxes[i]).tolist()
        )
        if conf is not None and np.isfinite(conf[i]):
            row += f" {float(conf[i]):.{precision}f}"
        lines.append(row)
    path.write_text("\n".join(lines) + ("\n" if lines else ""))


def list_images(directory: str | Path, recursive: bool = True) -> list[Path]:
    """All image files under a directory, sorted (matches the reference's
    rglob + suffix filter, /root/reference/Two-stage pseudo-labeling.py:46)."""
    directory = Path(directory)
    it = directory.rglob("*") if recursive else directory.glob("*")
    return sorted(p for p in it if p.suffix.lower() in IMG_EXTS)
