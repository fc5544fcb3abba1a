"""Sample-grid dumps: pred | refined | gt patch triplets as PNG.

Twin of the reference's every-10-epochs grids
(/root/reference/cgan/cgan_train_enhanced.py:377-392: vertical concat of the
three patch rows, 4 per row, normalized).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_u8(x: np.ndarray) -> np.ndarray:
    """(-1, 1) float patch -> uint8."""
    return np.clip((np.asarray(x, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_sample_grid(
    path: str | Path,
    pred_patches: np.ndarray,
    refined_patches: np.ndarray,
    gt_patches: np.ndarray,
    n: int = 4,
) -> Path:
    """Write an n-column grid with rows = (pred, refined, gt)."""
    from PIL import Image

    n = min(n, len(pred_patches))
    rows = []
    for batch in (pred_patches, refined_patches, gt_patches):
        rows.append(np.concatenate([_to_u8(batch[i]) for i in range(n)], axis=1))
    grid = np.concatenate(rows, axis=0)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(path)
    return path
