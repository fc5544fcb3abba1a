"""Stage 4: apply the trained generator to pseudo-labels (calibration).

Replaces /root/reference/cgan/inference.py.  The reference runs ONE generator
forward per box (a host loop with per-box H2D, :161-178); here all boxes of
an image — or of an entire label tree — are letterboxed on device and pushed
through G in one jitted batch.  Output rows preserve class and trailing
confidence; boxes go through ``delta_apply_inference`` (the CLI-clamp variant
the reference uses at :69-89).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.data.yolo import load_yolo_txt, save_yolo_txt
from gcssl_tpu.ops.boxes import delta_apply_inference
from gcssl_tpu.ops.patches import GRAY_FILL_NORM, crop_letterbox, normalize_patch


def _make_calibrate_fn(g_model, img_size: int, max_boxes: int):
    @jax.jit
    def run(g_params, image_u8, boxes, n_valid):
        img = normalize_patch(image_u8)
        patches = jax.vmap(
            lambda b: crop_letterbox(img, b, img_size, fill=GRAY_FILL_NORM)
        )(boxes)
        deltas = g_model.apply({"params": g_params}, patches)
        out = delta_apply_inference(boxes, deltas)
        mask = (jnp.arange(max_boxes) < n_valid)[:, None]
        return jnp.where(mask, out, boxes)

    return run


class Calibrator:
    """Holds G params + a compiled per-image-shape calibration function."""

    def __init__(self, g_model, g_params, img_size: int = 128, max_boxes: int = 64):
        self.g_model = g_model
        # pin on device once: a restored (numpy) tree passed per call would
        # re-upload G's params for every image of a calibration sweep
        self.g_params = jax.device_put(g_params)
        self.img_size = img_size
        self.max_boxes = max_boxes
        self._fn = _make_calibrate_fn(g_model, img_size, max_boxes)

    def calibrate_boxes(self, image_u8: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 + (N, 4) cxcywh -> (N, 4) calibrated."""
        n = len(boxes)
        if n == 0:
            return boxes
        if n > self.max_boxes:
            out = [
                self.calibrate_boxes(image_u8, boxes[i : i + self.max_boxes])
                for i in range(0, n, self.max_boxes)
            ]
            return np.concatenate(out, axis=0)
        padded = np.zeros((self.max_boxes, 4), np.float32)
        padded[:n] = boxes
        # pad boxes with a benign centered box so the crop math stays finite
        padded[n:] = [0.5, 0.5, 0.5, 0.5]
        out = self._fn(
            self.g_params,
            jnp.asarray(image_u8),
            jnp.asarray(padded),
            jnp.asarray(n, jnp.int32),
        )
        return np.asarray(out)[:n]


def calibrate_file(
    calibrator: Calibrator,
    image_path: str | Path,
    pred_txt: str | Path,
    out_txt: str | Path,
) -> int:
    """CLI contract of /root/reference/cgan/inference.py:94-181."""
    from PIL import Image

    img = np.asarray(Image.open(image_path).convert("RGB"), np.uint8)
    cls, boxes, conf = load_yolo_txt(pred_txt, min_fields=5)
    calibrated = calibrator.calibrate_boxes(img, boxes)
    save_yolo_txt(out_txt, cls, calibrated, conf)
    return len(cls)


def calibrate_tree(
    calibrator: Calibrator,
    images_dir: str | Path,
    labels_dir: str | Path,
    out_dir: str | Path,
    img_ext: str = ".jpg",
) -> int:
    """Calibrate every label file in a tree (batch mode the reference lacks)."""
    labels_dir, images_dir, out_dir = Path(labels_dir), Path(images_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total = 0
    for txt in sorted(labels_dir.glob("*.txt")):
        img_path = images_dir / f"{txt.stem}{img_ext}"
        if not img_path.exists():
            continue
        total += calibrate_file(calibrator, img_path, txt, out_dir / txt.name)
    return total


def load_calibrator_from_checkpoint(
    ckpt_dir: str | Path,
    cfg=None,
    which: str = "best",
    max_boxes: int = 64,
) -> Calibrator:
    """Restore G from a CheckpointManager directory (resumable checkpoints
    replace the reference's G_best.pth fallback chain, inference.py:104-147)."""
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import CalibratorConfig
    from gcssl_tpu.train import create_train_state
    from gcssl_tpu.train.wgan_gp import eval_g_params

    cfg = cfg or CalibratorConfig()
    state, g_model, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    from gcssl_tpu.core.release import is_release_file, load_release

    if is_release_file(ckpt_dir):
        g_params, _ = load_release(ckpt_dir)
        return Calibrator(g_model, g_params, cfg.data.img_size, max_boxes)
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore(which, jax.device_get(state))
    return Calibrator(
        g_model, eval_g_params(cfg, restored), cfg.data.img_size, max_boxes
    )
