"""Host-side data: YOLO-txt IO, calibrator pair index, device-resident batches."""

from gcssl_tpu.data.yolo import load_yolo_txt, save_yolo_txt, list_images
from gcssl_tpu.data.calibrator import (
    CalibratorSample,
    CalibratorArrays,
    build_index,
    materialize,
    load_or_build,
    train_val_split,
)

__all__ = [
    "load_yolo_txt",
    "save_yolo_txt",
    "list_images",
    "CalibratorSample",
    "CalibratorArrays",
    "build_index",
    "materialize",
    "load_or_build",
    "train_val_split",
]
