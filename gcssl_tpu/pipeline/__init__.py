"""Stage orchestrators for the four-stage semi-supervised loop."""

from gcssl_tpu.pipeline.calibrate import calibrate_file, calibrate_tree
from gcssl_tpu.pipeline.split import split_dataset
from gcssl_tpu.pipeline.detect import (
    train_detector,
    predict_to_tree,
    evaluate_on,
)
from gcssl_tpu.pipeline.two_stage import two_stage_pseudo_label
from gcssl_tpu.pipeline.kfold import kfold_pseudo_label, kfold_split

__all__ = [
    "calibrate_file",
    "calibrate_tree",
    "split_dataset",
    "train_detector",
    "predict_to_tree",
    "evaluate_on",
    "two_stage_pseudo_label",
    "kfold_pseudo_label",
    "kfold_split",
]
