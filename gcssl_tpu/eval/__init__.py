"""Evaluation: pseudo-vs-GT quality, delta-IoU reports, mAP, calibration."""

from gcssl_tpu.eval.pseudo_vs_gt import PRF1Report, evaluate_pseudo_labels

__all__ = ["PRF1Report", "evaluate_pseudo_labels"]
