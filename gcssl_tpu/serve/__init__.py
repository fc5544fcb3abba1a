"""Serving: ahead-of-time model export to self-contained StableHLO artifacts."""

from gcssl_tpu.serve.export import (
    ServedModel,
    as_predict_fn,
    export_calibrator,
    export_detector_predict,
    export_fn,
    load_model,
    read_artifact,
    save_artifact,
    smoke_check,
)

__all__ = [
    "ServedModel",
    "as_predict_fn",
    "export_calibrator",
    "export_detector_predict",
    "export_fn",
    "load_model",
    "read_artifact",
    "save_artifact",
    "smoke_check",
]
