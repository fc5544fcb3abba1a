"""Pallas TPU kernels for hot fused ops."""

from gcssl_tpu.kernels.crop import fast_crop_available, fused_canvas_crop
from gcssl_tpu.kernels.instance_norm import (
    fused_instance_norm_act,
    pallas_available,
)

__all__ = [
    "fast_crop_available",
    "fused_canvas_crop",
    "fused_instance_norm_act",
    "pallas_available",
]
