"""Pure-JAX geometry and image ops: the behavioral contract of the reference.

All functions are shape-polymorphic pure functions, jit/vmap-compatible, and
unit-tested against hand-computed values plus the reference formulas
(see /root/reference/cgan/{losses,dataset}.py citations in each docstring).
"""

from gcssl_tpu.ops.boxes import (
    cxcywh_to_xyxy,
    xyxy_to_cxcywh,
    box_area,
    iou_elementwise,
    iou_pairwise,
    eiou,
    eiou_loss,
    smooth_clamp,
    delta_encode,
    delta_apply,
    delta_apply_inference,
)
from gcssl_tpu.ops.matching import (
    match_greedy_many_to_one,
    match_greedy_one_to_one,
)
from gcssl_tpu.ops.nms import nms, nms_fused
from gcssl_tpu.ops.patches import (
    crop_letterbox,
    crop_letterbox_batch,
    letterbox_image,
    normalize_patch,
)

__all__ = [
    "cxcywh_to_xyxy",
    "xyxy_to_cxcywh",
    "box_area",
    "iou_elementwise",
    "iou_pairwise",
    "eiou",
    "eiou_loss",
    "smooth_clamp",
    "delta_encode",
    "delta_apply",
    "delta_apply_inference",
    "match_greedy_many_to_one",
    "match_greedy_one_to_one",
    "nms",
    "nms_fused",
    "crop_letterbox",
    "crop_letterbox_batch",
    "letterbox_image",
    "normalize_patch",
]
